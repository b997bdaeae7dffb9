"""Trainer tests: each of the five trainers runs end-to-end on tiny data,
writes a servable artifact, and the serving engine loads it. Also covers
the data-parallel mesh path (8 virtual CPU devices from conftest) and
checkpoint/resume — none of which the reference tests (SURVEY.md §4:
'No tests at all for ... training scripts')."""

import os

import numpy as np
import pytest

from mec_tpu.config import Config
from mec_tpu.training import common, data, metrics


@pytest.fixture()
def models_dir(tmp_path):
    return str(tmp_path / 'models')


def _speech_data(n=70):
    rng = np.random.RandomState(0)
    X = rng.randn(n, 56).astype(np.float32)
    y = (np.arange(n) % 7).astype(np.int32)
    # separable signal so training accuracy moves
    X[np.arange(n), y] += 3.0
    return X, y


def test_metrics_report_and_split():
    y_true = np.array([0, 0, 1, 1, 2])
    y_pred = np.array([0, 1, 1, 1, 2])
    rep = metrics.classification_report(y_true, y_pred,
                                        ['a', 'b', 'c', 'd', 'e', 'f', 'g'])
    assert 'macro avg' in rep
    m = metrics.precision_recall_f1(y_true, y_pred, 7)
    assert m['recall'][1] == 1.0 and m['support'][0] == 2
    labels = np.array([0] * 20 + [1] * 20)
    tr, te = metrics.train_test_split_stratified(40, labels, 0.25, seed=1)
    assert len(te) == 10 and len(tr) == 30
    assert (labels[te] == 0).sum() == 5  # stratified


def test_speech_trainer_end_to_end(models_dir):
    from mec_tpu.training import train_speech
    X, y = _speech_data()
    best, (mean, scale), hist = train_speech.train(
        X=X, y=y, epochs=3, batch_size=16, models_dir=models_dir,
        verbose=False)
    assert os.path.exists(os.path.join(models_dir, 'speech_model.mecp'))
    assert os.path.exists(os.path.join(models_dir, 'speech_scaler.npz'))
    assert len(hist['val_acc']) == 3


def test_fit_scan_matches_loop(models_dir, monkeypatch, tmp_path):
    """The one-dispatch scanned epoch must reproduce the per-step loop
    exactly: same batch order, same dropout key stream, same weights."""
    import jax
    from mec_tpu.training import train_speech
    X, y = _speech_data()
    outs = []
    for i, scan_mb in enumerate(('256', '0')):  # scan path vs loop path
        monkeypatch.setenv('MEC_TRAIN_SCAN_MB', scan_mb)
        best, scaler, hist = train_speech.train(
            X=X, y=y, epochs=2, batch_size=16,
            models_dir=str(tmp_path / f'm{i}'), verbose=False)
        outs.append((best, hist))
    (best_a, hist_a), (best_b, hist_b) = outs
    np.testing.assert_allclose(hist_a['loss'], hist_b['loss'], atol=1e-5)
    np.testing.assert_allclose(hist_a['val_acc'], hist_b['val_acc'])
    for a, b in zip(jax.tree_util.tree_leaves(best_a),
                    jax.tree_util.tree_leaves(best_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_speech_trainer_data_parallel(models_dir):
    from mec_tpu.training import train_speech
    X, y = _speech_data()
    _, _, hist = train_speech.train(X=X, y=y, epochs=2, batch_size=16,
                                    models_dir=models_dir, mesh_data=8,
                                    verbose=False)
    assert len(hist['loss']) == 2


def test_fusion_trainer_end_to_end(models_dir):
    from mec_tpu.convert import store
    from mec_tpu.training import train_fusion
    best, cfg, hist = train_fusion.train(
        num_samples=140, epochs=2, batch_size=32, models_dir=models_dir,
        verbose=False)
    loaded = store.load_params(os.path.join(models_dir,
                                            'fusion_model.mecp'))
    assert loaded['meta']['config']['text_dim'] == 768


def test_lstm_trainer_end_to_end(models_dir):
    from mec_tpu.training import train_text_lstm
    texts = np.array(['i am happy', 'so sad now', 'angry words',
                      'full of fear', 'what disgust', 'big surprise',
                      'just neutral'] * 10, dtype=object)
    labels = np.array(list(range(7)) * 10, dtype=np.int32)
    best, tok, hist = train_text_lstm.train(
        csv_path=None, texts=texts, labels=labels, epochs=2,
        batch_size=16, max_length=16, models_dir=models_dir, verbose=False)
    assert os.path.exists(os.path.join(models_dir, 'text_model.mecp'))
    assert os.path.exists(os.path.join(models_dir,
                                       'text_model_tokenizer.json'))


def test_bert_trainer_tiny_with_tp(models_dir):
    from mec_tpu.text.wordpiece import WordPieceTokenizer
    from mec_tpu.training import train_text_bert
    texts = np.array(['happy day', 'sad news', 'angry you', 'fear me',
                      'disgust it', 'surprise wow', 'neutral meh'] * 8,
                     dtype=object)
    labels = np.array(list(range(7)) * 8, dtype=np.int32)
    vocab = {'[PAD]': 0, '[UNK]': 1, '[CLS]': 2, '[SEP]': 3}
    for w in set(' '.join(map(str, texts)).split()):
        vocab.setdefault(w, len(vocab))
    tok = WordPieceTokenizer(vocab)
    bert_dir = os.path.join(models_dir, 'bert_model')
    best, hist = train_text_bert.train(
        csv_path=None, texts=texts, labels=labels, epochs=1, batch_size=8,
        max_length=16, models_dir=bert_dir, tokenizer=tok,
        mesh_data=4, mesh_model=2,
        model_kwargs=dict(vocab_size=len(vocab), hidden_size=32,
                          num_layers=2, num_heads=2, intermediate_size=64,
                          max_position=32),
        verbose=False)
    assert os.path.exists(os.path.join(bert_dir, 'bert_model.mecp'))
    assert os.path.exists(os.path.join(bert_dir, 'config.json'))
    assert os.path.exists(os.path.join(bert_dir, 'vocab.txt'))


def test_bert_trainer_seq_bucket_exact(models_dir):
    """Training with the corpus sliced to its covering seq bucket must
    produce the SAME weights as reference-style full-length padding
    (the dropped columns are all-padding, attention-masked to 0)."""
    import jax
    from mec_tpu.text.wordpiece import WordPieceTokenizer
    from mec_tpu.training import train_text_bert
    texts = np.array(['happy day', 'sad news', 'angry you', 'fear me',
                      'disgust it', 'surprise wow', 'neutral meh'] * 4,
                     dtype=object)
    labels = np.array(list(range(7)) * 4, dtype=np.int32)
    vocab = {'[PAD]': 0, '[UNK]': 1, '[CLS]': 2, '[SEP]': 3}
    for w in set(' '.join(map(str, texts)).split()):
        vocab.setdefault(w, len(vocab))
    tok = WordPieceTokenizer(vocab)
    # dropout off: its mask shapes depend on the padded length, which
    # would make the comparison stochastic rather than exact
    kwargs = dict(vocab_size=len(vocab), hidden_size=32, num_layers=1,
                  num_heads=2, intermediate_size=64, max_position=64,
                  dropout_rate=0.0)
    outs = []
    for bucket in (True, False):
        best, _h = train_text_bert.train(
            csv_path=None, texts=texts, labels=labels, epochs=1,
            batch_size=8, max_length=48,
            models_dir=os.path.join(models_dir, f'bseq{bucket}'),
            tokenizer=tok, model_kwargs=kwargs, verbose=False,
            seq_bucket=bucket)
        outs.append(best)
    flat_a = jax.tree_util.tree_leaves(outs[0])
    flat_b = jax.tree_util.tree_leaves(outs[1])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_image_trainer_two_phase(models_dir):
    from mec_tpu.training import train_image
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (28, 64, 64, 3), np.uint8)
    labels = (np.arange(28) % 7).astype(np.int32)
    best, hist = train_image.train(
        data_root=None, img_size=64, batch_size=8, epochs=2,
        phase1_epochs=1, imgs=imgs, labels=labels, models_dir=models_dir,
        verbose=False)
    assert os.path.exists(os.path.join(models_dir, 'image_model.mecp'))
    assert len(hist['phase1']['val_acc']) == 1
    assert len(hist['phase2']['val_acc']) == 1


def test_trained_artifact_serves(models_dir):
    """Train speech -> EmotionEngine loads the .mecp and predicts."""
    from mec_tpu.serving.engine import EmotionEngine
    from mec_tpu.training import train_speech
    X, y = _speech_data()
    train_speech.train(X=X, y=y, epochs=1, batch_size=16,
                       models_dir=models_dir, verbose=False)
    engine = EmotionEngine(models_dir=models_dir)
    assert engine.speech is not None
    waves = np.random.RandomState(1).randn(2, 66150).astype(np.float32) * 0.1
    out = engine.predict_speech_waves(waves)
    assert len(out) == 2
    assert all(abs(sum(r['all_probabilities']) - 1.0) < 1e-5 for r in out)


def test_checkpoint_resume(tmp_path):
    import jax
    import jax.numpy as jnp
    from mec_tpu.models.speech_dnn import SpeechDNN
    from mec_tpu.training import checkpoint
    model = SpeechDNN(widths=(16, 8), dropout_rates=(0.0, 0.0))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 56), jnp.float32))
    tx = common.adam_with_clip(1e-3)
    state = common.TrainState.create(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, tx)
    state = state.replace(step=state.step + 5)
    path = str(tmp_path / 'ckpt.mect')
    checkpoint.save_train_state(path, state, extra={'epoch': 3})
    restored, extra = checkpoint.restore_train_state(path, state)
    assert int(restored.step) == 5
    assert extra['epoch'] == 3
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 state.params, restored.params)


def test_text_dataset_loader(tmp_path):
    p = tmp_path / 'data.txt'
    p.write_text('i feel great;joy\nso down;sadness\nmad about it;anger\n'
                 'bad label;confused\n')
    texts, labels = data.load_text_dataset(str(p), verbose=False)
    assert len(texts) == 3
    assert [Config.EMOTIONS[i] for i in labels] == ['happy', 'sad', 'angry']


def test_speech_dataset_loader(tmp_path):
    from mec_tpu.ops import wav
    rng = np.random.RandomState(0)
    for cls in ('happy', 'sad'):
        d = tmp_path / 'speech' / cls
        d.mkdir(parents=True)
        for i in range(2):
            wav.write_wav(str(d / f'{i}.wav'),
                          rng.randn(66150).astype(np.float32) * 0.1, 22050)
    X, y = data.load_speech_dataset(str(tmp_path / 'speech'),
                                    verbose=False)
    assert X.shape == (4, 56)
    assert sorted(np.unique(y).tolist()) == [
        Config.EMOTIONS.index('happy'), Config.EMOTIONS.index('sad')]


def test_fusion_real_feature_extraction(tmp_path):
    """--manifest path: engine extracts real per-modality features once
    per encoder and the fusion trainer consumes them."""
    import csv

    from PIL import Image
    from mec_tpu.ops import wav
    from mec_tpu.serving.synthetic_artifacts import write_synthetic_artifacts
    from mec_tpu.training import train_fusion

    models_dir = str(tmp_path / 'models')
    write_synthetic_artifacts(models_dir, tiny=True)

    rng = np.random.RandomState(0)
    rows = []
    for i in range(8):
        wav_p = str(tmp_path / f'a{i}.wav')
        img_p = str(tmp_path / f'i{i}.jpg')
        wav.write_wav(wav_p, rng.randn(66150).astype(np.float32) * 0.1,
                      22050)
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)
                        ).save(img_p)
        rows.append({'audio_path': wav_p, 'text': f'sample text {i} happy',
                     'image_path': img_p,
                     'label': Config.EMOTIONS[i % 7]})
    manifest = tmp_path / 'manifest.csv'
    with open(manifest, 'w', newline='') as f:
        w = csv.DictWriter(f, fieldnames=['audio_path', 'text',
                                          'image_path', 'label'])
        w.writeheader()
        w.writerows(rows)

    ds = train_fusion.extract_real_features(str(manifest),
                                            models_dir=models_dir,
                                            verbose=False)
    s_f, t_f, i_f, s_p, t_p, i_p, labels = ds
    assert s_f.shape == (8, 64) and i_f.shape == (8, 512)
    assert t_f.shape[0] == 8 and s_p.shape == (8, 7)
    assert np.allclose(s_p.sum(axis=1), 1.0, atol=1e-5)
    best, cfg, hist = train_fusion.train(
        epochs=1, batch_size=8, models_dir=models_dir, dataset=ds,
        verbose=False)
    assert cfg['text_dim'] == t_f.shape[1]


def test_fit_checkpoint_resume_midrun(tmp_path):
    """Interrupt after 2 epochs; resuming continues at epoch 3 with
    history and optimizer state intact."""
    from mec_tpu.training import train_speech
    X, y = _speech_data()
    ckpt = str(tmp_path / 'speech.ckpt')
    m1 = str(tmp_path / 'm1')
    _, _, hist1 = train_speech.train(X=X, y=y, epochs=2, batch_size=16,
                                     models_dir=m1, verbose=False,
                                     checkpoint_path=ckpt)
    assert os.path.exists(ckpt)
    m2 = str(tmp_path / 'm2')
    _, _, hist2 = train_speech.train(X=X, y=y, epochs=4, batch_size=16,
                                     models_dir=m2, verbose=False,
                                     checkpoint_path=ckpt, resume=True)
    assert len(hist2['val_acc']) == 4          # 2 restored + 2 new
    assert hist2['val_acc'][:2] == hist1['val_acc']


def test_resume_with_no_new_best_keeps_checkpoint_best_vars(tmp_path):
    """Regression: a resumed run whose later epochs never beat the
    restored best_metric must return the checkpoint's best weights, not
    the fresh random-init variables captured before the restore."""
    import jax
    from mec_tpu.serving.engine import EmotionEngine
    from mec_tpu.training import train_speech
    X, y = _speech_data()
    ckpt = str(tmp_path / 's.ckpt')
    m1 = str(tmp_path / 'm1')
    best1, _, hist1 = train_speech.train(
        X=X, y=y, epochs=3, batch_size=16, models_dir=m1, verbose=False,
        checkpoint_path=ckpt)
    # resume with the SAME epoch count: the loop body never runs, so any
    # 'best' must come from the checkpoint
    m2 = str(tmp_path / 'm2')
    best2, _, _ = train_speech.train(
        X=X, y=y, epochs=3, batch_size=16, models_dir=m2, verbose=False,
        checkpoint_path=ckpt, resume=True)
    for a, b in zip(jax.tree.leaves(best1['params']),
                    jax.tree.leaves(best2['params'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # and the artifact it saved must actually serve
    engine = EmotionEngine(models_dir=m2)
    assert engine.speech is not None


def test_image_trainer_bf16(models_dir):
    """--bf16 (bfloat16 compute, float32 params) trains and serves; the
    saved artifact must still hold float32 params."""
    import jax
    import jax.numpy as jnp
    from mec_tpu.training import train_image
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (14, 64, 64, 3), np.uint8)
    labels = (np.arange(14) % 7).astype(np.int32)
    d = os.path.join(models_dir, 'bf16')
    best, hist = train_image.train(
        data_root=None, img_size=64, batch_size=8, epochs=2,
        phase1_epochs=1, imgs=imgs, labels=labels, models_dir=d,
        verbose=False, bf16=True)
    assert os.path.exists(os.path.join(d, 'image_model.mecp'))
    leaves = jax.tree.leaves(best['params'])
    assert all(x.dtype == jnp.float32 for x in leaves)
    assert np.isfinite(hist['phase2']['val_acc'][-1])


def test_grad_accum_matches_full_batch():
    """optax.MultiSteps(k=2) over two half-batches == one full-batch
    AdamW step (grads are mean-reduced, so the averaged accumulation is
    exact), and the LR helpers see through the wrapper."""
    import jax
    import jax.numpy as jnp
    import optax

    from mec_tpu.models.bert import BertForSequenceClassification
    from mec_tpu.training.train_text_bert import make_steps

    model = BertForSequenceClassification(
        vocab_size=32, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position=32, dropout_rate=0.0)
    dummy = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    train_step, _ = make_steps(model)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 32, (8, 8)).astype(np.int32)
    mask = np.ones((8, 8), np.int32)
    labels = rng.randint(0, 7, (8,)).astype(np.int32)
    full = {'ids': ids, 'mask': mask, 'label': labels}
    halves = [{k: v[:4] for k, v in full.items()},
              {k: v[4:] for k, v in full.items()}]

    # SGD makes the comparison exact (the update is linear in the
    # gradient; Adam's g/sqrt(v) would amplify fp summation-order noise
    # on near-zero gradient entries into ~1e-4 param deltas)
    state_full = common.TrainState.create(variables, optax.sgd(0.1))
    state_full, _ = train_step(state_full, full, jax.random.PRNGKey(1))

    tx_acc = optax.MultiSteps(optax.sgd(0.1), every_k_schedule=2)
    state_acc = common.TrainState.create(variables, tx_acc)
    for h in halves:
        state_acc, _ = train_step(state_acc, h, jax.random.PRNGKey(1))

    for a, b in zip(jax.tree_util.tree_leaves(state_full.params),
                    jax.tree_util.tree_leaves(state_acc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)

    # get_lr/set_lr descend through the MultiSteps wrapper (the real
    # trainer wraps adamw_with_clip)
    state_lr = common.TrainState.create(
        variables, optax.MultiSteps(
            common.adamw_with_clip(1e-3, weight_decay=0.01, clipnorm=1.0),
            every_k_schedule=2))
    assert abs(common.get_lr(state_lr) - 1e-3) < 1e-9
    state_lr = common.set_lr(state_lr, 5e-4)
    assert abs(common.get_lr(state_lr) - 5e-4) < 1e-9


def test_bert_remat_exact():
    """remat=True (jax.checkpoint per encoder layer) preserves the
    param structure (layer_{i} names — converters/TP rules key on them)
    and produces bit-identical loss and gradients; only the backward's
    memory/recompute schedule changes."""
    import jax
    import jax.numpy as jnp

    from mec_tpu.models.bert import BertForSequenceClassification

    kw = dict(vocab_size=32, hidden_size=16, num_layers=2, num_heads=2,
              intermediate_size=32, max_position=32, dropout_rate=0.0)
    base = BertForSequenceClassification(**kw)
    rem = BertForSequenceClassification(remat=True, **kw)
    dummy = jnp.zeros((1, 8), jnp.int32)
    variables = base.init(jax.random.PRNGKey(0), dummy, dummy)
    assert (jax.tree_util.tree_structure(
                rem.init(jax.random.PRNGKey(0), dummy, dummy))
            == jax.tree_util.tree_structure(variables))

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 32, (4, 8)), jnp.int32)
    mask = jnp.ones((4, 8), jnp.int32)
    labels = jnp.asarray(rng.randint(0, 7, (4,)), jnp.int32)

    def loss_fn(model):
        def f(params):
            logits, _ = model.apply({'params': params}, ids, mask)
            onehot = jax.nn.one_hot(labels, logits.shape[-1])
            return common.softmax_cross_entropy(logits, onehot)
        return f

    l0, g0 = jax.value_and_grad(loss_fn(base))(variables['params'])
    l1, g1 = jax.value_and_grad(loss_fn(rem))(variables['params'])
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_optimizer_total_steps():
    """LR-schedule horizon = actual optimizer updates: micro-steps are
    ceil-counted (the ragged tail trains every epoch) and the
    accumulation division spans the whole run (MultiSteps windows cross
    epoch boundaries). Review finding: per-epoch floor division left
    the schedule at 0 while real updates still arrived."""
    # len(tr)=104, b=16, accum=2, epochs=5: 7 micro-steps/epoch (6 full
    # + tail) = 35 micro -> 17 updates (the old code said 15)
    assert common.optimizer_total_steps(104, 16, 5, 2) == 17
    # no accumulation: ceil counts the tail (old floor said 6/epoch)
    assert common.optimizer_total_steps(104, 16, 1) == 7
    # accumulation window spanning epochs: 48 rows, b=16, accum=4 ->
    # 3 micro/epoch, 5 epochs = 15 micro -> 3 updates
    assert common.optimizer_total_steps(48, 16, 5, 4) == 3
    # degenerate inputs clamp to 1
    assert common.optimizer_total_steps(1, 16, 1, 8) == 1


def test_image_remat_exact():
    """remat=True on both image archs: same param/batch_stats tree,
    bit-identical loss and gradients (only the backward's schedule
    changes), eval forward untouched."""
    import jax
    import jax.numpy as jnp

    from mec_tpu.models.mobilenet import MobileNetV2EmotionModel
    from mec_tpu.models.resnet import ImageEmotionModel

    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    for base, rem in [
            (ImageEmotionModel(stage_sizes=(1, 1)),
             ImageEmotionModel(stage_sizes=(1, 1), remat=True)),
            (MobileNetV2EmotionModel(),
             MobileNetV2EmotionModel(remat=True))]:
        v = base.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(
                    rem.init(jax.random.PRNGKey(0), x))
                == jax.tree_util.tree_structure(v))

        def loss_fn(model):
            def f(p):
                (logits, _), _mut = model.apply(
                    {'params': p, 'batch_stats': v['batch_stats']},
                    x, train=True, mutable=['batch_stats'],
                    rngs={'dropout': jax.random.PRNGKey(1)})
                return logits.sum()
            return f

        l0, g0 = jax.value_and_grad(loss_fn(base))(v['params'])
        l1, g1 = jax.value_and_grad(loss_fn(rem))(v['params'])
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        e0, _ = base.apply(v, x)
        e1, _ = rem.apply(v, x)
        np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_bert_trainer_remat(models_dir):
    """--remat plumbs through the trainer end-to-end."""
    from mec_tpu.text.wordpiece import WordPieceTokenizer
    from mec_tpu.training import train_text_bert
    texts = np.array(['happy day', 'sad news'] * 8, dtype=object)
    labels = np.array([0, 1] * 8, dtype=np.int32)
    vocab = {'[PAD]': 0, '[UNK]': 1, '[CLS]': 2, '[SEP]': 3}
    for w in set(' '.join(map(str, texts)).split()):
        vocab.setdefault(w, len(vocab))
    bert_dir = os.path.join(models_dir, 'bert_remat')
    train_text_bert.train(
        csv_path=None, texts=texts, labels=labels, epochs=1, batch_size=4,
        max_length=16, models_dir=bert_dir,
        tokenizer=WordPieceTokenizer(vocab), remat=True,
        model_kwargs=dict(vocab_size=len(vocab), hidden_size=16,
                          num_layers=1, num_heads=2, intermediate_size=32,
                          max_position=32),
        verbose=False)
    assert os.path.exists(os.path.join(bert_dir, 'bert_model.mecp'))


def test_image_trainer_grad_accum(models_dir):
    """--grad-accum plumbs through both image-trainer phases (MultiSteps
    around the multi_transform freeze chain in phase 1 and the cosine
    schedule in phase 2)."""
    from mec_tpu.training import train_image
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, (28, 64, 64, 3), np.uint8)
    labels = (np.arange(28) % 7).astype(np.int32)
    d = os.path.join(models_dir, 'img_ga')
    best, hist = train_image.train(
        data_root=None, img_size=64, batch_size=8, epochs=2,
        phase1_epochs=1, imgs=imgs, labels=labels, models_dir=d,
        verbose=False, grad_accum=2)
    assert os.path.exists(os.path.join(d, 'image_model.mecp'))
    assert np.isfinite(hist['phase2']['val_acc'][-1])


def test_bert_trainer_grad_accum(models_dir):
    """--grad-accum plumbs through the trainer end-to-end."""
    from mec_tpu.text.wordpiece import WordPieceTokenizer
    from mec_tpu.training import train_text_bert
    texts = np.array(['happy day', 'sad news'] * 8, dtype=object)
    labels = np.array([0, 1] * 8, dtype=np.int32)
    vocab = {'[PAD]': 0, '[UNK]': 1, '[CLS]': 2, '[SEP]': 3}
    for w in set(' '.join(map(str, texts)).split()):
        vocab.setdefault(w, len(vocab))
    bert_dir = os.path.join(models_dir, 'bert_ga')
    train_text_bert.train(
        csv_path=None, texts=texts, labels=labels, epochs=1, batch_size=4,
        max_length=16, models_dir=bert_dir,
        tokenizer=WordPieceTokenizer(vocab), grad_accum=2,
        model_kwargs=dict(vocab_size=len(vocab), hidden_size=16,
                          num_layers=1, num_heads=2, intermediate_size=32,
                          max_position=32),
        verbose=False)
    assert os.path.exists(os.path.join(bert_dir, 'bert_model.mecp'))
