"""Multimodal fusion trainer.

Parity with reference model_training/train_fusion_model.py: synthetic
data generator — class-shifted Gaussian features (64/768/512-dim at
label*0.3/0.2/0.25) + Dirichlet(0.5) predictions peaked at the true label
(:457-519) — AdamW 1e-3 wd 0.01, CosineAnnealingWarmRestarts(T_0=10,
T_mult=2), grad clip 1.0, early stop patience 15, checkpoint embeds the
dims config (:580-624), and per-epoch mean attention/decision-weight
logging (:602-603).

When all three encoder artifacts exist, --manifest trains on REAL
multimodal triples: features come from the serving engine's single-pass
extractors (the reference acknowledges its synthetic-only training at
:460-463, and its extractors re-run every encoder twice).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mec_tpu.config import Config
from mec_tpu.convert import store
from mec_tpu.models.fusion import MultiModalFusionModel
from mec_tpu.parallel.mesh import make_mesh
from mec_tpu.training import common, metrics


def generate_synthetic_data(num_samples: int = 10000, seed: int = 42,
                            dims: Optional[dict] = None
                            ) -> Tuple[np.ndarray, ...]:
    """Class-correlated Gaussians + Dirichlet-noised peaked predictions,
    vectorized (the reference builds sample-by-sample in Python).

    `dims` overrides the per-modality feature widths (default: the
    reference's fixed encoders — speech penultimate 64, BERT CLS 768,
    image head 512, reference train_fusion_model.py:457-519). Pass the
    actual encoder widths when the served models are non-default, e.g. a
    small from-scratch BERT — the serving engine only runs attention
    fusion when the fusion config matches what the encoders emit."""
    rng = np.random.RandomState(seed)
    C = Config.NUM_EMOTIONS
    dims = dict(dims or {'speech': 64, 'text': 768, 'image': 512})
    shifts = {'speech': 0.3, 'text': 0.2, 'image': 0.25}
    peaks = {'speech': (0.3, 0.6), 'text': (0.4, 0.7), 'image': (0.2, 0.5)}

    labels = np.arange(num_samples) % C
    feats = {}
    preds = {}
    for mod in dims:
        feats[mod] = (rng.randn(num_samples, dims[mod])
                      + labels[:, None] * shifts[mod]).astype(np.float32)
        p = rng.dirichlet(np.ones(C) * 0.5, size=num_samples)
        lo, hi = peaks[mod]
        p[np.arange(num_samples), labels] += rng.uniform(lo, hi,
                                                         num_samples)
        preds[mod] = (p / p.sum(axis=1, keepdims=True)).astype(np.float32)
    return (feats['speech'], feats['text'], feats['image'],
            preds['speech'], preds['text'], preds['image'],
            labels.astype(np.int32))


def extract_real_features(manifest_csv: str,
                          models_dir: Optional[str] = None,
                          chunk: int = 32, verbose: bool = True):
    """Manifest CSV (audio_path,text,image_path,label) -> fusion dataset.

    One engine pass per modality chunk; each returns probabilities AND
    the fusion feature vector together (penultimate/CLS/head features),
    so real-data fusion training costs one forward per encoder instead of
    the reference's two (reference train_fusion_model.py:49-189).
    """
    import csv as _csv

    from mec_tpu.serving.engine import EmotionEngine

    label_to_idx = {e: i for i, e in enumerate(Config.EMOTIONS)}
    rows = []
    with open(manifest_csv, newline='', encoding='utf-8') as f:
        for row in _csv.DictReader(f):
            if row.get('label', '').lower() in label_to_idx:
                rows.append(row)
    if not rows:
        raise SystemExit(f'no usable rows in {manifest_csv}')
    if verbose:
        print(f'Extracting features for {len(rows)} triples...')

    engine = EmotionEngine(models_dir=models_dir)
    if not (engine.speech and engine.bert and engine.image):
        raise SystemExit('real-feature extraction requires speech, bert, '
                         'and image artifacts')

    s_f, t_f, i_f, s_p, t_p, i_p, labels = [], [], [], [], [], [], []
    for s in range(0, len(rows), chunk):
        part = rows[s:s + chunk]
        sp = engine.predict_speech_paths([r['audio_path'] for r in part],
                                         want_features=True)
        tx = engine.predict_texts([r['text'] for r in part],
                                  want_features=True)
        im = engine.predict_image_paths([r['image_path'] for r in part],
                                        want_features=True)
        for r, a, b, c in zip(part, sp, tx, im):
            s_f.append(a['_features'])
            t_f.append(b['_features'])
            i_f.append(c['_features'])
            s_p.append(a['all_probabilities'])
            t_p.append(b['all_probabilities'])
            i_p.append(c['all_probabilities'])
            labels.append(label_to_idx[r['label'].lower()])
    return (np.asarray(s_f, np.float32), np.asarray(t_f, np.float32),
            np.asarray(i_f, np.float32), np.asarray(s_p, np.float32),
            np.asarray(t_p, np.float32), np.asarray(i_p, np.float32),
            np.asarray(labels, np.int32))


def make_steps(model: MultiModalFusionModel):
    @jax.jit
    def train_step(state: common.TrainState, batch, dropout_rng):
        def loss_fn(params):
            logits, aw, dw = model.apply(
                {'params': params},
                batch['s_feat'], batch['t_feat'], batch['i_feat'],
                batch['s_pred'], batch['t_pred'], batch['i_pred'],
                train=True, rngs={'dropout': dropout_rng})
            onehot = jax.nn.one_hot(batch['label'], logits.shape[-1])
            return common.softmax_cross_entropy(logits, onehot), (aw, dw)

        (loss, (aw, dw)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, aw.mean(0), dw.mean(0)

    @jax.jit
    def eval_step(variables, batch):
        logits, _aw, _dw = model.apply(
            {'params': variables['params']},
            batch['s_feat'], batch['t_feat'], batch['i_feat'],
            batch['s_pred'], batch['t_pred'], batch['i_pred'])
        return logits

    return train_step, eval_step


def train(num_samples: int = 10000, epochs: int = 100,
          batch_size: int = 64, learning_rate: float = 1e-3,
          models_dir: Optional[str] = None, mesh_data: int = 0,
          seed: int = 42, dataset=None, verbose: bool = True):
    log = print if verbose else (lambda *_a, **_k: None)
    if dataset is None:
        log('Generating synthetic training data...')
        dataset = generate_synthetic_data(num_samples, seed)
    s_f, t_f, i_f, s_p, t_p, i_p, labels = dataset

    tr, va = metrics.train_test_split_stratified(len(labels), labels,
                                                 0.15, seed=42)

    def sub(idx):
        return {'s_feat': s_f[idx], 't_feat': t_f[idx], 'i_feat': i_f[idx],
                's_pred': s_p[idx], 't_pred': t_p[idx], 'i_pred': i_p[idx],
                'label': labels[idx]}

    cfg = {'speech_dim': s_f.shape[1], 'text_dim': t_f.shape[1],
           'image_dim': i_f.shape[1], 'num_classes': Config.NUM_EMOTIONS,
           'hidden_dim': 256}
    model = MultiModalFusionModel(**cfg)
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg['speech_dim'])), jnp.zeros((1, cfg['text_dim'])),
        jnp.zeros((1, cfg['image_dim'])),
        jnp.zeros((1, cfg['num_classes'])),
        jnp.zeros((1, cfg['num_classes'])),
        jnp.zeros((1, cfg['num_classes'])))

    # CosineAnnealingWarmRestarts(T_0=10, T_mult=2) over epoch boundaries
    steps_per_epoch = max(1, len(tr) // batch_size)
    schedules, boundaries = [], []
    t, total = 10, 0
    while total < epochs:
        span = min(t, epochs - total) * steps_per_epoch
        schedules.append(optax.cosine_decay_schedule(learning_rate, span))
        total += t
        boundaries.append(total * steps_per_epoch)
        t *= 2
    lr = optax.join_schedules(schedules, boundaries[:-1]) \
        if len(schedules) > 1 else schedules[0]
    # inject_hyperparams (via adamw_with_clip) so get_lr logs the live
    # rate instead of 'lr: nan'
    tx = common.adamw_with_clip(lr, weight_decay=0.01, clipnorm=1.0)
    state = common.TrainState.create({'params': variables['params']}, tx)

    train_step_full, eval_step = make_steps(model)

    def train_step(state, batch, rng):
        state, loss, _aw, _dw = train_step_full(state, batch, rng)
        # the step must stay side-effect-free: under fit()'s lax.scan
        # fast path it is TRACED, and stashing aw/dw here leaks tracers
        # (reproduced: np.asarray of them crashed at epoch end whenever
        # the split divided evenly by batch_size)
        return state, loss

    # per-epoch mean attention/decision weights (reference
    # train_fusion_model.py:602-603), computed on a fixed probe batch
    probe = {k: v[:64] for k, v in sub(va).items()}

    @jax.jit
    def weights_step(variables, batch):
        _logits, aw, dw = model.apply(
            variables, batch['s_feat'], batch['t_feat'], batch['i_feat'],
            batch['s_pred'], batch['t_pred'], batch['i_pred'])
        return jnp.mean(aw, axis=0), jnp.mean(dw, axis=0)

    def on_epoch_end(epoch, state, history):
        aw, dw = weights_step(state.variables, probe)
        log(f'  mean attention weights [s,t,i]: '
            f'{np.round(np.asarray(aw), 3).tolist()} | decision weights: '
            f'{np.round(np.asarray(dw), 3).tolist()}')

    mesh = make_mesh(data=mesh_data) if mesh_data > 1 else None
    state, best_vars, history = common.fit(
        state, sub(tr), sub(va), train_step, eval_step,
        epochs=epochs, batch_size=batch_size, seed=seed,
        monitor='val_acc', patience=15, mesh=mesh, log_fn=log,
        on_epoch_end=on_epoch_end)

    padded, n = common.pad_batch(sub(va), len(va))
    logits = np.asarray(eval_step(best_vars, padded))[:n]
    preds = logits.argmax(axis=-1)
    log('\n' + metrics.classification_report(labels[va], preds,
                                             Config.EMOTIONS))
    common.record_metrics('fusion_attention', max(history['val_acc']),
                          labels[va], preds)

    models_dir = models_dir or os.path.dirname(Config.FUSION_MODEL_PATH)
    os.makedirs(models_dir, exist_ok=True)
    out = os.path.join(models_dir, 'fusion_model.mecp')
    store.save_params(out, best_vars,
                      meta={'config': cfg,
                            'val_acc': float(max(history['val_acc']))})
    log(f'Saved {out}')
    return best_vars, cfg, history


def main(argv=None):
    p = argparse.ArgumentParser(description='Train the fusion model')
    p.add_argument('--epochs', type=int, default=100)
    p.add_argument('--batch-size', type=int, default=64)
    p.add_argument('--learning-rate', type=float, default=1e-3)
    p.add_argument('--num-samples', type=int, default=10000)
    p.add_argument('--models-dir', default=None)
    p.add_argument('--mesh-data', type=int, default=0)
    p.add_argument('--manifest', default=None,
                   help='CSV of audio_path,text,image_path,label rows: '
                        'train on real multimodal triples instead of '
                        'synthetic data')
    args = p.parse_args(argv)
    dataset = (extract_real_features(args.manifest, args.models_dir)
               if args.manifest else None)
    train(args.num_samples, args.epochs, args.batch_size,
          args.learning_rate, args.models_dir, args.mesh_data,
          dataset=dataset)


if __name__ == '__main__':
    main()
