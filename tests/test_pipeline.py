"""Pipeline-parallel BERT encoder (parallel/pipeline.py) on the virtual
8-device CPU mesh: forward/grad parity with the plain model and
composition with data parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mec_tpu.models.bert import BertForSequenceClassification
from mec_tpu.parallel.mesh import make_mesh
from mec_tpu.parallel.pipeline import (bert_pipeline_forward,
                                       stack_layer_params,
                                       unstack_layer_params)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason='needs 8 virtual devices')


def tiny_model(num_layers=8):
    return BertForSequenceClassification(
        vocab_size=97, hidden_size=32, num_layers=num_layers, num_heads=2,
        intermediate_size=64, max_position=32, dropout_rate=0.0)


def tiny_batch(B=8, L=16, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, 97, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    # ragged padding to exercise the additive mask through the pipeline
    for i in range(B):
        mask[i, L - (i % 5):] = 0
        ids[i, L - (i % 5):] = 0
    labels = (rng.randint(0, 7, size=(B,))).astype(np.int32)
    return ids, mask, labels


def test_stack_unstack_roundtrip():
    model = tiny_model(4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))
    stacked = stack_layer_params(variables['params'], 4)
    back = unstack_layer_params(stacked)
    for i in range(4):
        orig = variables['params'][f'layer_{i}']
        got = back[f'layer_{i}']
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            orig, got)


@pytest.mark.parametrize('dp,tp,pp,M', [(2, 1, 4, 2), (1, 1, 8, 4),
                                        (2, 2, 2, 2), (1, 2, 4, 2)])
def test_pipeline_forward_matches_plain(dp, tp, pp, M):
    model = tiny_model(8)
    ids, mask, _ = tiny_batch(B=8)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))
    ref_logits, ref_cls = model.apply(variables, ids, mask)
    mesh = make_mesh(data=dp, model=tp, pipe=pp)
    logits, cls = jax.jit(
        lambda v, i, m: bert_pipeline_forward(model, v, i, m, mesh, M)
    )(variables, ids, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(ref_cls),
                               atol=1e-5)


def test_pipeline_grads_match_plain():
    model = tiny_model(8)
    ids, mask, labels = tiny_batch(B=8)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))
    mesh = make_mesh(data=2, model=1, pipe=4)
    onehot = jax.nn.one_hot(labels, 7)

    def ce(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -(onehot * logp).sum(axis=-1).mean()

    def loss_plain(params):
        logits, _ = model.apply({'params': params}, ids, mask)
        return ce(logits)

    def loss_pipe(params):
        logits, _ = bert_pipeline_forward(model, {'params': params},
                                          ids, mask, mesh, 2)
        return ce(logits)

    g_plain = jax.jit(jax.grad(loss_plain))(variables['params'])
    g_pipe = jax.jit(jax.grad(loss_pipe))(variables['params'])
    flat_a, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(g_pipe)[0])
    for kp, a in flat_a:
        b = flat_b[kp]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg='/'.join(str(getattr(k, "key", k)) for k in kp))


def test_pipeline_forward_pads_ragged_batch():
    # B=6 does not divide dp*M=4: the forward pads internally and
    # slices the outputs back (fit()'s eval paths use arbitrary sizes)
    model = tiny_model(8)
    ids, mask, _ = tiny_batch(B=6, seed=7)
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))
    ref_logits, _ = model.apply(variables, ids, mask)
    mesh = make_mesh(data=2, model=1, pipe=4)
    logits, cls = jax.jit(
        lambda v, i, m: bert_pipeline_forward(model, v, i, m, mesh, 2)
    )(variables, ids, mask)
    assert logits.shape == (6, 7) and cls.shape == (6, 32)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=1e-5)


def test_pipeline_bf16_ragged_grads_finite():
    # regression: all-zero-mask batch padding made the pad rows' -inf
    # attention bias NaN in bf16 and the backward NaN*0 poisoned every
    # weight grad; pad rows now attend only CLS
    model = BertForSequenceClassification(
        vocab_size=97, hidden_size=32, num_layers=4, num_heads=2,
        intermediate_size=64, max_position=32, dropout_rate=0.0,
        dtype=jnp.bfloat16)
    ids, mask, labels = tiny_batch(B=6, seed=9)
    variables = model.init(jax.random.PRNGKey(6),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))
    mesh = make_mesh(data=2, model=1, pipe=4)
    onehot = jax.nn.one_hot(labels, 7)

    def loss(params):
        logits, _ = bert_pipeline_forward(model, {'params': params},
                                          ids, mask, mesh, 2)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -(onehot * logp).sum(axis=-1).mean()

    grads = jax.jit(jax.grad(loss))(variables['params'])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_tp_pipeline_grads_match_plain():
    """3D DPxTPxPP: grads through the Megatron stage body (psum over
    'model' inside the shard_map) match the plain model."""
    model = tiny_model(8)
    ids, mask, labels = tiny_batch(B=8, seed=11)
    variables = model.init(jax.random.PRNGKey(8),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))
    mesh = make_mesh(data=2, model=2, pipe=2)
    onehot = jax.nn.one_hot(labels, 7)

    def ce(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -(onehot * logp).sum(axis=-1).mean()

    def loss_plain(params):
        logits, _ = model.apply({'params': params}, ids, mask)
        return ce(logits)

    def loss_pipe(params):
        logits, _ = bert_pipeline_forward(model, {'params': params},
                                          ids, mask, mesh, 2)
        return ce(logits)

    g_plain = jax.jit(jax.grad(loss_plain))(variables['params'])
    g_pipe = jax.jit(jax.grad(loss_pipe))(variables['params'])
    flat_a, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_b = dict(jax.tree_util.tree_flatten_with_path(g_pipe)[0])
    for kp, a in flat_a:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat_b[kp]), atol=2e-5,
            err_msg='/'.join(str(getattr(k, "key", k)) for k in kp))


def test_tp_pipeline_rejects_unsplittable_heads():
    model = tiny_model(8)  # 2 heads cannot split over model axis 4
    ids, mask, _ = tiny_batch(B=8)
    variables = model.init(jax.random.PRNGKey(9),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))
    mesh = make_mesh(data=1, model=4, pipe=2)
    with pytest.raises(ValueError, match='heads'):
        bert_pipeline_forward(model, variables, jnp.asarray(ids),
                              jnp.asarray(mask), mesh, 2)


def test_bert_trainer_mesh_pipe(tmp_path):
    """train_text_bert --mesh-model 2 --mesh-pipe 2 (3D wiring: TP param
    placement + pipeline steps) end to end on the virtual mesh."""
    import string

    from mec_tpu.text.wordpiece import WordPieceTokenizer
    from mec_tpu.training import train_text_bert

    phrases = ['what a wonderful day i feel great',
               'terrible news i feel so down',
               'this makes me furious and mad',
               'i am scared and anxious about it',
               'that is gross and revolting',
               'wow i did not expect that at all',
               'the meeting is at three this afternoon']
    texts, labels = [], []
    for idx, ph in enumerate(phrases):
        for j in range(6):
            texts.append(ph + (' really' * (j % 3)))
            labels.append(idx)
    words = sorted({w for t in texts for w in t.split()})
    tokens = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]']
    tokens += list(string.ascii_lowercase) + words
    tok = WordPieceTokenizer({t: i for i, t in enumerate(tokens)})

    _, hist = train_text_bert.train(
        csv_path=None, texts=np.array(texts, object),
        labels=np.array(labels, np.int32), tokenizer=tok, epochs=3,
        batch_size=8, max_length=16, learning_rate=1e-3,
        model_kwargs=dict(vocab_size=len(tokens), hidden_size=32,
                          num_layers=4, num_heads=2,
                          intermediate_size=64, max_position=32),
        models_dir=str(tmp_path), verbose=False, seq_bucket=False,
        mesh_model=2, mesh_pipe=2, microbatches=2)
    assert np.isfinite(hist['loss']).all()
    assert hist['val_acc'][-1] >= 0.0 and (tmp_path / 'config.json').exists()


def test_pipeline_train_step_reduces_loss():
    import optax

    model = tiny_model(4)
    ids, mask, labels = tiny_batch(B=8, seed=3)
    variables = model.init(jax.random.PRNGKey(4),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), jnp.int32))
    mesh = make_mesh(data=2, model=1, pipe=4)
    tx = optax.adam(5e-3)
    params = variables['params']
    opt = tx.init(params)
    onehot = jax.nn.one_hot(labels, 7)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits, _ = bert_pipeline_forward(model, {'params': p},
                                              ids, mask, mesh, 2)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -(onehot * logp).sum(axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(8):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
