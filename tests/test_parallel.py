"""Mesh/sharding tests on the 8-virtual-device CPU mesh (the JAX analogue
of a fake distributed backend, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mec_tpu.parallel import (batch_sharding, bert_partition_rules,
                              make_mesh, partition_spec_for, replicated,
                              shard_batch, shard_variables)


def test_make_mesh_shapes():
    mesh = make_mesh(data=8, model=1)
    assert mesh.shape == {'data': 8, 'model': 1}
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {'data': 4, 'model': 2}


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(data=8, model=1)
    batch = {'x': np.zeros((16, 4), np.float32),
             'scalar': np.zeros((3,), np.float32)}  # 3 % 8 != 0
    placed = shard_batch(mesh, batch)
    assert placed['x'].sharding.spec == P('data')
    assert placed['scalar'].sharding.spec == P()


def test_partition_rules_match_bert_paths():
    rules = bert_partition_rules()
    assert partition_spec_for(
        ('params', 'layer_3', 'attention_self_query', 'kernel'),
        rules) == P(None, 'model')
    assert partition_spec_for(
        ('params', 'layer_0', 'intermediate', 'kernel'),
        rules) == P(None, 'model')
    assert partition_spec_for(
        ('params', 'layer_0', 'output', 'kernel'),
        rules) == P('model', None)
    assert partition_spec_for(
        ('params', 'word_embeddings', 'embedding'), rules) == P()


def test_shard_variables_tp2_executes():
    """TP-sharded BERT forward == replicated forward (GSPMD collectives)."""
    from mec_tpu.models.bert import BertForSequenceClassification
    model = BertForSequenceClassification(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position=32)
    ids = jnp.ones((4, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids, ids)
    ref_logits, _ = model.apply(variables, ids, ids)

    mesh = make_mesh(data=4, model=2)
    sharded = shard_variables(mesh, variables['params'])
    # FFN kernels actually split on the model axis
    inter = sharded['layer_0']['intermediate']['kernel']
    assert inter.sharding.spec == P(None, 'model')
    logits, _ = jax.jit(lambda p, i: model.apply({'params': p}, i, i))(
        sharded, jax.device_put(ids, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-5)


def test_replicated_sharding():
    mesh = make_mesh(data=8, model=1)
    x = jax.device_put(np.ones((4, 4), np.float32), replicated(mesh))
    assert x.sharding.spec == P()


def test_initialize_multi_host_plumbing(monkeypatch):
    """Arg/env resolution for jax.distributed.initialize (no cluster in
    tests — the call itself is captured)."""
    from mec_tpu.parallel import distributed

    calls = {}

    class FakeDistributed:
        @staticmethod
        def initialize(**kw):
            calls.update(kw)

    monkeypatch.setattr(jax, 'distributed', FakeDistributed)
    for var in ('MEC_COORDINATOR_ADDRESS', 'TPU_WORKER_HOSTNAMES',
                'MEGASCALE_COORDINATOR_ADDRESS'):
        monkeypatch.delenv(var, raising=False)
    # nothing configured -> single-process no-op
    assert distributed.initialize_multi_host() is False
    assert calls == {}
    # env-driven
    monkeypatch.setenv('MEC_COORDINATOR_ADDRESS', 'host0:1234')
    monkeypatch.setenv('MEC_NUM_PROCESSES', '4')
    monkeypatch.setenv('MEC_PROCESS_ID', '2')
    assert distributed.initialize_multi_host() is True
    assert calls == {'coordinator_address': 'host0:1234',
                     'num_processes': 4, 'process_id': 2}


def test_seq_parallel_matches_replicated():
    """Megatron sequence parallelism (seq dim sharded over the TP axis at
    the residual stream, models/bert.py _seq_constrain) must be a pure
    layout change: logits match the unsharded forward."""
    from mec_tpu.models.bert import BertForSequenceClassification

    kw = dict(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
              intermediate_size=64, max_position=32)
    base = BertForSequenceClassification(**kw)
    sp = BertForSequenceClassification(seq_spec=('data', 'model'), **kw)

    ids = np.arange(4 * 8, dtype=np.int32).reshape(4, 8) % 64
    mask = np.ones((4, 8), np.int32)
    mask[:, 6:] = 0  # exercise the additive attention bias
    variables = base.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                          jnp.asarray(mask))
    ref_logits, ref_cls = base.apply(variables, jnp.asarray(ids),
                                     jnp.asarray(mask))

    mesh = make_mesh(data=2, model=4)
    sharded = shard_variables(mesh, variables['params'])
    fwd = jax.jit(lambda p, i, m: sp.apply({'params': p}, i, m))
    with jax.sharding.set_mesh(mesh):
        # the seq-dim constraint actually lowers into the module
        hlo = fwd.lower(sharded,
                        jax.device_put(ids, batch_sharding(mesh)),
                        jax.device_put(mask, batch_sharding(mesh))
                        ).as_text()
        assert ('sdy.sharding_constraint' in hlo  # Shardy lowering
                or 'Sharding' in hlo)            # legacy GSPMD custom-call
        logits, cls = fwd(sharded,
                          jax.device_put(ids, batch_sharding(mesh)),
                          jax.device_put(mask, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(ref_cls),
                               atol=2e-5)


def test_seq_parallel_train_step_loss_matches():
    """One SP train step computes the same loss as the plain DPxTP step."""
    from mec_tpu.models.bert import BertForSequenceClassification
    from mec_tpu.training import common
    from mec_tpu.training.train_text_bert import make_steps

    kw = dict(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
              intermediate_size=64, max_position=32, dropout_rate=0.0)
    base = BertForSequenceClassification(**kw)
    sp = BertForSequenceClassification(seq_spec=('data', 'model'), **kw)
    dummy = jnp.zeros((1, 8), jnp.int32)
    variables = base.init(jax.random.PRNGKey(0), dummy, dummy)
    tx = common.adamw_with_clip(1e-3, weight_decay=0.01, clipnorm=1.0)

    batch = {'ids': np.ones((4, 8), np.int32),
             'mask': np.ones((4, 8), np.int32),
             'label': np.zeros((4,), np.int32)}
    step_base, _ = make_steps(base)
    state0 = common.TrainState.create(variables, tx)
    _, ref_loss = step_base(state0, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(data=2, model=4)
    state = common.TrainState.create(variables, tx)
    state = jax.device_put(state, replicated(mesh))
    state = state.replace(params=shard_variables(mesh, state.params))
    step_sp, _ = make_steps(sp)
    with jax.sharding.set_mesh(mesh):
        state, loss = step_sp(state, shard_batch(mesh, batch),
                              jax.random.PRNGKey(1))
        jax.block_until_ready(state.params)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5)


def test_seq_parallel_cli_guards():
    """--seq-parallel without TP (or with PP) exits loudly."""
    import pytest

    from mec_tpu.training.train_text_bert import train

    with pytest.raises(SystemExit, match='mesh-model'):
        train('', texts=['a happy day'], labels=[0], verbose=False,
              seq_parallel=True, mesh_model=1,
              tokenizer=_tiny_tokenizer())
    with pytest.raises(SystemExit, match='mesh-pipe'):
        train('', texts=['a happy day'], labels=[0], verbose=False,
              seq_parallel=True, mesh_model=2, mesh_pipe=2,
              tokenizer=_tiny_tokenizer())


def _tiny_tokenizer():
    from mec_tpu.text.wordpiece import WordPieceTokenizer
    vocab = {t: i for i, t in enumerate(
        ['[PAD]', '[UNK]', '[CLS]', '[SEP]', 'a', 'happy', 'day'])}
    return WordPieceTokenizer(vocab)
