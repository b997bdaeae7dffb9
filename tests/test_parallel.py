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
