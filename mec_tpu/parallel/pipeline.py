"""GPipe-style pipeline parallelism for the BERT encoder.

The reference has no pipeline story (single-GPU torch serving,
reference inference/text_inference.py:37); this module exists for the
TPU-pod regime the rebuild targets, completing the parallelism ladder
next to DP (mesh 'data' axis), Megatron TP (parallel/partition.py) and
multi-host DCN (parallel/distributed.py):

  * encoder layers are stacked on a leading axis and that axis is
    sharded over the mesh's 'pipe' axis (each stage holds
    num_layers/S contiguous layers);
  * a shard_map-ed microbatch schedule streams activations
    stage-to-stage over ICI with lax.ppermute;
  * XLA sees one lax.scan over the M+S-1 schedule ticks — static
    shapes, no data-dependent Python control flow;
  * jax.grad's transpose of ppermute runs the reverse schedule, so a
    single jit covers forward+backward (GPipe: full activation stash,
    optionally rematerialized per layer with jax.checkpoint).

Composes with data parallelism (mesh ('data', ..., 'pipe')): the batch
dim stays sharded on 'data' outside and inside the shard_map and
activations never cross the 'data' axis. Composes with Megatron tensor
parallelism too (3D DPxTPxPP): tp_bert_layer_apply runs each stage's
layers on 1/m of the heads + FFN width per 'model' rank (param shards
per stacked_tp_specs) with two psums over 'model' per layer — exactly
the partition.py rules, executed manually inside the shard_map.

Design notes (TPU-first):
  * Microbatch inputs live REPLICATED over 'pipe' (every stage holds
    its full local batch): at emotion-model scale (seq<=128, hidden
    768) the embeddings tensor is tiny, and replication buys a
    gather-free, shape-static injection — no dynamic cross-device
    slicing, which TPUs punish.
  * Collection is one psum over 'pipe' of the last stage's output
    buffer (zeros elsewhere): one ICI all-reduce per batch.
  * Per-tick stage compute is a lax.scan over the stage's local layer
    slice, so the whole pipeline is two nested scans.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS


def stack_layer_params(params: dict, num_layers: int,
                       prefix: str = 'layer_') -> Any:
    """Stack `params[f'{prefix}i']` for i in [0, num_layers) on a new
    leading axis (the pipeline shards this axis over 'pipe')."""
    layers = [params[f'{prefix}{i}'] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked: Any, prefix: str = 'layer_') -> dict:
    """Inverse of stack_layer_params (canonical flax checkpoint layout)."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return {f'{prefix}{i}':
            jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
            for i in range(n)}


def stacked_tp_specs(pipe_axis: str = PIPE_AXIS,
                     model_axis: str = MODEL_AXIS) -> dict:
    """shard_map in_specs for a stacked BertLayer param tree under TP+PP.

    Leading dim (the layer stack) shards over `pipe_axis`; kernel dims
    follow the Megatron column/row rules of parallel/partition.py
    (column-split q/k/v + FFN-in, row-split output projections,
    LayerNorms and row-output biases replicated over `model_axis`).
    """
    col_k = P(pipe_axis, None, model_axis)
    row_k = P(pipe_axis, model_axis, None)
    col_b = P(pipe_axis, model_axis)
    rep = P(pipe_axis)
    ln = {'scale': rep, 'bias': rep}
    return {
        'attention_self': {n: {'kernel': col_k, 'bias': col_b}
                           for n in ('query', 'key', 'value')},
        'attention_output': {'kernel': row_k, 'bias': rep},
        'attention_norm': ln,
        'intermediate': {'kernel': col_k, 'bias': col_b},
        'output': {'kernel': row_k, 'bias': rep},
        'output_norm': ln,
    }


def tp_bert_layer_apply(nh_local: int, model_axis: str = MODEL_AXIS,
                        gelu_approximate: bool = False) -> Callable:
    """Megatron-TP BertLayer forward on LOCAL param shards.

    Same math as models.bert.BertLayer (post-LN, fp32 softmax, erf or
    tanh GELU) but each rank holds 1/m of the heads and 1/m of the FFN
    width (shards per stacked_tp_specs); the two row-parallel output
    projections psum over `model_axis`, after which hidden is replicated
    over 'model' again — two ICI all-reduces per layer, the Megatron
    pattern. jax.grad's transpose of the replicated-in/psum-out pair
    yields the matching backward collectives for free.
    """

    def dense(p, x):
        return x @ p['kernel'].astype(x.dtype) + p['bias'].astype(x.dtype)

    def apply(lp, h, bias):
        B, L, _H = h.shape
        q = dense(lp['attention_self']['query'], h)
        k = dense(lp['attention_self']['key'], h)
        v = dense(lp['attention_self']['value'], h)
        hd = q.shape[-1] // nh_local  # per-head dim is sharding-invariant
        q = q.reshape(B, L, nh_local, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, nh_local, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, nh_local, hd).transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(hd).astype(h.dtype)
        scores = scores + bias[:, None, None, :]
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(h.dtype)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(B, L, -1)
        att = jax.lax.psum(
            ctx @ lp['attention_output']['kernel'].astype(h.dtype),
            model_axis) + lp['attention_output']['bias'].astype(h.dtype)
        # cast LN back: fp32 scale/bias would otherwise promote bf16 hidden
        h = _layernorm(lp['attention_norm'], h + att).astype(h.dtype)
        inter = jax.nn.gelu(dense(lp['intermediate'], h),
                            approximate=gelu_approximate)
        out = jax.lax.psum(
            inter @ lp['output']['kernel'].astype(h.dtype),
            model_axis) + lp['output']['bias'].astype(h.dtype)
        return _layernorm(lp['output_norm'], h + out).astype(h.dtype)

    return apply


def pipeline_encoder(layer_apply: Callable[[Any, jnp.ndarray, jnp.ndarray],
                                           jnp.ndarray],
                     stacked: Any, hidden: jnp.ndarray,
                     attn_bias: jnp.ndarray, mesh,
                     num_microbatches: int = 2,
                     data_axis: str = DATA_AXIS,
                     pipe_axis: str = PIPE_AXIS,
                     remat: bool = True,
                     param_specs: Any = None) -> jnp.ndarray:
    """Run stacked encoder layers as a GPipe pipeline over mesh[pipe_axis].

    layer_apply(layer_params, h, bias) -> h applies ONE layer.
    stacked: pytree with leading dim num_layers (divisible by the pipe
    axis size). hidden: (B, L, H) embeddings, batch-sharded on
    `data_axis`. attn_bias: (B, L) additive mask. Returns the final
    hidden states (B, L, H) with the same sharding as `hidden`.

    param_specs: optional pytree of PartitionSpecs for `stacked` (default
    P(pipe_axis) on every leaf). Pass stacked_tp_specs() together with a
    tp_bert_layer_apply body to compose tensor parallelism with the
    pipeline on a ('data','model','pipe') mesh.
    """
    S = mesh.shape[pipe_axis]
    M = int(num_microbatches)
    num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    if num_layers % S:
        raise ValueError(f'{num_layers} layers do not split over '
                         f'{S} pipeline stages')
    dp = mesh.shape.get(data_axis, 1)
    if (hidden.shape[0] // dp) % M:
        raise ValueError(f'per-shard batch {hidden.shape[0]}/{dp} does '
                         f'not split into {M} microbatches')

    def shard_fn(local_layers, h_loc, bias_loc):
        s = jax.lax.axis_index(pipe_axis)
        mb = h_loc.shape[0] // M
        xs = h_loc.reshape(M, mb, *h_loc.shape[1:])
        biases = bias_loc.reshape(M, mb, bias_loc.shape[-1])

        fwd_perm = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            state, outs = carry
            # stage 0 injects microbatch t (clamped: late ticks feed
            # garbage that never reaches the collected output window)
            inj = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x = jnp.where(s == 0, inj, state)
            # the microbatch flowing through stage s at tick t is t-s
            bias = jax.lax.dynamic_index_in_dim(
                biases, jnp.clip(t - s, 0, M - 1), 0, keepdims=False)

            def one_layer(h, lp):
                return layer_apply(lp, h, bias), None

            body = jax.checkpoint(one_layer) if remat else one_layer
            y, _ = jax.lax.scan(body, x, local_layers)
            # last stage collects microbatch t-(S-1)
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            valid = jnp.logical_and(s == S - 1, t >= S - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, widx, 0,
                                               keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), widx, 0)
            state = jax.lax.ppermute(y, pipe_axis, fwd_perm)
            return (state, outs), None

        (state, outs), _ = jax.lax.scan(
            tick, (jnp.zeros_like(xs[0]), jnp.zeros_like(xs)),
            jnp.arange(M + S - 1))
        # broadcast the last stage's collection to every pipe rank
        outs = jax.lax.psum(
            jnp.where(s == S - 1, outs, jnp.zeros_like(outs)), pipe_axis)
        return outs.reshape(h_loc.shape)

    axis_names = set(mesh.axis_names)
    batch_spec = P(data_axis) if data_axis in axis_names else P()
    if param_specs is None:
        param_specs = jax.tree_util.tree_map(lambda _: P(pipe_axis),
                                             stacked)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(param_specs, batch_spec, batch_spec),
        out_specs=batch_spec, check_vma=False,
    )(stacked, hidden, attn_bias)


def _layernorm(lp, x):
    # flax nn.LayerNorm(eps=1e-12, use_fast_variance=False) semantics
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + 1e-12) * lp['scale'] + lp['bias']


def bert_pipeline_forward(model, variables: dict, input_ids: jnp.ndarray,
                          attention_mask: jnp.ndarray, mesh,
                          num_microbatches: int = 2, *,
                          train: bool = False,
                          dropout_rng: Optional[jax.Array] = None,
                          remat: bool = True):
    """BertForSequenceClassification forward with the encoder pipelined.

    Logits/cls parity with model.apply (dropout off) <= 1e-5 on fp32
    (tests/test_pipeline.py). Embeddings / pooler / classifier are
    computed from the same param tree outside the shard_map (they are
    <1% of the FLOPs; GSPMD keeps them batch-sharded on 'data'), the 12
    encoder layers — ~99% of BERT's compute — run inside the pipeline.
    Dropout (train=True) uses fresh folds of `dropout_rng`; it matches
    the model's two dropout SITES (embeddings, pooled), not flax's rng
    fold ordering, so stochastic training steps are valid but not
    bit-identical to model.apply.
    """
    from mec_tpu.models.bert import BertLayer

    p = variables['params']
    dtype = model.dtype
    B, L = input_ids.shape

    # pad the batch to a multiple of dp x microbatches (static under
    # jit) and slice the outputs back below. Pad rows attend ONLY the
    # CLS position — an all-zero mask would make every attention row
    # all -inf, which is merely uniform-softmax in fp32 but NaN in
    # bf16 (finfo(float32).min rounds to -inf), and the backward
    # pass's NaN*0 would poison every weight gradient.
    need = mesh.shape.get(DATA_AXIS, 1) * int(num_microbatches)
    pad = (-B) % need
    if pad:
        input_ids = jnp.concatenate(
            [input_ids, jnp.zeros((pad, L), input_ids.dtype)])
        pad_mask = jnp.zeros((pad, L), attention_mask.dtype
                             ).at[:, 0].set(1)
        attention_mask = jnp.concatenate([attention_mask, pad_mask])

    word = jnp.take(p['word_embeddings']['embedding'], input_ids,
                    axis=0).astype(dtype)
    pos = p['position_embeddings']['embedding'][:L][None].astype(dtype)
    tok = p['token_type_embeddings']['embedding'][0][None, None].astype(
        dtype)  # token_type_ids are all zero (single-segment, as model)
    h = _layernorm(p['embeddings_norm'], word + pos + tok)
    if train and model.dropout_rate > 0 and dropout_rng is not None:
        keep = 1.0 - model.dropout_rate
        k = jax.random.fold_in(dropout_rng, 0)
        h = h * jax.random.bernoulli(k, keep, h.shape) / keep

    neg = jnp.finfo(jnp.float32 if dtype == jnp.bfloat16 else dtype).min
    attn_bias = ((1.0 - attention_mask.astype(jnp.float32)) * neg
                 ).astype(dtype)

    tp = mesh.shape.get(MODEL_AXIS, 1)
    param_specs = None
    if tp > 1:
        # Megatron TP inside the pipeline stages: shard heads + FFN width
        # over 'model', psum the row-parallel projections per layer.
        if model.num_heads % tp or model.intermediate_size % tp:
            raise ValueError(
                f'{model.num_heads} heads / {model.intermediate_size} FFN '
                f'width do not split over model axis {tp}')
        layer_apply = tp_bert_layer_apply(
            model.num_heads // tp,
            gelu_approximate=model.gelu_approximate)
        param_specs = stacked_tp_specs()
    else:
        layer = BertLayer(model.hidden_size, model.num_heads,
                          model.intermediate_size, dtype,
                          model.gelu_approximate)

        def layer_apply(lp, x, bias):
            return layer.apply({'params': lp}, x, bias)

    stacked = stack_layer_params(p, model.num_layers)
    hidden = pipeline_encoder(layer_apply, stacked, h.astype(dtype),
                              attn_bias, mesh, num_microbatches,
                              remat=remat, param_specs=param_specs)

    cls = hidden[:, 0, :]
    pooled = jnp.tanh(cls @ p['pooler']['kernel'] + p['pooler']['bias'])
    if train and model.dropout_rate > 0 and dropout_rng is not None:
        keep = 1.0 - model.dropout_rate
        k = jax.random.fold_in(dropout_rng, 1)
        pooled = pooled * jax.random.bernoulli(k, keep,
                                               pooled.shape) / keep
    logits = pooled @ p['classifier']['kernel'] + p['classifier']['bias']
    return (logits.astype(jnp.float32)[:B], cls.astype(jnp.float32)[:B])


def make_pipeline_steps(model, mesh, num_microbatches: int = 2):
    """Pipeline-parallel drop-in for train_text_bert.make_steps.

    Same contracts as training.common.fit expects:
      train_step(state, batch, dropout_rng) -> (state, loss)
      eval_step(variables, batch) -> logits
    Params stay in the canonical flax layout; the per-step stack of the
    layer dicts is a few device-local copies under jit, which keeps
    checkpoints/converters unchanged.
    """
    # deferred: common.py imports parallel.mesh, whose parent package
    # imports this module — a module-level import here would cycle
    from mec_tpu.training.common import softmax_cross_entropy

    def _ce(logits, labels):
        return softmax_cross_entropy(
            logits, jax.nn.one_hot(labels, logits.shape[-1]))

    @jax.jit
    def train_step(state, batch, dropout_rng):
        def loss_fn(params):
            logits, _cls = bert_pipeline_forward(
                model, {'params': params}, batch['ids'], batch['mask'],
                mesh, num_microbatches, train=True,
                dropout_rng=dropout_rng)
            return _ce(logits, batch['label'])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(variables, batch):
        logits, _cls = bert_pipeline_forward(
            model, variables, batch['ids'], batch['mask'], mesh,
            num_microbatches)
        return logits

    return train_step, eval_step
