"""Mixture-of-Experts FFN with expert parallelism (GShard-style).

Opt-in TPU-scale extension: the reference serves dense bert-base only
(reference inference/text_inference.py:40-43); this swaps the encoder
FFN for a top-1-routed expert bank so the text model can scale params
without scaling per-token FLOPs, with experts sharded over the mesh
'model' axis (expert parallelism — GSPMD lowers the dispatch/combine
einsums into all-to-alls over ICI).

The dispatch is the GShard/Switch capacity-based formulation, kept
fully static for XLA:

  * router: dense (H -> E) logits, top-1 expert per token
  * routing group = ONE EXAMPLE (GShard's group, chosen as the example):
    position-in-expert via a cumsum over each example's token one-hots;
    tokens past the expert's per-example capacity C are dropped (their
    FFN output is 0, so the residual connection passes them through —
    Switch Transformer semantics)
  * attention-masked (padding) tokens never route: they claim no
    capacity, contribute nothing to the aux loss, and output 0
  * dispatch:  (B, L, E, C) one-hot  x  (B, L, H)  -> (B, E, C, H)
  * experts:   per-expert kernels (E, H, F), (E, F, H), gelu between
  * combine:   gate-weighted transpose of the dispatch einsum
  * aux loss:  E * sum_e(frac_tokens_e * mean_prob_e)  (load balancing,
    over real tokens only; sown into 'losses' as 'moe_aux')

Per-example routing is what makes MoE a *serving-grade* layer here: a
batch-global cumsum (the usual training formulation) lets one request's
tokens displace another's from expert capacity, so the same request
returns different probabilities depending on its bucket-mates, and
eval logits depend on the padded length. Caught by
tests/test_parallel_serving.py (round-3): the --experts round trip
diverged 0.05 between seq-128 eval and the engine's seq-32 bucket
before the mask/grouping fix. No data-dependent shapes anywhere:
capacity is a static function of (L, E, capacity_factor), routing is
argmax + one-hot matmuls.

Exactness scope (measured on the v5e, 2026-08-19): with mask-aware
per-example routing, logits never depend on bucket-mates' CONTENT.
Capacity still scales with the padded length L (it must — shapes are
static), so logits across different pad lengths agree exactly iff no
expert overflows the smaller capacity; past capacity, extra tokens drop
to the residual (Switch's lossy regime, which the load-balancing loss
trains away from). A kept token's expert slot assignment is
prefix-stable in L, so growing L only ever *un-drops* tokens.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _expert_constrain(x: jnp.ndarray,
                      ep_axis: Optional[str]) -> jnp.ndarray:
    """Constrain a (B, E, C, H) expert-major tensor to shard E over
    `ep_axis` (and B over the data axis when the mesh has one). Resolves
    against the ambient mesh (jax.sharding.set_mesh) at trace time;
    no-op when no mesh naming the axis is in context, so init and
    single-device traces work unannotated."""
    if ep_axis is None:
        return x
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or ep_axis not in mesh.axis_names:
        return x
    from jax.sharding import PartitionSpec as P

    from mec_tpu.parallel.mesh import DATA_AXIS
    b_axis = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    return jax.lax.with_sharding_constraint(
        x, P(b_axis, ep_axis, *([None] * (x.ndim - 2))))


class MoEFFN(nn.Module):
    """Top-1-routed expert FFN, drop-in for the dense BERT FFN block.

    Input (B, L, H) -> output (B, L, H); the caller keeps the residual
    add + LayerNorm so dropped (over-capacity) and padding tokens
    degrade to identity, matching Switch Transformer.
    """
    hidden_size: int
    intermediate_size: int
    num_experts: int = 4
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32
    gelu_approximate: bool = False
    ep_axis: Optional[str] = None  # mesh axis to shard experts over
    router_jitter: float = 0.0     # multiplicative noise at train time

    @nn.compact
    def __call__(self, hidden: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None, *,
                 train: bool = False) -> jnp.ndarray:
        B, L, H = hidden.shape
        E = self.num_experts
        # static PER-EXAMPLE capacity; at least 1 so tiny traces stay
        # valid
        C = max(1, int(self.capacity_factor * L / E))
        m = (jnp.ones((B, L), jnp.float32) if mask is None
             else mask.astype(jnp.float32))

        router = nn.Dense(E, dtype=jnp.float32, name='router')
        logits = router(hidden.astype(jnp.float32))      # (B, L, E)
        if train and self.router_jitter > 0.0:
            rng = self.make_rng('dropout')
            logits = logits * jax.random.uniform(
                rng, logits.shape, minval=1.0 - self.router_jitter,
                maxval=1.0 + self.router_jitter)
        probs = jax.nn.softmax(logits, axis=-1)          # (B, L, E)
        expert_idx = jnp.argmax(probs, axis=-1)          # (B, L)
        # padding tokens route nowhere: no capacity claim, no output
        onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32) \
            * m[:, :, None]
        gate = jnp.sum(probs * onehot, axis=-1)          # (B, L)

        # load-balancing aux loss (Switch eq. 4): E * sum_e f_e * P_e,
        # means over REAL tokens only. Not sown at init so checkpoints
        # never carry a 'losses' collection.
        if not self.is_initializing():
            denom = jnp.maximum(jnp.sum(m), 1.0)
            frac = jnp.sum(onehot, axis=(0, 1)) / denom
            mean_prob = jnp.sum(probs * m[:, :, None], axis=(0, 1)) \
                / denom
            self.sow('losses', 'moe_aux', E * jnp.sum(frac * mean_prob))

        # position of each token within its expert (0-based), cumsum per
        # example over its own sequence; tokens past capacity dropped
        pos = jnp.cumsum(onehot, axis=1) * onehot  # 1-based where routed
        pos = jnp.sum(pos, axis=-1) - 1.0                # (B, L)
        keep = (pos < C) & (pos >= 0)
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), C,
                                dtype=jnp.float32) \
            * keep[:, :, None].astype(jnp.float32)       # (B, L, C)
        dispatch = onehot[:, :, :, None] * pos_oh[:, :, None, :]
        # dispatch: (B, L, E, C)

        xin = jnp.einsum('blh,blec->bech', hidden.astype(jnp.float32),
                         dispatch).astype(self.dtype)
        xin = _expert_constrain(xin, self.ep_axis)

        wi = self.param('wi', nn.initializers.lecun_normal(),
                        (E, H, self.intermediate_size), jnp.float32)
        wo = self.param('wo', nn.initializers.lecun_normal(),
                        (E, self.intermediate_size, H), jnp.float32)
        bi = self.param('bi', nn.initializers.zeros,
                        (E, self.intermediate_size), jnp.float32)
        bo = self.param('bo', nn.initializers.zeros, (E, H), jnp.float32)
        h = jnp.einsum('bech,ehf->becf', xin, wi.astype(self.dtype))
        h = h + bi[None, :, None, :].astype(self.dtype)
        h = nn.gelu(h, approximate=self.gelu_approximate)
        out = jnp.einsum('becf,efh->bech', h, wo.astype(self.dtype))
        out = out + bo[None, :, None, :].astype(self.dtype)
        out = _expert_constrain(out, self.ep_axis)

        combine = dispatch * gate[:, :, None, None]      # (B, L, E, C)
        y = jnp.einsum('bech,blec->blh', out.astype(jnp.float32),
                       combine)
        return y.astype(self.dtype)
