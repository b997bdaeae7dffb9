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
  * position-in-expert via a cumsum over the token one-hots; tokens past
    the expert's capacity C are dropped (their FFN output is 0, so the
    residual connection passes them through — Switch Transformer
    semantics)
  * dispatch:  (T, E, C) one-hot  x  (T, H)  -> (E, C, H)   einsum
  * experts:   per-expert kernels (E, H, F), (E, F, H), gelu between
  * combine:   gate-weighted transpose of the dispatch einsum
  * aux loss:  E * sum_e(frac_tokens_e * mean_prob_e)  (load balancing;
    sown into the 'losses' collection as 'moe_aux')

No data-dependent shapes anywhere: capacity is a static function of
(tokens, E, capacity_factor), routing is argmax + one-hot matmuls.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _expert_constrain(x: jnp.ndarray,
                      ep_axis: Optional[str]) -> jnp.ndarray:
    """Constrain a (E, C, ...) expert-major tensor to shard E over
    `ep_axis`. Resolves against the ambient mesh (jax.sharding.set_mesh)
    at trace time; no-op when no mesh naming the axis is in context, so
    init and single-device traces work unannotated."""
    if ep_axis is None:
        return x
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or ep_axis not in mesh.axis_names:
        return x
    from jax.sharding import PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        x, P(ep_axis, *([None] * (x.ndim - 1))))


class MoEFFN(nn.Module):
    """Top-1-routed expert FFN, drop-in for the dense BERT FFN block.

    Input (B, L, H) -> output (B, L, H); the caller keeps the residual
    add + LayerNorm so dropped (over-capacity) tokens degrade to
    identity, matching Switch Transformer.
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
    def __call__(self, hidden: jnp.ndarray, *, train: bool = False
                 ) -> jnp.ndarray:
        B, L, H = hidden.shape
        E = self.num_experts
        T = B * L
        # static capacity; at least 1 so tiny traces stay valid
        C = max(1, int(self.capacity_factor * T / E))

        tokens = hidden.reshape(T, H)
        router = nn.Dense(E, dtype=jnp.float32, name='router')
        logits = router(tokens.astype(jnp.float32))
        if train and self.router_jitter > 0.0:
            rng = self.make_rng('dropout')
            logits = logits * jax.random.uniform(
                rng, logits.shape, minval=1.0 - self.router_jitter,
                maxval=1.0 + self.router_jitter)
        probs = jax.nn.softmax(logits, axis=-1)          # (T, E)
        expert_idx = jnp.argmax(probs, axis=-1)          # (T,)
        onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32)
        gate = jnp.sum(probs * onehot, axis=-1)          # (T,)

        # load-balancing aux loss (Switch eq. 4): E * sum_e f_e * P_e.
        # Not sown at init so checkpoints never carry a 'losses'
        # collection.
        if not self.is_initializing():
            frac = jnp.mean(onehot, axis=0)
            mean_prob = jnp.mean(probs, axis=0)
            self.sow('losses', 'moe_aux',
                     E * jnp.sum(frac * mean_prob))

        # position of each token within its expert (0-based), tokens
        # past capacity dropped
        pos = jnp.cumsum(onehot, axis=0) * onehot        # 1-based where routed
        pos = jnp.sum(pos, axis=-1) - 1.0                # (T,)
        keep = (pos < C) & (pos >= 0)
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), C,
                                dtype=jnp.float32) \
            * keep[:, None].astype(jnp.float32)          # (T, C)
        dispatch = onehot[:, :, None] * pos_oh[:, None, :]   # (T, E, C)

        xin = jnp.einsum('th,tec->ech', tokens.astype(jnp.float32),
                         dispatch).astype(self.dtype)
        xin = _expert_constrain(xin, self.ep_axis)

        wi = self.param('wi', nn.initializers.lecun_normal(),
                        (E, H, self.intermediate_size), jnp.float32)
        wo = self.param('wo', nn.initializers.lecun_normal(),
                        (E, self.intermediate_size, H), jnp.float32)
        bi = self.param('bi', nn.initializers.zeros,
                        (E, self.intermediate_size), jnp.float32)
        bo = self.param('bo', nn.initializers.zeros, (E, H), jnp.float32)
        h = jnp.einsum('ech,ehf->ecf', xin, wi.astype(self.dtype))
        h = h + bi[:, None, :].astype(self.dtype)
        h = nn.gelu(h, approximate=self.gelu_approximate)
        out = jnp.einsum('ecf,efh->ech', h, wo.astype(self.dtype))
        out = out + bo[:, None, :].astype(self.dtype)
        out = _expert_constrain(out, self.ep_axis)

        combine = dispatch * gate[:, None, None]             # (T, E, C)
        y = jnp.einsum('ech,tec->th', out.astype(jnp.float32), combine)
        return y.reshape(B, L, H).astype(self.dtype)
