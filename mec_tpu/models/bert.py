"""BERT-base sequence classifier.

Flax reimplementation of HuggingFace `BertForSequenceClassification`
(the reference fine-tunes and serves bert-base-uncased,
reference model_training/train_text_model.py:187-190,
reference inference/text_inference.py:40-43): embeddings (word + position +
token type, LayerNorm eps 1e-12), 12 post-LN encoder layers (12 heads,
intermediate 3072, erf-GeLU), pooler (tanh dense on [CLS]), classifier.

Returns logits and the [CLS] last-hidden-state vector in one pass — the
reference runs BERT twice per fused request
(reference text_inference.py:106-130).

TPU notes: fixed 128-token padding keeps shapes static (one compile);
attention uses additive masking with the dtype's min like HF so converted
checkpoints match to <=1e-4; set dtype=bfloat16 for MXU-rate serving once
parity is established.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _seq_constrain(hidden: jnp.ndarray,
                   seq_spec: Optional[Tuple[str, str]]) -> jnp.ndarray:
    """Megatron-style sequence parallelism: constrain the (B, L, H)
    residual stream to (batch_axis, seq_axis, None).

    Annotated at the LayerNorm/dropout regions between the tensor-parallel
    blocks; GSPMD then materialises the Megatron SP schedule (all-gather of
    the sequence dim before the column-split qkv/FFN matmuls,
    reduce-scatter after the row-split output matmuls) instead of plain
    all-reduce, and the LN/dropout/residual math runs 1/TP-sized.
    Resolves against the ambient mesh (jax.sharding.set_mesh) at trace
    time; no-op when seq_spec is None OR when no mesh naming both axes is
    in context (so model.init and single-device traces work unannotated —
    the trainer enters set_mesh around the sharded fit).
    """
    if seq_spec is None:
        return hidden
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or any(a not in mesh.axis_names for a in seq_spec):
        return hidden
    from jax.sharding import PartitionSpec as P
    batch_axis, seq_axis = seq_spec
    return jax.lax.with_sharding_constraint(
        hidden, P(batch_axis, seq_axis, None))


def _dense(quant: bool, dtype, mode: str = 'dynamic'):
    """nn.Dense, or the int8 QuantDense in bf16 serving mode
    (ops/quant.quantize_bert_params params; per-token dynamic or
    calibrated static activation scales — see models/qconv.py)."""
    if quant:
        from mec_tpu.models.qconv import QuantDense
        return lambda features, name: QuantDense(features, dtype=dtype,
                                                 mode=mode, name=name)
    return lambda features, name: nn.Dense(features, dtype=dtype, name=name)


class BertSelfAttention(nn.Module):
    hidden_size: int = 768
    num_heads: int = 12
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # int8 q/k/v projections (serving only)
    quant_mode: str = 'dynamic'

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, attn_bias: jnp.ndarray
                 ) -> jnp.ndarray:
        B, L, H = hidden.shape
        nh, hd = self.num_heads, self.hidden_size // self.num_heads
        dense = _dense(self.quant, self.dtype, self.quant_mode)
        q = dense(H, 'query')(hidden)
        k = dense(H, 'key')(hidden)
        v = dense(H, 'value')(hidden)
        q = q.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(hd).astype(self.dtype)
        scores = scores + attn_bias[:, None, None, :]
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(B, L, H)
        return ctx


class BertLayer(nn.Module):
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    dtype: jnp.dtype = jnp.float32
    gelu_approximate: bool = False
    seq_spec: Optional[Tuple[str, str]] = None  # (batch_axis, seq_axis)
    num_experts: int = 0            # >0: MoE FFN (models/moe.py)
    moe_capacity_factor: float = 1.25
    ep_axis: Optional[str] = None   # mesh axis for expert parallelism
    # int8 encoder matmuls (serving only; ~97% of the forward's FLOPs,
    # measured 1.8x MXU rate — ops/quant.py). MoE expert banks stay in
    # compute_dtype; only the attention matmuls quantize in MoE layers.
    quant: bool = False
    quant_mode: str = 'dynamic'

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, attn_bias: jnp.ndarray
                 ) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, use_fast_variance=False, dtype=self.dtype, name=name)
        dense = _dense(self.quant, self.dtype, self.quant_mode)
        ctx = BertSelfAttention(self.hidden_size, self.num_heads, self.dtype,
                                quant=self.quant, quant_mode=self.quant_mode,
                                name='attention_self')(hidden, attn_bias)
        ctx = dense(self.hidden_size, 'attention_output')(ctx)
        hidden = _seq_constrain(ln('attention_norm')(hidden + ctx),
                                self.seq_spec)
        if self.num_experts > 0:
            from mec_tpu.models.moe import MoEFFN
            # recover the token mask from the additive bias (0.0 where
            # attended, dtype-min where padded): padding tokens must not
            # route or claim expert capacity, or logits would depend on
            # the padded length and on bucket-mates (serve != eval)
            token_mask = (attn_bias > jnp.asarray(-1.0, attn_bias.dtype))
            out = MoEFFN(self.hidden_size, self.intermediate_size,
                         self.num_experts, self.moe_capacity_factor,
                         self.dtype, self.gelu_approximate, self.ep_axis,
                         name='moe')(hidden, token_mask)
            return _seq_constrain(ln('output_norm')(hidden + out),
                                  self.seq_spec)
        inter = dense(self.intermediate_size, 'intermediate')(hidden)
        # erf-GELU is the HF bert-base activation (parity path). The tanh
        # approximation is bf16-serving-only: its ~1e-3 absolute error sits
        # at the bf16 quantization level, and the 12 erf evaluations over
        # (B*L, 3072) measured 0.44 ms/step slower at batch 64 on the v5e.
        inter = nn.gelu(inter, approximate=self.gelu_approximate)
        out = dense(self.hidden_size, 'output')(inter)
        return _seq_constrain(ln('output_norm')(hidden + out),
                              self.seq_spec)


class BertForSequenceClassification(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    num_classes: int = 7
    dtype: jnp.dtype = jnp.float32
    dropout_rate: float = 0.1  # HF hidden_dropout_prob (train only)
    gelu_approximate: bool = False  # tanh GELU: bf16 serving mode only
    # Megatron sequence parallelism: (batch_axis, seq_axis) mesh-axis
    # names, e.g. ('data', 'model'); the sequence dim shares the tensor-
    # parallel axis. None = no sequence sharding (default).
    seq_spec: Optional[Tuple[str, str]] = None
    # Mixture-of-Experts FFN (models/moe.py): >0 swaps every layer's
    # dense FFN for a top-1-routed expert bank (TPU-scale extension;
    # the reference serves dense bert-base only). ep_axis names the
    # mesh axis experts shard over (expert parallelism).
    num_experts: int = 0
    moe_capacity_factor: float = 1.25
    ep_axis: Optional[str] = None
    # Rematerialization (jax.checkpoint per encoder layer): the backward
    # pass recomputes each layer's activations instead of keeping all
    # num_layers of them live in HBM — activation memory drops from
    # O(num_layers) to O(1) layers (+ the recompute FLOPs, ~33% of a
    # step). The standard lever for long-sequence / large-batch
    # fine-tuning; train-time only in effect (eval has no backward).
    remat: bool = False
    # int8 encoder matmuls (bf16 serving only; ops/quant.py). The
    # embeddings, LayerNorms, attention score/context matmuls, pooler,
    # and classifier stay in compute_dtype. quant_mode: 'dynamic'
    # (per-token scales) or 'static' (calibrated act_scale params).
    quant: bool = False
    quant_mode: str = 'dynamic'

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 token_type_ids: jnp.ndarray | None = None,
                 *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, L) int32 ids/mask -> (logits (B, C), cls_embedding (B, H))."""
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                        name='word_embeddings')(input_ids)
        pos_ids = jnp.arange(L)[None, :]
        pos = nn.Embed(self.max_position, self.hidden_size, dtype=self.dtype,
                       name='position_embeddings')(pos_ids)
        tok = nn.Embed(self.type_vocab_size, self.hidden_size, dtype=self.dtype,
                       name='token_type_embeddings')(token_type_ids)
        hidden = word + pos + tok
        hidden = nn.LayerNorm(epsilon=1e-12, use_fast_variance=False, dtype=self.dtype,
                              name='embeddings_norm')(hidden)
        hidden = nn.Dropout(self.dropout_rate,
                            deterministic=not train)(hidden)
        hidden = _seq_constrain(hidden, self.seq_spec)

        # HF-style additive mask: 0 where attended, dtype-min where padded
        neg = jnp.finfo(self.dtype if self.dtype != jnp.bfloat16
                        else jnp.float32).min
        attn_bias = ((1.0 - attention_mask.astype(jnp.float32)) * neg
                     ).astype(self.dtype)

        # nn.remat preserves the lifted module's param structure, so
        # layer_{i} names (and every converter/TP partition rule keyed
        # on them) are unchanged
        layer_cls = nn.remat(BertLayer) if self.remat else BertLayer
        for i in range(self.num_layers):
            hidden = layer_cls(self.hidden_size, self.num_heads,
                               self.intermediate_size, self.dtype,
                               self.gelu_approximate, self.seq_spec,
                               num_experts=self.num_experts,
                               moe_capacity_factor=self.moe_capacity_factor,
                               ep_axis=self.ep_axis, quant=self.quant,
                               quant_mode=self.quant_mode,
                               name=f'layer_{i}')(hidden, attn_bias)

        cls = hidden[:, 0, :]
        pooled = nn.Dense(self.hidden_size, dtype=self.dtype,
                          name='pooler')(cls)
        pooled = jnp.tanh(pooled)
        pooled = nn.Dropout(self.dropout_rate,
                            deterministic=not train)(pooled)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name='classifier')(pooled)
        return logits.astype(jnp.float32), cls.astype(jnp.float32)
