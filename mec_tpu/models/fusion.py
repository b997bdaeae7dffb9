"""Attention-based multimodal fusion network.

Flax reimplementation of the PyTorch `MultiModalFusionModel`
(reference inference/multimodal_fusion.py:108-182, duplicated at
reference model_training/train_fusion_model.py:262-362):

  * per-modality projection Dense -> LayerNorm -> ReLU -> Dropout(0.3)
    (speech 64 / text 768 / image 512 -> hidden 256)
  * three cross-modal attention blocks: each modality's projected token
    queries the concat of the other two via 4-head MHA with a residual +
    LayerNorm (reference :68-77, :156-167)
  * softmax attention pooling over the three enhanced streams
    (AttentionFusion, reference :79-106)
  * decision-weight MLP over the concatenated per-modality softmax vectors
    (21 -> 64 -> 3 -> softmax, reference :138-143)
  * classifier on [fused(256) ‖ weighted_preds(7)] -> 256 -> 128 -> 7
    (reference :145-154)

The MHA matches torch.nn.MultiheadAttention numerics (packed in-proj,
1/sqrt(head_dim) scaling, softmax in fp32, out-proj) so converted
checkpoints reproduce reference logits. Attention here runs over 3 modality
tokens — the cost is all in the projections, which are MXU matmuls.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class TorchMultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention(embed_dim, num_heads, batch_first=True)."""
    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, key_value: jnp.ndarray
                 ) -> jnp.ndarray:
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        # packed qkv projection, torch layout: in_proj_weight (3e, e)
        in_proj_w = self.param('in_proj_weight', nn.initializers.xavier_uniform(),
                               (3 * e, e), self.dtype)
        in_proj_b = self.param('in_proj_bias', nn.initializers.zeros,
                               (3 * e,), self.dtype)
        q = query @ in_proj_w[:e].T + in_proj_b[:e]
        k = key_value @ in_proj_w[e:2 * e].T + in_proj_b[e:2 * e]
        v = key_value @ in_proj_w[2 * e:].T + in_proj_b[2 * e:]

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, h, hd).transpose(0, 2, 1, 3)

        scores = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(hd).astype(self.dtype)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Lq, e)
        out = nn.Dense(e, dtype=self.dtype, name='out_proj')(out)
        return out


class CrossModalAttention(nn.Module):
    """MHA + residual + LayerNorm (reference multimodal_fusion.py:68-77)."""
    hidden_dim: int = 256
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, key_value: jnp.ndarray,
                 *, train: bool = False) -> jnp.ndarray:
        attn_out = TorchMultiheadAttention(self.hidden_dim, self.num_heads,
                                           self.dtype, name='attention')(
            query, key_value)
        attn_out = nn.Dropout(0.1, deterministic=not train)(attn_out)
        return nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, name='norm')(
            query + attn_out)


class _Projection(nn.Module):
    """Dense -> LayerNorm -> ReLU -> Dropout(0.3)."""
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name='linear')(x)
        x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, name='norm')(x)
        x = nn.relu(x)
        return nn.Dropout(0.3, deterministic=not train)(x)


class AttentionFusion(nn.Module):
    """Softmax attention pooling over modality streams (reference :79-106)."""
    hidden_dim: int = 256
    num_modalities: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features_list, *, train: bool = False):
        projected = [
            _Projection(self.hidden_dim, self.dtype, name=f'proj_{i}')(
                f, train=train)
            for i, f in enumerate(features_list)
        ]
        concat = jnp.concatenate(projected, axis=-1)
        a = nn.Dense(self.hidden_dim, dtype=self.dtype, name='attn_0')(concat)
        a = jnp.tanh(a)
        a = nn.Dense(self.num_modalities, dtype=self.dtype, name='attn_1')(a)
        weights = nn.softmax(a.astype(jnp.float32), axis=-1)  # (B, M)
        stacked = jnp.stack(projected, axis=1)                # (B, M, H)
        fused = jnp.sum(stacked * weights[..., None].astype(self.dtype), axis=1)
        return fused, weights


class MultiModalFusionModel(nn.Module):
    speech_dim: int = 64
    text_dim: int = 768
    image_dim: int = 512
    num_classes: int = 7
    hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speech_feat, text_feat, image_feat,
                 speech_pred, text_pred, image_pred,
                 *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """All inputs (B, dim). Returns (logits, attention_w, decision_w)."""
        h = self.hidden_dim
        sp = _Projection(h, self.dtype, name='speech_proj')(
            speech_feat, train=train)[:, None, :]
        tp = _Projection(h, self.dtype, name='text_proj')(
            text_feat, train=train)[:, None, :]
        ip = _Projection(h, self.dtype, name='image_proj')(
            image_feat, train=train)[:, None, :]

        s_enh = CrossModalAttention(h, dtype=self.dtype, name='cross_attn_speech')(
            sp, jnp.concatenate([tp, ip], axis=1), train=train)[:, 0]
        t_enh = CrossModalAttention(h, dtype=self.dtype, name='cross_attn_text')(
            tp, jnp.concatenate([sp, ip], axis=1), train=train)[:, 0]
        i_enh = CrossModalAttention(h, dtype=self.dtype, name='cross_attn_image')(
            ip, jnp.concatenate([sp, tp], axis=1), train=train)[:, 0]

        fused, attention_weights = AttentionFusion(
            h, dtype=self.dtype, name='attention_fusion')(
            [s_enh, t_enh, i_enh], train=train)

        all_preds = jnp.concatenate([speech_pred, text_pred, image_pred],
                                    axis=-1).astype(self.dtype)
        d = nn.Dense(64, dtype=self.dtype, name='decision_0')(all_preds)
        d = nn.relu(d)
        d = nn.Dense(3, dtype=self.dtype, name='decision_1')(d)
        decision_weights = nn.softmax(d.astype(jnp.float32), axis=-1)

        stacked_preds = jnp.stack(
            [speech_pred, text_pred, image_pred], axis=1).astype(self.dtype)
        weighted_preds = jnp.sum(
            stacked_preds * decision_weights[..., None].astype(self.dtype),
            axis=1)

        x = jnp.concatenate([fused, weighted_preds], axis=-1)
        x = nn.Dense(h, dtype=self.dtype, name='classifier_0')(x)
        x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, name='classifier_norm')(x)
        x = nn.relu(x)
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = nn.Dense(h // 2, dtype=self.dtype, name='classifier_1')(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name='classifier_2')(x)
        return logits.astype(jnp.float32), attention_weights, decision_weights
