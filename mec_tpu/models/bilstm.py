"""Bi-LSTM text emotion model (the fast non-BERT variant).

Flax reimplementation of the reference Keras architecture
(reference model_training/train_lstm_text_model.py:96-122):

    Embedding(vocab 10000, 128) -> SpatialDropout1D(0.3)
    -> Bidirectional(LSTM(128, return_sequences=True))
    -> Bidirectional(LSTM(64))
    -> Dense(128) ReLU -> Dropout(0.5) -> Dense(64) ReLU -> Dropout(0.3)
    -> Dense(7) softmax

LSTM cells follow Keras semantics exactly (gate order i,f,c̃,o; tanh cell
activation, sigmoid recurrent activation; no masking since the reference
leaves Embedding mask_zero=False) so converted .h5 weights give logit
parity. The recurrence is a `lax.scan` — on TPU it is latency- not
FLOP-bound at 128 steps, and the batch dimension rides the VPU/MXU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class KerasLSTM(nn.Module):
    """Single-direction Keras-semantics LSTM. Input (B, T, D)."""
    units: int
    return_sequences: bool = False
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, D = x.shape
        u = self.units
        kernel = self.param('kernel', nn.initializers.xavier_uniform(),
                            (D, 4 * u), self.dtype)
        recurrent = self.param('recurrent_kernel',
                               nn.initializers.orthogonal(),
                               (u, 4 * u), self.dtype)
        bias = self.param('bias', nn.initializers.zeros, (4 * u,), self.dtype)
        # checkpoints store float32 params; cast to the compute dtype at
        # apply time (the nn.Dense convention) or the scan carry's dtype
        # would not match the step output's promoted dtype in bf16 mode
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        recurrent = recurrent.astype(self.dtype)
        bias = bias.astype(self.dtype)

        if self.reverse:
            x = x[:, ::-1, :]
        # Precompute the input contributions in one big MXU matmul
        zx = x @ kernel + bias          # (B, T, 4u)

        def step(carry, zx_t):
            h, c = carry
            z = zx_t + h @ recurrent
            i = nn.sigmoid(z[:, :u])
            f = nn.sigmoid(z[:, u:2 * u])
            g = jnp.tanh(z[:, 2 * u:3 * u])
            o = nn.sigmoid(z[:, 3 * u:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, u), self.dtype), jnp.zeros((B, u), self.dtype))
        (h_last, _), hs = jax.lax.scan(step, init,
                                       zx.transpose(1, 0, 2))  # (T, B, u)
        if not self.return_sequences:
            return h_last
        hs = hs.transpose(1, 0, 2)      # (B, T, u)
        if self.reverse:
            hs = hs[:, ::-1, :]         # Keras re-aligns backward outputs
        return hs


class BiLSTM(nn.Module):
    """Keras Bidirectional(LSTM(...), merge_mode='concat')."""
    units: int
    return_sequences: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fwd = KerasLSTM(self.units, self.return_sequences, False,
                        self.dtype, name='forward')(x)
        bwd = KerasLSTM(self.units, self.return_sequences, True,
                        self.dtype, name='backward')(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class BiLSTMTextModel(nn.Module):
    vocab_size: int = 10000
    embed_dim: int = 128
    lstm_units: Tuple[int, int] = (128, 64)
    dense_units: Tuple[int, int] = (128, 64)
    num_classes: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, T) int32 -> (probs (B, C), penultimate (B, dense_units[1]))."""
        x = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                     name='embedding')(token_ids)
        # SpatialDropout1D: identity at inference; channel-wise at train
        if train:
            x = nn.Dropout(0.3, broadcast_dims=(1,), deterministic=False)(x)
        x = BiLSTM(self.lstm_units[0], return_sequences=True, dtype=self.dtype,
                   name='bilstm_1')(x)
        x = BiLSTM(self.lstm_units[1], return_sequences=False, dtype=self.dtype,
                   name='bilstm_2')(x)
        x = nn.Dense(self.dense_units[0], dtype=self.dtype, name='dense_1')(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.dense_units[1], dtype=self.dtype, name='dense_2')(x)
        penult = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(penult)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name='output')(x)
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs, penult.astype(jnp.float32)
