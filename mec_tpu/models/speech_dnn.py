"""Speech emotion DNN.

Reproduces the reference Keras architecture
(reference model_training/train_speech_model.py:53-103): five blocks of
Dense -> BatchNorm -> ReLU -> Dropout with widths 512/512/256/128/64 and
dropout 0.4/0.4/0.3/0.2/0.1, then Dense(7) softmax. Keras BatchNorm
defaults (momentum 0.99, eps 1e-3) are preserved so converted running
statistics match.

The forward returns both the class probabilities and the 64-dim
penultimate activation (post-ReLU of block 5 == Keras `layers[-3].output`,
reference inference/speech_inference.py:93-97), so fusion feature
extraction costs no second forward pass — the reference runs the model
twice and rebuilds a truncated Keras graph per call.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class SpeechDNN(nn.Module):
    num_classes: int = 7
    widths: Sequence[int] = (512, 512, 256, 128, 64)
    dropout_rates: Sequence[float] = (0.4, 0.4, 0.3, 0.2, 0.1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, 56) standardized features -> (probs (B, 7), penult (B, 64))."""
        x = x.astype(self.dtype)
        for i, (w, rate) in enumerate(zip(self.widths, self.dropout_rates)):
            x = nn.Dense(w, dtype=self.dtype, name=f'dense_{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f'bn_{i}')(x)
            x = nn.relu(x)
            x = nn.Dropout(rate, deterministic=not train,
                           name=f'dropout_{i}')(x)
        penultimate = x
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name='dense_out')(x)
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs, penultimate.astype(jnp.float32)
