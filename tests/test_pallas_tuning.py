"""Parity for the batched Pallas tuning selection (interpret mode).

On the real TPU the kernel is bit-exact vs the XLA path on real
spectrogram batches and 1.40x faster at b64 / 3.0x at b1
(examples/ab_pallas_tuning.py, 2026-08-21). These tests pin the same
equality on the CPU interpreter, including the tie/edge semantics the
histogram differencing depends on.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mec_tpu.ops import audio_features as af


def _power_batch(B, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(66150) / 22050.0
    waves = np.stack([
        (0.3 * np.sin(2 * np.pi * (150 + 37 * i) * t)
         + 0.1 * np.sin(2 * np.pi * (310 + 71 * i) * t)
         + 0.02 * rng.randn(len(t))).astype(np.float32)
        for i in range(B)])
    _, P = af.hop_spectrograms(jnp.asarray(waves))
    return P


@pytest.mark.parametrize('B', [1, 4])
def test_pallas_tuning_matches_xla(B):
    P = _power_batch(B)
    ref = np.asarray(af.estimate_tuning_from_power(P, use_pallas=False))
    got = np.asarray(af.estimate_tuning_from_power(P, use_pallas=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_tuning_silence_and_ties():
    """All-zero clips take the no-candidate path (tuning 0.0); constant
    tones exercise exact histogram ties -> first-argmax semantics."""
    t = np.arange(66150) / 22050.0
    waves = np.stack([
        np.zeros_like(t, dtype=np.float32),
        (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32),
    ])
    _, P = af.hop_spectrograms(jnp.asarray(waves))
    ref = np.asarray(af.estimate_tuning_from_power(P, use_pallas=False))
    got = np.asarray(af.estimate_tuning_from_power(P, use_pallas=True))
    np.testing.assert_array_equal(got, ref)
    assert got[0] == 0.0
