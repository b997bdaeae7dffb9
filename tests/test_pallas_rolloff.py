"""Parity for the Pallas rolloff crossing search (interpret mode).

The kernel replaces the chunked-cumsum matmul with an 11-probe binary
search per frame (ops/pallas_rolloff.py). Crossing bins agree with the
XLA path except on measure-zero near-ties (different summation order),
so these tests use continuous random/tonal spectra where ties cannot
occur, plus constructed frames that pin the edge semantics (all-zero
frame -> bin 0, single-bin energy, energy at the last bin, row/lane
padding).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mec_tpu.ops import audio_features as af
from mec_tpu.ops.pallas_rolloff import rolloff_bins_pallas


def _xla_bins(mag2d, roll_percent=0.85):
    cum = np.cumsum(np.asarray(mag2d, np.float64), axis=-1)
    thresh = roll_percent * cum[..., -1:]
    return np.argmax(cum >= thresh, axis=-1)


def _mag_batch(B, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(66150) / 22050.0
    waves = np.stack([
        (0.3 * np.sin(2 * np.pi * (150 + 37 * i) * t)
         + 0.1 * np.sin(2 * np.pi * (310 + 71 * i) * t)
         + 0.02 * rng.randn(len(t))).astype(np.float32)
        for i in range(B)])
    mag, _ = af.hop_spectrograms(jnp.asarray(waves))
    return mag


@pytest.mark.parametrize('B', [1, 3])
def test_pallas_rolloff_matches_xla_mean(B):
    """Full-stage parity on real spectrograms: the Pallas mean matches
    the XLA cumsum path to float tolerance (bins agree away from ties;
    a disagreed bin would shift the mean by >= step/T ~ 0.08 Hz)."""
    mag = _mag_batch(B)
    ref = np.asarray(af.spectral_rolloff_mean(mag))
    got = np.asarray(af.spectral_rolloff_mean(mag, use_pallas=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-3)


def test_pallas_rolloff_bins_match_f64_search():
    """Bin-level parity vs an independent float64 cumsum oracle on
    continuous random rows (ties measure-zero), row count NOT a
    multiple of the 256-row grid block."""
    rng = np.random.RandomState(1)
    mag = rng.rand(70, 1025).astype(np.float32) + 1e-3
    got = np.asarray(rolloff_bins_pallas(jnp.asarray(mag)))
    ref = _xla_bins(mag)
    np.testing.assert_array_equal(got, ref)


def test_pallas_rolloff_edge_frames():
    F = 1025
    rows = np.zeros((4, F), np.float32)
    # row 0: all zero -> thresh 0, prefix(0)=0 >= 0 -> bin 0
    rows[1, 0] = 5.0                      # all energy in bin 0
    rows[2, F - 1] = 3.0                  # all energy in the LAST bin
    rows[3, :] = 1.0                      # uniform: ceil(0.85*1025)-1
    got = np.asarray(rolloff_bins_pallas(jnp.asarray(rows)))
    assert got[0] == 0
    assert got[1] == 0
    assert got[2] == F - 1
    assert got[3] == _xla_bins(rows[3:4])[0]


def test_bin_to_freq_is_exact():
    """k * ((SR/2)/1024) must equal fft_frequencies[k] bitwise — the
    claim the serving path's multiply-instead-of-gather rests on."""
    from mec_tpu.ops import filters
    freqs = np.asarray(filters.fft_frequencies(af.SR, af.N_FFT),
                       np.float32)
    k = np.arange(1025, dtype=np.float32)
    step = np.float32(af.SR / 2.0 / 1024.0)
    np.testing.assert_array_equal(k * step, freqs)
