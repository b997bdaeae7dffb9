"""Pallas kernel numerics vs the XLA reference path.

On the CPU test mesh the kernels run in Pallas interpret mode (Mosaic
requires a TPU); the same assertions were validated on the real chip
(max err ~4e-6). Covers the three speech hot-path kernels from
mec_tpu.ops.pallas_kernels plus the BatchNorm folding math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mec_tpu.models.speech_dnn import SpeechDNN
from mec_tpu.ops import audio_features as af
from mec_tpu.ops import filters
from mec_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope='module')
def waves():
    rng = np.random.RandomState(0)
    return (rng.randn(3, af.N_SAMPLES) * 0.1).astype(np.float32)


@pytest.fixture(scope='module')
def spectrograms(waves):
    return af.stft_spectrograms(jnp.asarray(waves))


def test_dft_spectrogram_matches_fft(waves, spectrograms):
    mag_ref, P_ref = spectrograms
    win = jnp.asarray(filters.hann_window(af.N_FFT))
    frames = af.frame_signal(jnp.asarray(waves), 'constant') * win
    mag_pl, P_pl = pk.dft_spectrograms(frames)
    assert mag_pl.shape == mag_ref.shape
    np.testing.assert_allclose(np.asarray(mag_pl), np.asarray(mag_ref),
                               atol=5e-5)
    rel = np.abs(np.asarray(P_pl - P_ref)) / (np.asarray(P_ref) + 1e-6)
    assert rel.max() < 5e-3


def test_mfcc_kernel_matches_xla(spectrograms):
    _mag, P = spectrograms
    ref = af.mfcc_mean_from_power(P)
    out = pk.mfcc_mean_pallas(P)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_tuning_quiet_clip():
    # all-zero spectrogram -> no pitch candidates -> tuning 0.0
    P = jnp.zeros((1, af.N_FRAMES, af.N_BINS), jnp.float32)
    assert float(af.estimate_tuning_from_power(P)[0]) == 0.0


def test_full_frontend_pallas_path(waves):
    ref = af.audio_features_56(jnp.asarray(waves))
    out = af.audio_features_56(jnp.asarray(waves), use_pallas=True)
    # MFCC block from the kernels, chroma/scalars shared with XLA path
    np.testing.assert_allclose(np.asarray(out[:, :40]),
                               np.asarray(ref[:, :40]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[:, 40:]),
                               np.asarray(ref[:, 40:]), rtol=1e-4)


def test_batchnorm_folding_exact():
    model = SpeechDNN(widths=(32, 16), dropout_rates=(0.0, 0.0))
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 56), jnp.float32))
    # give BN non-trivial statistics
    variables = jax.tree.map(lambda x: x, variables)
    stats = {
        k: {'mean': jnp.asarray(np.random.RandomState(2).randn(
            v['mean'].shape[0]).astype(np.float32) * 0.1),
            'var': jnp.asarray(np.abs(np.random.RandomState(3).randn(
                v['var'].shape[0]).astype(np.float32)) + 0.5)}
        for k, v in variables['batch_stats'].items()
    }
    variables = {'params': variables['params'], 'batch_stats': stats}
    x = jnp.asarray(np.random.RandomState(4).randn(5, 56), jnp.float32)
    probs_ref, pen_ref = model.apply(variables, x)
    fwd = pk.make_speech_dnn_pallas(variables)
    packed = fwd(x)
    np.testing.assert_allclose(np.asarray(packed[:, :7]),
                               np.asarray(probs_ref), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(packed[:, 7:7 + fwd.penult_dim]),
        np.asarray(pen_ref), atol=2e-5)


def test_speech_dnn_kernel_full_size():
    model = SpeechDNN()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 56), jnp.float32))
    x = jnp.asarray(np.random.RandomState(5).randn(9, 56), jnp.float32)
    probs_ref, pen_ref = model.apply(variables, x)
    fwd = pk.make_speech_dnn_pallas(variables)
    packed = fwd(x)
    assert packed.shape == (9, 128)
    np.testing.assert_allclose(np.asarray(packed[:, :7]),
                               np.asarray(probs_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(packed[:, 7:71]),
                               np.asarray(pen_ref), atol=2e-5)
    assert np.allclose(np.asarray(packed[:, :7]).sum(axis=1), 1.0,
                       atol=1e-5)
