"""Host audio featurizer parity: JAX frontend <-> numpy mirror <-> C++.

Serving (bf16) mode can featurize audio on the host and ship 224 B of
features per clip instead of the ~99 KB packed waveform
(mec_tpu/ops/host_features.py, mec_tpu/native/audiofeat.cpp). These
tests pin all three implementations of the 56-dim frontend
(reference preprocessing/audio_preprocessing.py:40-46 semantics) against
each other on tonal, noisy, and degenerate clips. The fp32 logit-parity
contract stays on the traced frontend (tests/test_audio_frontend.py);
the host paths must agree within the error budget the 12-bit PCM wire
already established (~5e-3 on MFCC dB-units, serving/wire.py).
"""

import numpy as np
import pytest

from mec_tpu.config import Config
from mec_tpu.ops import audio_features as af
from mec_tpu.ops import host_features as hf

N = Config.AUDIO_SAMPLES


def _clips():
    rng = np.random.RandomState(0)
    t = np.arange(N) / Config.SAMPLE_RATE
    clips = [
        0.1 * np.sin(2 * np.pi * 330 * t),                      # pure tone
        0.05 * np.sin(2 * np.pi * 261.63 * t)
        + 0.02 * np.sin(2 * np.pi * 523.25 * t),                # C chord
        rng.randn(N) * 0.05,                                    # noise
        np.zeros(N),                                            # silence
        rng.randn(N) * 0.02 + 0.05 * np.sin(2 * np.pi * 440 * t),
        np.clip(rng.randn(N) * 0.4, -1, 1),                     # clipped
    ]
    return np.stack(clips).astype(np.float32)


@pytest.fixture(scope='module')
def clips():
    return _clips()


@pytest.fixture(scope='module')
def jax_feats(clips):
    return np.asarray(af.audio_features_56_jit(clips))


@pytest.fixture(scope='module')
def np_feats(clips):
    return hf.features_56_np(clips)


class TestNumpyMirror:
    def test_matches_traced_frontend(self, jax_feats, np_feats):
        d = np.abs(jax_feats - np_feats)
        # MFCCs are on a dB scale (values span ~[-600, 100]); chroma in
        # [0, 1]; spectral scalars include Hz-scale centroid/rolloff.
        assert d[:, :40].max() < 2e-2, 'mfcc'
        assert d[:, 40:52].max() < 1e-3, 'chroma'
        rel = d[:, 52:] / (np.abs(jax_feats[:, 52:]) + 1.0)
        assert rel.max() < 1e-3, 'spectral'

    def test_single_clip_equals_batch_row(self, clips, np_feats):
        one = hf.features_56_np(clips[1])
        np.testing.assert_allclose(one[0], np_feats[1], atol=1e-6)

    def test_feature_layout(self, np_feats):
        # 40 mfcc + 12 chroma + [zcr, centroid, rolloff, rms]
        assert np_feats.shape[1] == 56
        assert (np_feats[:, 40:52] >= -1e-6).all()  # chroma normalized
        assert (np_feats[:, 40:52] <= 1.0 + 1e-6).all()
        silence = np_feats[3]
        assert silence[52] == 0.0 and silence[55] == 0.0  # zcr, rms


class TestNativeFeaturizer:
    def test_matches_numpy_reference(self, clips, np_feats):
        from mec_tpu.native import featurizer
        if not featurizer.have_native():
            pytest.skip('no compiler available')
        nat = featurizer.extract56(clips)
        d = np.abs(nat - np_feats)
        assert d[:, :40].max() < 1e-2, 'mfcc'
        assert d[:, 40:52].max() < 1e-3, 'chroma'
        rel = d[:, 52:] / (np.abs(np_feats[:, 52:]) + 1.0)
        assert rel.max() < 1e-3, 'spectral'

    def test_single_clip_calls(self, clips):
        from mec_tpu.native import featurizer
        if not featurizer.have_native():
            pytest.skip('no compiler available')
        batch = featurizer.extract56(clips[:3])
        for i in range(3):
            one = featurizer.extract56(clips[i])
            np.testing.assert_array_equal(one[0], batch[i])
