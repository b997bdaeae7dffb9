"""Perf-mode (bfloat16 + compressed wire) vs parity-mode (float32)
consistency.

The serving perf path trades exact logit parity for MXU rate; this pins
the contract: on confidently-classified inputs the predicted emotion must
not change, and probabilities stay close in absolute terms.
"""

import numpy as np
import pytest

from mec_tpu.config import Config


@pytest.fixture()
def trained_dir(tmp_path):
    from mec_tpu.training import train_speech
    rng = np.random.RandomState(0)
    X = rng.randn(140, 56).astype(np.float32)
    y = (np.arange(140) % 7).astype(np.int32)
    X[np.arange(140), y] += 4.0  # separable -> confident model
    d = str(tmp_path / 'models')
    train_speech.train(X=X, y=y, epochs=6, batch_size=32, models_dir=d,
                       verbose=False)
    return d


def _engine(models_dir, dtype):
    from mec_tpu.serving import engine as eng
    old = Config.COMPUTE_DTYPE
    Config.COMPUTE_DTYPE = dtype
    try:
        return eng.EmotionEngine(models_dir=models_dir)
    finally:
        Config.COMPUTE_DTYPE = old


def test_bf16_speech_decisions_match_fp32(trained_dir):
    from mec_tpu.ops import wav
    import os
    rng = np.random.RandomState(1)
    paths = []
    for i in range(4):
        p = os.path.join(trained_dir, f'w{i}.wav')
        wav.write_wav(p, (rng.randn(66150) * 0.2).astype(np.float32), 22050)
        paths.append(p)

    fp32 = _engine(trained_dir, 'float32')
    bf16 = _engine(trained_dir, 'bfloat16')
    r32 = fp32.predict_speech_paths(paths)
    r16 = bf16.predict_speech_paths(paths)
    for a, b in zip(r32, r16):
        pa = np.asarray(a['all_probabilities'])
        pb = np.asarray(b['all_probabilities'])
        # decisions agree wherever fp32 is confident
        if a['confidence'] > 0.6:
            assert a['emotion'] == b['emotion']
        np.testing.assert_allclose(pa, pb, atol=0.05)
