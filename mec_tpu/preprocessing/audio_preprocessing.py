"""Audio preprocessing — public API parity with
reference preprocessing/audio_preprocessing.py, backed by the batched TPU
frontend (mec_tpu.ops.audio_features).

Functions accept either a 1-D waveform (like the reference's
librosa-loaded arrays) or a batch; single inputs return single outputs.
"""

from __future__ import annotations

import numpy as np

from mec_tpu.config import Config
from mec_tpu.ops import audio_features as af
from mec_tpu.ops import wav as _wav


def _fix_length(audio: np.ndarray, sr: int, duration: int) -> np.ndarray:
    target = sr * duration
    audio = np.asarray(audio, dtype=np.float32)
    if len(audio) < target:
        return np.pad(audio, (0, target - len(audio)), mode='constant')
    return audio[:target]


def load_audio(file_path: str, sr: int = Config.SAMPLE_RATE,
               duration: int = Config.AUDIO_DURATION):
    """Load + pad/trim to exactly sr*duration samples -> (audio, sr).

    Parity with reference audio_preprocessing.py:12-19.
    """
    return _wav.load_and_fix_length(file_path, sr=sr, duration=duration)


def _as_batch(audio: np.ndarray) -> np.ndarray:
    audio = _fix_length(audio, Config.SAMPLE_RATE, Config.AUDIO_DURATION)
    return audio[None, :]


def extract_mfcc(audio, sr=Config.SAMPLE_RATE, n_mfcc=Config.N_MFCC
                 ) -> np.ndarray:
    """40 time-averaged MFCCs (reference audio_preprocessing.py:22-24)."""
    P = af.stft_spectrograms(_as_batch(audio))[1]
    return np.asarray(af.mfcc_mean_from_power(P))[0][:n_mfcc]


def extract_chroma(audio, sr=Config.SAMPLE_RATE) -> np.ndarray:
    """12 time-averaged chroma bins (reference audio_preprocessing.py:27-29)."""
    P = af.stft_spectrograms(_as_batch(audio))[1]
    return np.asarray(af.chroma_mean_from_power(P))[0]


def extract_spectral_features(audio, sr=Config.SAMPLE_RATE) -> np.ndarray:
    """[zcr, centroid, rolloff, rms] (reference audio_preprocessing.py:32-37)."""
    return np.asarray(
        af.spectral_features_4(_as_batch(audio)))[0].astype(np.float32)


def preprocess_audio(file_path: str) -> np.ndarray:
    """wav path -> float32[56] (reference audio_preprocessing.py:40-46)."""
    audio, _sr = load_audio(file_path)
    return np.asarray(
        af.audio_features_56_jit(audio[None, :]))[0].astype(np.float32)


def preprocess_audio_batch(file_paths) -> np.ndarray:
    """Batched variant (no reference counterpart): N paths -> (N, 56)."""
    waves = np.stack([load_audio(p)[0] for p in file_paths])
    return np.asarray(af.audio_features_56_jit(waves)).astype(np.float32)
