"""ctypes wrapper for the native 56-dim audio featurizer (audiofeat.cpp).

Serving (bf16) mode featurizes audio on the host so the device link
carries 224 B of features per clip instead of the ~99 KB packed-PCM
waveform (see mec_tpu/ops/host_features.py for the measured rationale).
The constant operators are computed by mec_tpu.ops.filters — the same
code the traced device frontend bakes into its graph — and installed
into the library once per process.

Falls back to the numpy reference (mec_tpu.ops.host_features) when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import functools
import threading
from typing import Optional

import numpy as np

from mec_tpu.config import Config
from mec_tpu.ops import filters

_F32P = ctypes.POINTER(ctypes.c_float)
_init_lock = threading.Lock()


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    from mec_tpu.native.build import load_library
    lib = load_library('audiofeat')
    if lib is None:
        return None
    lib.audiofeat_init.restype = ctypes.c_int
    lib.audiofeat_init.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
        _F32P, _F32P, _F32P, _F32P, _F32P,
        ctypes.c_float, ctypes.c_float]
    lib.audiofeat_extract.argtypes = [_F32P, ctypes.c_int, _F32P]

    with _init_lock:
        hann = np.ascontiguousarray(filters.hann_window(Config.N_FFT))
        mel = np.ascontiguousarray(filters.mel_filterbank(
            Config.SAMPLE_RATE, Config.N_FFT, Config.N_MELS))
        dct = np.ascontiguousarray(filters.dct_matrix(
            Config.N_MFCC, Config.N_MELS))
        freqs = np.ascontiguousarray(filters.fft_frequencies(
            Config.SAMPLE_RATE, Config.N_FFT).astype(np.float32))
        base = np.ascontiguousarray(filters.chroma_base_bins(
            Config.SAMPLE_RATE, Config.N_FFT).astype(np.float32))
        rc = lib.audiofeat_init(
            Config.N_FFT, Config.HOP_LENGTH, Config.AUDIO_SAMPLES,
            Config.N_MELS, Config.N_MFCC,
            ctypes.c_float(float(Config.SAMPLE_RATE)),
            hann.ctypes.data_as(_F32P), mel.ctypes.data_as(_F32P),
            dct.ctypes.data_as(_F32P), freqs.ctypes.data_as(_F32P),
            base.ctypes.data_as(_F32P),
            ctypes.c_float(150.0), ctypes.c_float(4000.0))
        if rc != 0:
            return None
    return lib


def have_native() -> bool:
    return _lib() is not None


def extract56(waves: np.ndarray) -> np.ndarray:
    """(N,) or (B, N) float32 waveforms -> (B, 56) float32 features.

    Native single-pass path when a compiler is available (internally
    threaded across clips), numpy reference otherwise.
    """
    waves = np.asarray(waves, np.float32)
    if waves.ndim == 1:
        waves = waves[None, :]
    lib = _lib()
    # The native tables are built for Config.AUDIO_SAMPLES-length clips;
    # any other length must take the (length-generic) numpy path or the
    # C loop would stride past the buffer.
    if lib is None or waves.shape[1] != Config.AUDIO_SAMPLES:
        from mec_tpu.ops import host_features
        return host_features.features_56_np(waves)
    waves = np.ascontiguousarray(waves)
    out = np.empty((waves.shape[0], 56), np.float32)
    lib.audiofeat_extract(waves.ctypes.data_as(_F32P), waves.shape[0],
                          out.ctypes.data_as(_F32P))
    return out
