"""Wire codecs for the host->device link (serving perf mode).

End-to-end serving throughput is host-upload-bandwidth-bound: a tri-modal
prediction ships ~280 KB of arrays to the chip (PCM16 audio 129 KB +
uint8 RGB image 147 KB), and both the axon tunnel (~75 MB/s) and a
locally-attached chip's PCIe link meter that. These codecs shrink the
bytes with on-device expansion (a handful of fused elementwise ops on
data the compute graph was about to read anyway):

  * audio: 12-bit linear PCM with a per-clip scale, two samples packed
    into three bytes — 97 KB/clip (75% of PCM16). Measured transparent
    to the 56-dim frontend: max MFCC delta 0.005 dB-units on pure tones,
    same as PCM16 itself. 8-bit codecs (mu-law or linear) are NOT usable
    here even though they'd halve the bytes again: their quantization
    noise floor (-38/-48 dB) sits above power_to_db's top_db=-80 dB
    clamp, so on tonal/quiet clips the off-peak spectrogram bins jump
    off the floor and log-scale MFCCs move by >40 dB-units (measured:
    mu-law max MFCC delta 151.3 on a 330 Hz tone vs 0.005 for 12-bit).
  * image: YUV 4:2:0 (JPEG's BT.601 full-range matrix + 2x2 chroma
    subsampling) — 1.5 B/px = 74 KB/image, half of raw RGB. Chroma
    subsampling is what the JPEG sources already went through once.

Parity mode (float32) ships raw float32/uint8 and bypasses this module;
the reference has no equivalent (it serves from the same host the model
runs on — reference inference/multimodal_fusion.py keeps everything in
process RAM).

Encoders run on the host, once per request batch — through the C++
single-pass loops in mec_tpu/native/wirecodec.cpp when a compiler is
available (numpy spends ~158 ms/32-batch on float32 temporaries; the
native path is ~20x cheaper), with the numpy implementations below as
the reference/fallback. Decoders are traced into the serving jits
(jax.numpy) and fuse into the frontend's first pass over the data.
"""

from __future__ import annotations

import ctypes
import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

# BT.601 full-range (JFIF) RGB<->YCbCr, the matrix JPEG decoders use.
_KR, _KG, _KB = 0.299, 0.587, 0.114

_Q12 = 2047.0   # 12-bit symmetric quantizer: codes in [-2047, 2047]


@functools.lru_cache(maxsize=1)
def _native() -> Optional[ctypes.CDLL]:
    from mec_tpu.native.build import load_library
    lib = load_library('wirecodec')
    if lib is None:
        return None
    lib.pcm12_encode.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)]
    lib.yuv420_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8)]
    return lib


# ----------------------------------------------------------------------
# audio: packed 12-bit linear PCM, per-clip scale
# ----------------------------------------------------------------------

def encode_pcm12(waves: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(B, N) float32 -> (packed (B, 3N/2) uint8, scale (B, 1) float32).

    N must be even (serving clips are 66150 samples,
    Config.AUDIO_SAMPLES). Codes are offset-binary 12-bit; sample pairs
    (u0, u1) pack as [u0 >> 4, (u0 & 15) << 4 | u1 >> 8, u1 & 255].
    """
    b, n = waves.shape
    lib = _native()
    if lib is not None:
        waves = np.ascontiguousarray(waves, np.float32)
        packed = np.empty((b, 3 * n // 2), np.uint8)
        scale = np.empty((b, 1), np.float32)
        lib.pcm12_encode(
            waves.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b, n,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return packed, scale
    return encode_pcm12_np(waves)


def encode_pcm12_np(waves: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-numpy reference implementation of encode_pcm12 (the native
    path is pinned against it in tests/test_wire.py)."""
    b, n = waves.shape
    scale = np.maximum(np.abs(waves).max(axis=1, keepdims=True),
                       1e-6).astype(np.float32)
    q = np.rint(waves / scale * _Q12).astype(np.int32)      # [-2047, 2047]
    u = (np.clip(q, -_Q12, _Q12) + 2048).astype(np.uint16)  # 12-bit codes
    u = u.reshape(b, n // 2, 2)
    u0, u1 = u[..., 0].astype(np.uint32), u[..., 1].astype(np.uint32)
    packed = np.stack([u0 >> 4,
                       ((u0 & 15) << 4) | (u1 >> 8),
                       u1 & 255], axis=-1).astype(np.uint8)
    return packed.reshape(b, 3 * n // 2), scale


def decode_pcm12(packed: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Inverse of encode_pcm12 -> (B, N) float32. Traceable: integer
    shifts + a reshape interleave, no gathers."""
    b, m = packed.shape
    p = packed.reshape(b, m // 3, 3).astype(jnp.int32)
    b0, b1, b2 = p[..., 0], p[..., 1], p[..., 2]
    u0 = (b0 << 4) | (b1 >> 4)
    u1 = ((b1 & 15) << 8) | b2
    u = jnp.stack([u0, u1], axis=-1).reshape(b, 2 * (m // 3))
    return (u - 2048).astype(jnp.float32) * (scale / _Q12)


# ----------------------------------------------------------------------
# image: YUV 4:2:0
# ----------------------------------------------------------------------

def encode_yuv420(imgs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(B, H, W, 3) uint8 RGB -> (Y (B, H, W), UV (B, H/2, W/2, 2)) uint8.

    H and W must be even (serving images are 224x224,
    Config.IMAGE_SIZE).
    """
    b, h, w, _ = imgs.shape
    lib = _native()
    if lib is not None:
        imgs = np.ascontiguousarray(imgs, np.uint8)
        y8 = np.empty((b, h, w), np.uint8)
        uv8 = np.empty((b, h // 2, w // 2, 2), np.uint8)
        lib.yuv420_encode(
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), b, h, w,
            y8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            uv8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return y8, uv8
    return encode_yuv420_np(imgs)


def encode_yuv420_np(imgs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-numpy reference implementation of encode_yuv420 (the native
    path is pinned against it in tests/test_wire.py)."""
    b, h, w, _ = imgs.shape
    rgb = imgs.astype(np.float32)
    r, g, bl = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = _KR * r + _KG * g + _KB * bl
    u = (bl - y) * (0.5 / (1.0 - _KB)) + 128.0
    v = (r - y) * (0.5 / (1.0 - _KR)) + 128.0
    uv = np.stack([u, v], axis=-1)
    uv = uv.reshape(b, h // 2, 2, w // 2, 2, 2).mean(axis=(2, 4))
    return (np.clip(np.rint(y), 0, 255).astype(np.uint8),
            np.clip(np.rint(uv), 0, 255).astype(np.uint8))


def decode_yuv420(y8: jnp.ndarray, uv8: jnp.ndarray) -> jnp.ndarray:
    """(Y, UV) uint8 -> (B, H, W, 3) float32 RGB in [0, 255]. Traceable.

    Nearest-neighbor chroma upsampling: broadcast+reshape only (TPU
    gathers are slow; a 2x2 repeat lowers to free layout ops).
    """
    y = y8.astype(jnp.float32)
    uv = uv8.astype(jnp.float32) - 128.0
    b, hh, hw, _ = uv.shape
    uv = jnp.broadcast_to(uv[:, :, None, :, None, :],
                          (b, hh, 2, hw, 2, 2)).reshape(b, 2 * hh, 2 * hw, 2)
    u, v = uv[..., 0], uv[..., 1]
    r = y + (2.0 * (1.0 - _KR)) * v
    g = y - (2.0 * _KB * (1.0 - _KB) / _KG) * u \
          - (2.0 * _KR * (1.0 - _KR) / _KG) * v
    bl = y + (2.0 * (1.0 - _KB)) * u
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0)
