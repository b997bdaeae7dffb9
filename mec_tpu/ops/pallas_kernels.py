"""Pallas TPU kernels for the speech hot path.

Three kernels cover the BASELINE north star ("replace the librosa-based
audio preprocessing with Pallas FFT/mel-filterbank kernels fused directly
into the 5-block speech DNN forward pass"):

  1. dft_power_kernel  — framed+windowed signal -> power & magnitude
     spectrograms. The DFT is expressed as two matmuls against cos/sin
     bases (K=2048 contraction): at this size a matmul DFT rides the MXU
     at full rate, whereas XLA's generic FFT lowering does not (the
     GEMM-native NDFT audio-frontend formulation, cf. MelT,
     arxiv 2606.01009).
  2. mfcc_kernel       — power spectrogram -> time-averaged MFCCs: mel
     projection, per-clip dB conversion (max over the whole spectrogram),
     orthonormal DCT-II, and the time mean — one VMEM-resident pass per
     clip instead of four HBM round trips.
  3. speech_dnn_kernel — the full 5-block DNN forward (BatchNorm folded
     into the Dense weights at load time) with softmax, all six layers'
     weights pinned in VMEM (~2 MB): one kernel launch instead of ~20
     XLA ops for a latency-critical 56->7 MLP.

All kernels are numerically-checked against the XLA reference path in
tests/test_pallas.py (interpret mode on CPU; real Mosaic on TPU). The XLA
path remains the float32 logit-parity path (<=1e-4 vs librosa); Pallas is
the serving perf path, enabled by Config.USE_PALLAS on TPU backends.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mec_tpu.config import Config
from mec_tpu.ops import filters

N_FFT = Config.N_FFT        # 2048
HOP = Config.HOP_LENGTH     # 512
N_BINS = 1 + N_FFT // 2     # 1025
N_FRAMES = 1 + Config.AUDIO_SAMPLES // HOP  # 130
N_MELS = Config.N_MELS      # 128
N_MFCC = Config.N_MFCC      # 40

_HIGH = jax.lax.Precision.HIGHEST

# MXU-friendly padded sizes
_NBINS_PAD = 1152           # 1025 -> 9 x 128 lanes
_FRAMES_PAD = 136           # 130 -> 17 x 8 sublanes


def on_tpu() -> bool:
    return jax.default_backend() == 'tpu'


def _interpret() -> bool:
    # Mosaic only exists on TPU; everywhere else run the interpreter so
    # the kernels stay testable on the CPU mesh.
    return not on_tpu()


# ----------------------------------------------------------------------
# 1. DFT power/magnitude spectrogram
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _dft_bases() -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin DFT bases, (N_FFT, _NBINS_PAD) float32, zero-padded bins."""
    n = np.arange(N_FFT)[:, None]
    k = np.arange(N_BINS)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    cos = np.zeros((N_FFT, _NBINS_PAD), np.float32)
    sin = np.zeros((N_FFT, _NBINS_PAD), np.float32)
    cos[:, :N_BINS] = np.cos(ang)
    sin[:, :N_BINS] = -np.sin(ang)
    return cos, sin


def _make_dft_power_kernel(precision):
    def _dft_power_kernel(frames_ref, cos_ref, sin_ref, pow_ref, mag_ref):
        a = frames_ref[:]                   # (TILE_M, N_FFT)
        re = jnp.dot(a, cos_ref[:], precision=precision,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(a, sin_ref[:], precision=precision,
                     preferred_element_type=jnp.float32)
        p = re * re + im * im
        pow_ref[:] = p
        mag_ref[:] = jnp.sqrt(p)
    return _dft_power_kernel


_dft_power_kernel = _make_dft_power_kernel(_HIGH)


def dft_spectrograms(frames: jnp.ndarray, precision: str = 'highest'
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, N_FFT) framed+windowed float32 -> (mag, power), (B, T, N_BINS).

    Drop-in replacement for the rFFT in
    mec_tpu.ops.audio_features.stft_spectrograms.

    precision: 'highest' = full fp32 MXU emulation (parity-grade);
    'high' = 3-pass bf16 split (~fp24 products, broadband error floor
    well below librosa's top_db=-80 dB clamp); 'bf16' = one MXU pass
    with bf16 operands — fastest, but its ~-64 dB error floor is ABOVE
    the -80 dB clamp, which measurably shifts dB-scale features of
    spectrally sparse clips (chirp centroid +45% — measured 2026-08-17),
    so it is NOT the serving default.
    """
    B, T, _ = frames.shape
    if precision == 'high':
        # Mosaic cannot lower Precision.HIGH; XLA can — and the DFT
        # matmul needs no hand-tiling to saturate the MXU, so the
        # 'high' path is a plain dot.
        cos, sin = (jnp.asarray(x[:, :N_BINS]) for x in _dft_bases())
        flat = frames.reshape(B * T, N_FFT)
        re = jnp.dot(flat, cos, precision=jax.lax.Precision.HIGH,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(flat, sin, precision=jax.lax.Precision.HIGH,
                     preferred_element_type=jnp.float32)
        p = (re * re + im * im).reshape(B, T, N_BINS)
        return jnp.sqrt(p), p
    M = B * T
    TILE_M = 128
    m_pad = -M % TILE_M
    flat = frames.reshape(M, N_FFT)
    if m_pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((m_pad, N_FFT), flat.dtype)], axis=0)
    cos, sin = (jnp.asarray(x) for x in _dft_bases())
    if precision == 'bf16':
        flat = flat.astype(jnp.bfloat16)
        cos = cos.astype(jnp.bfloat16)
        sin = sin.astype(jnp.bfloat16)
    kernel = _make_dft_power_kernel(
        {'highest': jax.lax.Precision.HIGHEST,
         'bf16': jax.lax.Precision.DEFAULT}[precision])

    grid = ((M + m_pad) // TILE_M, _NBINS_PAD // 128)
    out_shape = [
        jax.ShapeDtypeStruct((M + m_pad, _NBINS_PAD), jnp.float32),
        jax.ShapeDtypeStruct((M + m_pad, _NBINS_PAD), jnp.float32),
    ]
    p, mag = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_M, N_FFT), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, 128), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, 128), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * (M + m_pad) * N_FFT * _NBINS_PAD,
            bytes_accessed=(M + m_pad) * (N_FFT + 2 * _NBINS_PAD) * 4,
            transcendentals=(M + m_pad) * _NBINS_PAD),
        interpret=_interpret(),
    )(flat, cos, sin)
    mag = mag[:M, :N_BINS].reshape(B, T, N_BINS)
    p = p[:M, :N_BINS].reshape(B, T, N_BINS)
    return mag, p


# ----------------------------------------------------------------------
# 2. fused mel -> dB -> DCT -> time-mean (MFCC)
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _mel_dct_mats() -> Tuple[np.ndarray, np.ndarray]:
    mel = filters.mel_filterbank(Config.SAMPLE_RATE, N_FFT, N_MELS)        # (M, F)
    melT = np.zeros((_NBINS_PAD, N_MELS), np.float32)
    melT[:N_BINS] = np.asarray(mel, np.float32).T
    dctT = np.zeros((N_MELS, 128), np.float32)
    dctT[:, :N_MFCC] = np.asarray(
        filters.dct_matrix(N_MFCC, N_MELS), np.float32).T     # (M, C)
    return melT, dctT


def _mfcc_kernel(p_ref, melT_ref, dctT_ref, out_ref):
    # one grid cell per clip: p_ref (1, FRAMES_PAD, NBINS_PAD)
    p = p_ref[0]
    melspec = jnp.dot(p, melT_ref[:], precision=_HIGH,
                      preferred_element_type=jnp.float32)  # (T_PAD, M)
    # librosa.power_to_db(ref=1, amin=1e-10, top_db=80); the max runs over
    # the clip's REAL frames only (padded rows would otherwise win).
    row = jax.lax.broadcasted_iota(jnp.int32, melspec.shape, 0)
    valid = row < N_FRAMES
    db = 10.0 * jnp.log10(jnp.maximum(melspec, 1e-10))
    clip_max = jnp.max(jnp.where(valid, db, -jnp.inf))
    db = jnp.maximum(db, clip_max - 80.0)
    mfcc = jnp.dot(db, dctT_ref[:], precision=_HIGH,
                   preferred_element_type=jnp.float32)     # (T_PAD, 128)
    mean = jnp.sum(jnp.where(valid, mfcc, 0.0), axis=0,
                   keepdims=True) / N_FRAMES
    out_ref[0] = mean


def mfcc_mean_pallas(P: jnp.ndarray) -> jnp.ndarray:
    """(B, N_FRAMES, N_BINS) power spectrogram -> (B, N_MFCC) mean MFCCs.

    The kernel's validity mask and mean divisor are the module constant
    N_FRAMES (the fixed 3 s serving clip); other frame counts would be
    silently mis-averaged, so they are rejected here.
    """
    B, T, F = P.shape
    if T != N_FRAMES:
        raise ValueError(f'mfcc_mean_pallas requires T == {N_FRAMES} '
                         f'(the fixed serving clip), got {T}')
    pad_t = _FRAMES_PAD - T
    pad_f = _NBINS_PAD - F
    P = jnp.pad(P, ((0, 0), (0, pad_t), (0, pad_f)))
    melT, dctT = (jnp.asarray(x) for x in _mel_dct_mats())
    out = pl.pallas_call(
        _mfcc_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, _FRAMES_PAD, _NBINS_PAD),
                         lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_NBINS_PAD, N_MELS), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_MELS, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
        interpret=_interpret(),
    )(P, melT, dctT)
    return out[:, 0, :N_MFCC]


# ----------------------------------------------------------------------
# 3. fully-fused speech DNN forward (inference, BN folded)
# ----------------------------------------------------------------------

def fold_batchnorm(variables: Dict) -> Dict[str, np.ndarray]:
    """Fold inference-mode BatchNorm into the Dense kernels/biases.

    y = gamma * (xW + b - mean) / sqrt(var + eps) + beta
      = x (W * gamma/sqrt(var+eps)) + ((b - mean) * gamma/sqrt(var+eps) + beta)

    Keras BatchNorm eps = 1e-3 (mec_tpu.models.speech_dnn.SpeechDNN).
    """
    params = variables['params']
    stats = variables.get('batch_stats', {})
    folded = {}
    i = 0
    while f'dense_{i}' in params:
        W = np.asarray(params[f'dense_{i}']['kernel'], np.float32)
        b = np.asarray(params[f'dense_{i}']['bias'], np.float32)
        bn_p = params[f'bn_{i}']
        bn_s = stats[f'bn_{i}']
        gamma = np.asarray(bn_p['scale'], np.float32)
        beta = np.asarray(bn_p['bias'], np.float32)
        mean = np.asarray(bn_s['mean'], np.float32)
        var = np.asarray(bn_s['var'], np.float32)
        inv = gamma / np.sqrt(var + 1e-3)
        folded[f'W{i}'] = W * inv[None, :]
        folded[f'b{i}'] = (b - mean) * inv + beta
        i += 1
    folded['n_blocks'] = i
    folded['Wout'] = np.asarray(params['dense_out']['kernel'], np.float32)
    folded['bout'] = np.asarray(params['dense_out']['bias'], np.float32)
    return folded


def _pad2(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), np.float32)
    out[:a.shape[0], :a.shape[1]] = a
    return out


def make_speech_dnn_pallas(variables: Dict):
    """Compile-time specialization: returns fn(x (B,56)) -> (B,128) packed
    [probs(7) | penult(64) | zeros]."""
    folded = fold_batchnorm(variables)
    n = folded['n_blocks']
    dims = [folded[f'W{i}'].shape for i in range(n)]
    in_dim = dims[0][0]
    in_pad = -in_dim % 128 + in_dim
    # pad every layer's dims up to lane multiples
    sizes = [in_pad] + [max(128, -d[1] % 128 + d[1]) for d in dims]
    n_classes = folded['Wout'].shape[1]

    Ws = []
    bs = []
    for i in range(n):
        Ws.append(_pad2(folded[f'W{i}'], sizes[i], sizes[i + 1]))
        bs.append(_pad2(folded[f'b{i}'][None, :], 1, sizes[i + 1]))
    Wout = _pad2(folded['Wout'], sizes[-1], 128)
    bout = _pad2(folded['bout'][None, :], 1, 128)
    penult_dim = dims[-1][1]

    def kernel(x_ref, *refs):
        w_refs = refs[:n + 1]
        b_refs = refs[n + 1:2 * n + 2]
        out_ref = refs[-1]
        h = x_ref[:]
        for i in range(n):
            h = jnp.dot(h, w_refs[i][:],
                        preferred_element_type=jnp.float32) + b_refs[i][:]
            h = jnp.maximum(h, 0.0)
        penult = h                                       # (TILE, sizes[-1])
        logits = jnp.dot(penult, w_refs[n][:],
                         preferred_element_type=jnp.float32) + b_refs[n][:]
        # masked softmax over the real classes
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        cmask = col < n_classes
        logits = jnp.where(cmask, logits, -jnp.inf)
        z = logits - jnp.max(logits, axis=-1, keepdims=True)
        ez = jnp.where(cmask, jnp.exp(z), 0.0)
        probs = ez / jnp.sum(ez, axis=-1, keepdims=True)
        # pack [probs | penult[:64...]] into 128 lanes
        shifted = jnp.concatenate(
            [jnp.zeros_like(penult[:, :n_classes]),
             penult[:, :128 - n_classes]], axis=-1)
        out_ref[:] = jnp.where(col < n_classes, probs, shifted)

    # device-resident once; re-passing host numpy would re-upload per call
    weights = [jnp.asarray(W) for W in Ws + [Wout]]
    biases = [jnp.asarray(b) for b in bs + [bout]]

    TILE = 128

    def forward(x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        pad_b = -B % 8
        xp = jnp.pad(x.astype(jnp.float32),
                     ((0, pad_b), (0, in_pad - x.shape[1])))
        Bp = B + pad_b
        tile = min(TILE, max(8, Bp))
        grid = (pl.cdiv(Bp, tile),)
        in_specs = [pl.BlockSpec((tile, in_pad), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for W in weights:
            in_specs.append(pl.BlockSpec(W.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in biases:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
            interpret=_interpret(),
        )(xp, *weights, *biases)
        return out[:B]

    forward.n_classes = n_classes
    forward.penult_dim = penult_dim
    return forward
