"""Batched Pallas kernel for the tuning estimator's selection phase.

The round-1 per-clip Pallas tuning kernel measured NEGATIVE (2.31 vs
1.43 ms at b32): one grid cell per clip serialized ~145 fori_loop trips
on the single TensorCore. This is the batched shape ROADMAP item 8
reserved judgment on: EIGHT clips per grid cell, the (8, K~23k)
candidate set VMEM-resident across all 32 median bit-search passes and
all 101 histogram edge counts, every pass vectorized across the cell's
rows exactly like the XLA formulation batches across the full batch.

Scope: only the iterative selection phase (masked median -> sel ->
residual histogram -> first-argmax index). Candidate prep (parabolic
interpolation, localmax, 2:1 compaction) and the log2 residual fold
stay in XLA — they are single fused elementwise passes, and round 1
measured Mosaic's transcendental rounding flipping a histogram
near-tie, so the parity-sensitive log2 never enters Mosaic.

Numerics are bit-exact vs ops/audio_features.py's XLA path: the median
bit-search runs in a SIGNED order-preserving key domain (b<0 -> b ^
0x7fffffff keeps negatives negative and monotone, so Mosaic's signed
i32 compares order float32 correctly), the overflow-safe midpoint uses
a logical shift of the wrapped difference, and the histogram compares
against the same host-precomputed ceil-to-f32 edge table.

Reference semantics: librosa.estimate_tuning, reference
preprocessing/audio_preprocessing.py:29 (chroma path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mec_tpu.ops.pallas_kernels import _interpret

_ROWS = 8          # clips per grid cell
_NEG_FLIP = 0x7FFFFFFF
_I32_MIN = -2147483648
_I32_MAX = 2147483647


def _order_key(f32):
    """Monotone float32 -> signed-int32 key (negatives stay negative)."""
    b = pltpu.bitcast(f32, jnp.int32)
    return jnp.where(b < 0, b ^ _NEG_FLIP, b)


def _key_value(key):
    b = jnp.where(key < 0, key ^ _NEG_FLIP, key)
    return pltpu.bitcast(b, jnp.float32)


def _tuning_kernel(mags_ref, res_ref, pit_ref, edges_ref, out_ref):
    big = jnp.float32(3.4028235e38)
    m = mags_ref[:]                       # (R, K) candidate magnitudes
    r = res_ref[:]                        # (R, K) folded residuals
    mask = pit_ref[:] > 0.0               # padding has pitch 0
    R = m.shape[0]

    filled = jnp.where(mask, m, big)
    kcnt = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
    lo_t = jnp.maximum((kcnt - 1) // 2, 0)
    hi_t = jnp.maximum(kcnt // 2, 0)

    key = _order_key(filled)

    def body(_, lohi):
        lo, hi = lohi
        # wrapped difference reinterpreted logically = floor(diff/2)
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        cnt = jnp.sum((key <= mid).astype(jnp.int32), axis=1,
                      keepdims=True)
        found = cnt >= lo_t + 1
        return (jnp.where(found, lo, mid + 1),
                jnp.where(found, mid, hi))

    lo0 = jnp.full((R, 1), _I32_MIN, jnp.int32)
    hi0 = jnp.full((R, 1), _I32_MAX, jnp.int32)
    lo_key, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    v_lo = _key_value(lo_key)

    cnt_le = jnp.sum((filled <= v_lo).astype(jnp.int32), axis=1,
                     keepdims=True)
    nxt = jnp.min(jnp.where(filled > v_lo, filled, big), axis=1,
                  keepdims=True)
    v_hi = jnp.where(cnt_le >= hi_t + 1, v_lo, nxt)
    med = jnp.where(kcnt > 0, 0.5 * (v_lo + v_hi), 0.0)

    sel = (m >= med) & mask

    # histogram of residuals at the precomputed ceil-to-f32 edges:
    # count_ge per edge, adjacent differences = bin counts. sel is
    # folded ONCE into a sentinel (-2.0 < every edge), so each of the
    # 101 passes is a bare compare+count instead of compare+and+count.
    rsel = jnp.where(sel, r, jnp.float32(-2.0))
    cges = []
    for i in range(101):
        e = edges_ref[0, i]
        cges.append(jnp.sum((rsel >= e).astype(jnp.int32), axis=1,
                            keepdims=True))
    counts = jnp.concatenate(
        [cges[i] - cges[i + 1] for i in range(100)], axis=1)  # (R, 100)

    maxc = jnp.max(counts, axis=1, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1)
    first = jnp.min(jnp.where(counts == maxc, idx, 1 << 30), axis=1,
                    keepdims=True)                     # np.argmax ties
    has = (jnp.sum(sel.astype(jnp.int32), axis=1, keepdims=True)
           > 0).astype(jnp.float32)
    out_ref[:] = jnp.concatenate(
        [first.astype(jnp.float32), has], axis=1)


def tuning_select_pallas(mags: jnp.ndarray, residual: jnp.ndarray,
                         pitches: jnp.ndarray) -> tuple:
    """(B, K) candidates -> (best_bin (B,) int32, has_any (B,) bool).

    K is lane-padded here; padding rows carry pitch 0 (masked out).
    B must be a multiple of 8 (serving buckets are powers of two).
    """
    B, K = mags.shape
    kpad = (-K) % 128
    if kpad:
        zp = jnp.zeros((B, kpad), jnp.float32)
        mags = jnp.concatenate([mags, zp], axis=1)
        residual = jnp.concatenate([residual, zp], axis=1)
        pitches = jnp.concatenate([pitches, zp], axis=1)
    rpad = (-B) % _ROWS
    if rpad:
        zr = jnp.zeros((rpad, mags.shape[1]), jnp.float32)
        mags = jnp.concatenate([mags, zr], axis=0)
        residual = jnp.concatenate([residual, zr], axis=0)
        pitches = jnp.concatenate([pitches, zr], axis=0)
    Bp, Kp = mags.shape

    from mec_tpu.ops.audio_features import _hist_edges_ceil32
    edges = jnp.zeros((1, 128), jnp.float32)
    edges = edges.at[0, :101].set(jnp.asarray(_hist_edges_ceil32()))

    grid = (Bp // _ROWS,)
    spec = pl.BlockSpec((_ROWS, Kp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _tuning_kernel,
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ROWS, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 2), jnp.float32),
        interpret=_interpret(),
    )(mags, residual, pitches, edges)
    return (out[:B, 0].astype(jnp.int32), out[:B, 1] > 0.5)
