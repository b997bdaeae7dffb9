"""Batched Pallas kernel for the spectral-rolloff crossing search.

The XLA rolloff stage materializes a full chunked-cumsum of the
magnitude spectrogram (two triangular MXU matmuls, ~17 GFLOP at b64,
0.46 ms — ops/audio_features.py::_cumsum_chunked) when the feature only
needs ONE number per frame: the lowest bin whose cumulative energy
reaches roll_percent of the total. This kernel finds that bin with an
11-probe binary search per frame — each probe is a masked lane
reduction over the VMEM-resident block, so the spectrogram streams from
HBM exactly once and the 12 passes run at VPU rates instead of
re-reading HBM (the XLA formulation of the same search would pay 12
full HBM passes, ~0.55 ms — worse than the cumsum it replaces; VMEM
residency is the entire win, the same shape as the measured-positive
ops/pallas_tuning.py selection kernel).

Numerics: the probe prefix sums are plain lane-tree reductions, a
DIFFERENT association order from the chunked-matmul cumsum, so the
crossing bin can flip on a near-tie (|prefix - thresh| within
reduction-order rounding, measure-zero for continuous spectra). This
kernel therefore only serves the bf16 serving mode (gated on
`use_pallas` + Config.PALLAS_ROLLOFF at the call site); the fp32
logit-parity mode keeps the XLA cumsum path. The bin->frequency map is
bit-exact: f_i = i * (sr/2)/1024 where (sr/2)/1024 = 11025 * 2^-10 and
i*11025 < 2^24 are both exactly representable in float32, so
bins * step == fft_frequencies(sr, 2048)[bins] bitwise.

Reference semantics: librosa.feature.spectral_rolloff (roll_percent
0.85), reference preprocessing/audio_preprocessing.py:35.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mec_tpu.ops.pallas_kernels import _interpret

_ROWS = 256        # frames per grid cell: (256, 1152) f32 = 1.18 MB VMEM


def _rolloff_kernel(roll_percent, nbins, mag_ref, out_ref):
    m = mag_ref[:]                        # (R, Fp) VMEM-resident block
    total = jnp.sum(m, axis=1, keepdims=True)
    thresh = jnp.float32(roll_percent) * total
    iota = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)

    # smallest k in [0, nbins-1] with prefix(k) >= thresh. The invariant
    # prefix(hi) >= thresh holds at init: lane padding is zero, so
    # where(iota <= nbins-1, m, 0) is the SAME vector as m and
    # prefix(nbins-1) == total bitwise; thresh = 0.85*total <= total for
    # finite nonneg input (and 0 >= 0 for an all-zero frame).
    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        pref = jnp.sum(jnp.where(iota <= mid, m, 0.0), axis=1,
                       keepdims=True)
        ge = pref >= thresh
        return (jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi))

    R = m.shape[0]
    lo0 = jnp.zeros((R, 1), jnp.int32)
    hi0 = jnp.full((R, 1), nbins - 1, jnp.int32)
    # ceil(log2(1025)) = 11 probes shrink the range to one bin
    lo, _ = jax.lax.fori_loop(0, 11, body, (lo0, hi0))
    out_ref[:] = jnp.concatenate(
        [lo.astype(jnp.float32), jnp.zeros((R, 1), jnp.float32)], axis=1)


def rolloff_bins_pallas(mag2d: jnp.ndarray,
                        roll_percent: float = 0.85) -> jnp.ndarray:
    """(R, F) f32 magnitude rows -> (R,) int32 crossing bins."""
    import functools
    R, F = mag2d.shape
    kpad = (-F) % 128
    if kpad:
        mag2d = jnp.pad(mag2d, ((0, 0), (0, kpad)))
    rpad = (-R) % _ROWS
    if rpad:
        mag2d = jnp.pad(mag2d, ((0, rpad), (0, 0)))
    Rp, Fp = mag2d.shape

    kern = functools.partial(_rolloff_kernel, float(roll_percent), F)
    out = pl.pallas_call(
        kern,
        grid=(Rp // _ROWS,),
        in_specs=[pl.BlockSpec((_ROWS, Fp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ROWS, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 2), jnp.float32),
        interpret=_interpret(),
    )(mag2d)
    return out[:R, 0].astype(jnp.int32)
