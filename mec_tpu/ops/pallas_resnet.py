"""Fused Pallas bottleneck stack for ResNet50 layer1 (int8 serving).

Why: chain-measured on the v5e (round 5, b64@224), layer1 is the
largest single slice of the image stage — 1.283 ms of 3.45 ms — and
runs at ~3x its bandwidth floor because the 103 MB bf16 residual stream
round-trips HBM at every one of its three bottleneck blocks (quantize,
three convs, dequant epilogues, residual add each materialize it). At
56x56 the whole per-image stream is only 1.6 MB: this kernel keeps it
VMEM-resident across ALL THREE blocks — one HBM read of the pooled
input, one HBM write of the layer1 output — and runs the 1x1 convs as
int8 matmuls and the 3x3 as nine shifted+masked int8 matmuls on the
flattened (56*56, C) map.

Numerics replicate models/qconv.QuantConv 'static' mode op-for-op
(round-half-even, clip +-127, s8xs8->s32 MXU dot, f32 act*kernel scale
dequant + bias epilogue, bf16 residual stream), so the kernel slots in
under the SAME .mecp artifact params with no recalibration.

Reference for the served behavior: reference
inference/image_inference.py:48-92 (torchvision ResNet50 layer1).
Enabled by MEC_PALLAS_LAYER1=1 (serving bf16+int8-static mode only);
A/B + parity: tests/test_pallas_resnet.py, examples/ab_pallas_layer1.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mec_tpu.ops.pallas_kernels import _interpret

H = W = 56
P = H * W  # 3136 flattened positions, a multiple of the int8 sublane tile


def _quant(x, inv_s):
    """models/qconv._quantize_act_static with the division replaced by
    a precomputed-reciprocal multiply (VPU divides are multi-pass and
    there are ten of these on (P, 256)-sized arrays; XLA performs the
    same strength reduction). Differs from x/s only in the last ulp."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_s),
                    -127, 127).astype(jnp.int8)


def _mm(a_q, k_q):
    return jax.lax.dot_general(
        a_q, k_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _col_mask(b: int):
    """Positions whose column neighbor c+b falls outside the image
    (zero-padding conv semantics). Static per shift."""
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    c = i % W
    return (c + b >= 0) & (c + b < W)


def _row_mask(a: int):
    i = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    r = i // W
    return (r + a >= 0) & (r + a < H)


def _conv3x3(x_q, k_q):
    """3x3 / stride 1 / pad 1 conv on the flattened map: nine shifted,
    masked int8 matmuls accumulating in s32. x_q: (P, C) int8,
    k_q: (3, 3, C, F) int8.

    Shift engineering (Mosaic only rotates 32-bit data): the two +-1
    column shifts are built ONCE via an i32 bounce; the +-W row shifts
    are multiples of 4, so they run as sublane rolls of the
    bitcast-PACKED (P/4, C) i32 view — the packed roll moves 1/4 the
    bytes and skips both casts. (The first cut cast+rolled all eight
    shifted taps in i32 and lost the A/B 0.63x; this version's shift
    traffic is ~6x smaller.)"""
    cols = {}
    for b in (-1, 0, 1):
        if b:
            xs = (pltpu.roll(x_q.astype(jnp.int32), (-b) % P, axis=0)
                  .astype(jnp.int8))
            xs = jnp.where(_col_mask(b), xs, jnp.int8(0))
        else:
            xs = x_q
        cols[b] = xs
    taps = []
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            xs = cols[b]
            if a:
                packed = pltpu.bitcast(xs, jnp.int32)  # (P//4, C)
                packed = pltpu.roll(packed, (-a * W // 4) % (P // 4),
                                    axis=0)
                xs = jnp.where(_row_mask(a),
                               pltpu.bitcast(packed, jnp.int8),
                               jnp.int8(0))
            taps.append(xs)
    # ONE (P, 9C) x (9C, F) matmul instead of nine K=C-padded ones:
    # K=64 pads to the 128 MXU tile, so nine tap-matmuls burn 1.8x the
    # MXU work of the stacked form (A/B'd: 1.74 -> 1.34 ms)
    x9 = jnp.concatenate(taps, axis=1)
    k9 = k_q.reshape(9 * k_q.shape[2], k_q.shape[3])
    return _mm(x9, k9)


def _deq(acc, sx, scale_bias, relu):
    """s32 -> f32 epilogue: * (act_scale x per-channel kernel_scale)
    + bias, optional relu, bf16 (QuantConv epilogue order)."""
    out = acc.astype(jnp.float32) * (sx * scale_bias[0]) + scale_bias[1]
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(jnp.bfloat16)


def _layer1_kernel(scales_ref, x_ref, *refs):
    """One image: 3 bottleneck blocks, residual stream VMEM-resident.

    refs layout: 10 conv params as (kernel_q, (2, F) [kernel_scale;
    bias]) pairs in block order [b0: conv1, conv2, conv3, downsample;
    b1: conv1..conv3; b2: conv1..conv3], then the output ref.
    scales_ref: (1, 16) f32 act_scales in the same conv order.
    """
    out_ref = refs[-1]
    kq = [refs[2 * i] for i in range(10)]
    sb = [refs[2 * i + 1] for i in range(10)]
    s = [scales_ref[0, i] for i in range(10)]
    inv = [scales_ref[0, 16 + i] for i in range(10)]

    x = x_ref[0]  # (P, 64) bf16 pooled stem output

    # block 0 (downsample block: identity = 1x1 conv of x)
    xq = _quant(x, inv[0])
    h = _deq(_mm(xq, kq[0][:]), s[0], sb[0][:], relu=True)
    h = _deq(_conv3x3(_quant(h, inv[1]), kq[1][:]), s[1], sb[1][:],
             relu=True)
    out = _deq(_mm(_quant(h, inv[2]), kq[2][:]), s[2], sb[2][:],
               relu=False)
    xq_d = _quant(x, inv[3])  # downsample has its own act_scale
    ident = _deq(_mm(xq_d, kq[3][:]), s[3], sb[3][:], relu=False)
    res = jnp.maximum(out + ident, 0).astype(jnp.bfloat16)

    # blocks 1..2 (identity = residual stream, stays in VMEM)
    for blk in range(2):
        o = 4 + 3 * blk
        h = _deq(_mm(_quant(res, inv[o]), kq[o][:]), s[o], sb[o][:],
                 relu=True)
        h = _deq(_conv3x3(_quant(h, inv[o + 1]), kq[o + 1][:]),
                 s[o + 1], sb[o + 1][:], relu=True)
        out = _deq(_mm(_quant(h, inv[o + 2]), kq[o + 2][:]), s[o + 2],
                   sb[o + 2][:], relu=False)
        res = jnp.maximum(out + res, 0).astype(jnp.bfloat16)

    out_ref[0] = res


_CONV_ORDER = (('layer1_0', 'conv1'), ('layer1_0', 'conv2'),
               ('layer1_0', 'conv3'), ('layer1_0', 'downsample_conv'),
               ('layer1_1', 'conv1'), ('layer1_1', 'conv2'),
               ('layer1_1', 'conv3'),
               ('layer1_2', 'conv1'), ('layer1_2', 'conv2'),
               ('layer1_2', 'conv3'))


def _gather_params(params: Dict):
    """Flatten the engine's layer1_* QuantConv params (static mode)
    into the kernel's operand list + act-scale row."""
    kqs, sbs, scales = [], [], []
    for blk, conv in _CONV_ORDER:
        p = params[blk][conv]
        kq = p['kernel_q']
        if kq.ndim == 4 and kq.shape[:2] == (1, 1):
            kq = kq.reshape(kq.shape[2:])  # 1x1 conv -> plain matmul
        kqs.append(jnp.asarray(kq))
        sbs.append(jnp.stack([jnp.asarray(p['kernel_scale'],
                                          jnp.float32),
                              jnp.asarray(p['bias'], jnp.float32)]))
        scales.append(jnp.asarray(p['act_scale'], jnp.float32))
    row = jnp.zeros((1, 32), jnp.float32)
    s = jnp.stack(scales)
    row = row.at[0, :10].set(s).at[0, 16:26].set(1.0 / s)
    return kqs, sbs, row


@jax.jit
def layer1_pallas(x: jnp.ndarray, params: Dict) -> jnp.ndarray:
    """Apply fused layer1 to the pooled stem output.

    x: (B, 56, 56, 64) bf16 -> (B, 56, 56, 256) bf16. `params` is the
    engine's image params dict ({'layer1_0': {...}, ...}, QuantConv
    static-mode leaves).
    """
    B = x.shape[0]
    kqs, sbs, scales = _gather_params(params)
    xf = x.reshape(B, P, 64)

    operands = [scales, xf]
    in_specs = [pl.BlockSpec((1, 32), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, P, 64), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    for kq, sb in zip(kqs, sbs):
        operands += [kq, sb]
        in_specs += [pl.BlockSpec(kq.shape,
                                  lambda b, n=kq.ndim: (0,) * n,
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec(sb.shape, lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)]

    out = pl.pallas_call(
        _layer1_kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, P, 256), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, 256), jnp.bfloat16),
        # the straight-line block pipeline's live vector set (~27 MB)
        # exceeds the default 16 MB scoped-VMEM budget; the v5e has
        # 128 MB VMEM, so give the kernel a wider stack
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return out.reshape(B, H, W, 256)
