"""Int8-quantized conv/dense modules (serving only).

Consume params produced by ops/quant.quantize_conv: ``kernel_q`` (int8,
HWIO for convs / (in, out) for dense), ``kernel_scale`` (f32 per output
channel), ``bias`` (f32). The contraction accumulates s8 x s8 -> s32 on
the MXU (measured 1.6-1.8x the bf16 rate, examples/probe_int8.py), and
the dequant scale ``s_x * s_c`` + bias is an epilogue XLA fuses into
the output write.

Two activation-quantization modes, both batch-invariant (a request's
logits never depend on what shares its serving bucket):

- ``mode='dynamic'``: max-abs scale computed on device per EXAMPLE
  (convs; over H, W, C) or per TOKEN (dense; over the feature axis).
  Zero calibration, but a conv's per-example scale is a global
  cross-tile reduction XLA must materialize — one extra read of every
  activation plus a separate quantize pass (measured: eats most of the
  MXU gain on ResNet50, BASELINE.md round 3).
- ``mode='static'``: a calibrated per-layer scalar ``act_scale`` param
  (ops/quant.calibrate_static_scales). The quantize (div, round, clip,
  s8 cast) then fuses into the PREVIOUS op's epilogue — activations are
  written once, as int8, halving their HBM traffic instead of adding
  to it. Out-of-calibration-range activations saturate at +-127 (the
  standard static-PTQ clip).
"""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def _quantize_act(x: jnp.ndarray, axes: Tuple[int, ...]):
    """Symmetric int8 with a dynamic max-abs scale over ``axes``."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes,
                   keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    return xq, sx


def _quantize_act_static(x: jnp.ndarray, sx: jnp.ndarray):
    """Symmetric int8 with a calibrated scalar scale (saturating)."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    return xq, sx


class QuantConv(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Tuple[Tuple[int, int], ...]] = 'SAME'
    dtype: jnp.dtype = jnp.float32
    mode: str = 'dynamic'  # 'dynamic' | 'static' (calibrated act_scale)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kq = self.param(
            'kernel_q',
            lambda rng: jnp.zeros(self.kernel_size + (cin, self.features),
                                  jnp.int8))
        ks = self.param('kernel_scale',
                        lambda rng: jnp.ones((self.features,), jnp.float32))
        b = self.param('bias',
                       lambda rng: jnp.zeros((self.features,), jnp.float32))
        if self.mode == 'static':
            sc = self.param('act_scale',
                            lambda rng: jnp.ones((), jnp.float32))
            xq, sx = _quantize_act_static(x, sc)
        else:
            # per-example symmetric activation scale; zero-padded bucket
            # rows hit the epsilon floor and stay all-zero through the
            # conv. During calibration runs the observed max-abs is sown
            # for ops/quant.calibrate_static_scales to collect.
            xq, sx = _quantize_act(x, (1, 2, 3))
            self.sow('intermediates', 'act_amax', jnp.max(sx) * 127.0)
        dn = lax.conv_dimension_numbers(xq.shape, kq.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
        y = lax.conv_general_dilated(xq, kq, self.strides, self.padding,
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (sx * ks) + b
        return out.astype(self.dtype)


class QuantDense(nn.Module):
    """Int8 dense over the last axis of a (..., in) activation.

    Dynamic activation scales are per-ROW (every leading dim keeps its
    own scale — per-token for a (B, L, H) residual stream), so padded
    tokens and bucket-mates cannot perturb a request's logits. Unlike
    the conv's per-example scale, a last-axis reduce is lane-local and
    fuses into the producing op's epilogue.
    """
    features: int
    dtype: jnp.dtype = jnp.float32
    mode: str = 'dynamic'  # 'dynamic' | 'static' (calibrated act_scale)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kq = self.param(
            'kernel_q',
            lambda rng: jnp.zeros((cin, self.features), jnp.int8))
        ks = self.param('kernel_scale',
                        lambda rng: jnp.ones((self.features,), jnp.float32))
        b = self.param('bias',
                       lambda rng: jnp.zeros((self.features,), jnp.float32))
        if self.mode == 'static':
            sc = self.param('act_scale',
                            lambda rng: jnp.ones((), jnp.float32))
            xq, sx = _quantize_act_static(x, sc)
        else:
            xq, sx = _quantize_act(x, (-1,))
            self.sow('intermediates', 'act_amax', jnp.max(sx) * 127.0)
        y = lax.dot_general(xq, kq, (((xq.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * (sx * ks) + b
        return out.astype(self.dtype)
