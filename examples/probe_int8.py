"""Probe: does XLA:TPU lower int8 dots/convs onto the MXU at 2x bf16 rate?

The v5e datasheet gives 394 int8 TOPS vs 197 bf16 TFLOP/s. If
s8 x s8 -> s32 `lax.dot_general` / `lax.conv_general_dilated` hit that
path, int8 post-training quantization of the serving image stage is the
~18% fused-graph compute reduction BASELINE.md says the 7,000 preds/s
b64 target needs. If they don't (XLA upcasts to int32 on the VPU), the
idea is dead on arrival — measure before building.

Methodology (two failed attempts first): (1) per-dispatch amortized
timing measured only tunnel dispatch cost — every shape clustered at
20-45 ms/call; (2) a K-vs-2K chained-graph slope at K=16 drowned in
RTT jitter (negative slopes). What works through this tunnel: chain
enough ops inside ONE jit graph (lax.fori_loop, static trip count)
that device time is ~0.5 s, sync ONE scalar fetch, take min-of-reps —
the ~27 ms RTT is then <6% and one-sided. Requantization between
chained ops (int8: >>shift + cast; bf16: *0.01) is VPU elementwise on
one array vs an MXU contraction — included but small.

Run standalone on the real TPU: python examples/probe_int8.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

REPS = int(os.environ.get('REPS', '3'))


def per_op_ms(make_fn, x0, k):
    """Min-of-REPS sync wall time / k of a k-op chained graph."""
    fn = jax.jit(make_fn(k))
    np.asarray(fn(x0))  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(x0))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)) * 1000 / k


def bench_matmul(n, k):
    rng = np.random.default_rng(0)
    w8 = jax.device_put(rng.integers(-127, 127, (n, n), dtype=np.int8))
    x8 = jax.device_put(rng.integers(-127, 127, (n, n), dtype=np.int8))
    wbf = jax.device_put(rng.standard_normal((n, n)).astype(jnp.bfloat16))
    xbf = jax.device_put(rng.standard_normal((n, n)).astype(jnp.bfloat16))

    def make_i8(k):
        def fn(x):
            def body(_, x):
                y = lax.dot_general(x, w8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                return lax.shift_right_arithmetic(y, 7).astype(jnp.int8)
            return jnp.sum(lax.fori_loop(0, k, body, x),
                           dtype=jnp.int32)[None]
        return fn

    def make_bf(k):
        def fn(x):
            def body(_, x):
                y = lax.dot_general(x, wbf, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                return (y * 0.01).astype(jnp.bfloat16)
            return jnp.sum(lax.fori_loop(0, k, body, x),
                           dtype=jnp.float32)[None]
        return fn

    flops = 2 * n**3
    s_i8 = per_op_ms(make_i8, x8, k)
    s_bf = per_op_ms(make_bf, xbf, k)
    print(f'matmul {n}^3 (K={k}): int8 {s_i8:.3f} ms/op '
          f'({flops / s_i8 / 1e9:.0f} TOP/s)  '
          f'bf16 {s_bf:.3f} ms/op ({flops / s_bf / 1e9:.0f} TFLOP/s)  '
          f'speedup {s_bf / s_i8:.2f}x', flush=True)


def bench_conv(b, h, w, c, kh, k):
    """Shape-preserving conv (cin=cout, stride 1 SAME) so it chains."""
    rng = np.random.default_rng(0)
    k8 = jax.device_put(rng.integers(-8, 8, (kh, kh, c, c), dtype=np.int8))
    x8 = jax.device_put(rng.integers(-127, 127, (b, h, w, c), dtype=np.int8))
    kbf = jax.device_put(
        rng.standard_normal((kh, kh, c, c)).astype(jnp.bfloat16))
    xbf = jax.device_put(rng.standard_normal((b, h, w, c)).astype(jnp.bfloat16))
    dn = lax.conv_dimension_numbers((b, h, w, c), (kh, kh, c, c),
                                    ('NHWC', 'HWIO', 'NHWC'))
    conv = partial(lax.conv_general_dilated, window_strides=(1, 1),
                   padding='SAME', dimension_numbers=dn)

    def make_i8(k):
        def fn(x):
            def body(_, x):
                y = conv(x, k8, preferred_element_type=jnp.int32)
                return lax.shift_right_arithmetic(y, 9).astype(jnp.int8)
            return jnp.sum(lax.fori_loop(0, k, body, x),
                           dtype=jnp.int32)[None]
        return fn

    def make_bf(k):
        def fn(x):
            def body(_, x):
                y = conv(x, kbf, preferred_element_type=jnp.float32)
                return (y * 0.01).astype(jnp.bfloat16)
            return jnp.sum(lax.fori_loop(0, k, body, x),
                           dtype=jnp.float32)[None]
        return fn

    flops = 2 * b * h * w * c * kh * kh * c
    try:
        s_i8 = per_op_ms(make_i8, x8, k)
        msg_i8 = f'int8 {s_i8:.3f} ms/op ({flops / s_i8 / 1e9:.0f} TOP/s)'
    except Exception as e:  # noqa: BLE001 — probe: record the failure mode
        s_i8 = None
        msg_i8 = f'int8 FAILED ({type(e).__name__}: {str(e)[:100]})'
    s_bf = per_op_ms(make_bf, xbf, k)
    msg = (f'conv {b}x{h}x{w}x{c} k{kh} (K={k}): {msg_i8}  '
           f'bf16 {s_bf:.3f} ms/op ({flops / s_bf / 1e9:.0f} TFLOP/s)')
    if s_i8 is not None:
        msg += f'  speedup {s_bf / s_i8:.2f}x'
    print(msg, flush=True)


def main():
    print(f'devices: {jax.devices()}  reps={REPS}', flush=True)
    bench_matmul(4096, 512)
    # ResNet50-typical 3x3 convs at serving batch 64 (14.8 GFLOP each)
    bench_conv(64, 56, 56, 64, 3, 2048)
    bench_conv(64, 28, 28, 128, 3, 2048)
    bench_conv(64, 14, 14, 256, 3, 2048)
    bench_conv(64, 7, 7, 512, 3, 2048)
    # 1x1 (the pointwise convs carry most ResNet50 bottleneck FLOPs)
    bench_conv(64, 14, 14, 256, 1, 8192)


if __name__ == '__main__':
    main()
