"""Roofline accounting helpers: measured HBM bandwidth + traffic model.

Round-4's roofline divided XLA `cost_analysis()` "bytes accessed" by the
v5e's 819 GB/s paper peak and reported physically impossible HBM
utilizations (speech b32 231.9%): cost analysis counts LOGICAL operand
bytes — every consumer of a value counts a full re-read, including
VMEM-resident fusion chains that never touch HBM. This module replaces
both sides of that ratio with measured/physical quantities:

- `measure_hbm_gbps()` — the ACHIEVABLE stream bandwidth of this chip
  through this runtime, measured with the fori_loop-chain slope method
  (two chain lengths; the slope cancels the constant fetch-RTT term
  that the tunnel adds to every wall time, ~29 ms here). Measured on
  the v5e (2026-08-21): 705.8 GB/s, size-linear from 64 to 512 MB =
  86% of the 819 GB/s paper peak.
- `hbm_traffic_bytes(compiled)` — a PHYSICAL traffic model from XLA's
  `memory_analysis()` buffer assignment: arguments are read from HBM at
  least once, outputs written once, and every byte of the temp arena is
  written once and read back once (2x). This is an estimate — buffer
  reuse inside the arena can hide extra traffic, and a re-read of an
  argument is not counted — but every byte it counts really crosses
  HBM, so utilization derived from it cannot exceed the physical rate
  (round-4 VERDICT item 1).

Timing traps of the chain method itself (the DCE and hoisting traps)
are documented in examples/profile_audio.py and CLAUDE.md. One more,
discovered building the probe: a closure-captured splat array (e.g.
np.ones) is embedded as an HLO constant and algebraically folded to a
scalar — the loop then measures nothing. Probe arrays must be random
AND passed as jit arguments.

Reference roofline target: the serving hot loop,
reference inference/multimodal_fusion.py:244-287.
"""
from __future__ import annotations

import time
from typing import Callable, Dict

# v5e paper numbers (per chip). Peaks for MFU; the HBM figure is only
# reported for context next to the measured achievable rate.
V5E_BF16_PEAK = 197e12
V5E_INT8_PEAK = 394e12
V5E_HBM_PAPER_GBPS = 819.0


def chain_wall_ms(call: Callable, k: int, reps: int = 3) -> float:
    """Best wall time (ms) of one fetch of a k-iteration fori_loop chain.

    `call(eps)` must run the stage with an input-side leaf perturbed by
    `eps` (see CLAUDE.md: perturb an INPUT-side leaf or the body hoists;
    reduce EVERY output leaf or branches dead-code away).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def body(i, cacc):
            out = call(cacc * jnp.float32(1e-30))
            s = sum(jnp.sum(le.astype(jnp.float32))
                    for le in jax.tree_util.tree_leaves(out))
            return cacc + s * jnp.float32(0.0)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    float(run())  # compile
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


def chain_slope_ms(call: Callable, k1: int = 40, k2: int = 160,
                   reps: int = 3) -> float:
    """Per-iteration device time via the SLOPE of two chain lengths.

    A single k-chain's wall time is RTT + k*step; dividing by k leaves
    RTT/k baked in (~0.3 ms at k=100 through this tunnel — fatal for
    sub-ms stages, a few percent at 8 ms). The slope
    (wall(k2)-wall(k1))/(k2-k1) cancels the constant exactly.
    """
    w1 = chain_wall_ms(call, k1, reps)
    w2 = chain_wall_ms(call, k2, reps)
    return max((w2 - w1) / (k2 - k1), 1e-6)


def measure_hbm_gbps(size_mb: int = 256, reps: int = 3) -> float:
    """Measured achievable HBM stream bandwidth (GB/s), read stream.

    abs(x+eps)->sum cannot be split by the algebraic simplifier (unlike
    sum(x+eps) = sum(x)+N*eps, which hoists), so the full array streams
    from HBM every iteration.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = size_mb * 1024 * 1024 // 4
    x = jax.device_put(np.random.RandomState(0).randn(n).astype(np.float32))

    def wall(k):
        @jax.jit
        def run(xa):
            def body(i, cacc):
                s = jnp.sum(jnp.abs(xa + cacc * jnp.float32(1e-30)))
                return cacc + s * jnp.float32(0.0)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        float(run(x))
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, (time.perf_counter() - t0) * 1e3)
        return best

    k1, k2 = 40, 160
    step_ms = max((wall(k2) - wall(k1)) / (k2 - k1), 1e-6)
    return size_mb / 1024.0 / (step_ms * 1e-3)


def hbm_traffic_bytes(compiled) -> Dict[str, float]:
    """Physical HBM traffic model of a compiled executable (bytes).

    model = arguments (read >=1x) + outputs (written 1x)
            + 2 * temp arena (each temp byte written + read back).
    Also returns the raw components and XLA's logical bytes-accessed for
    comparison (logical >> model whenever fusion keeps chains in VMEM).
    """
    ma = compiled.memory_analysis()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax versions
        ca = ca[0]
    arg = float(ma.argument_size_in_bytes)
    out = float(ma.output_size_in_bytes)
    tmp = float(ma.temp_size_in_bytes)
    return {
        'model_bytes': arg + out + 2.0 * tmp,
        'arg_bytes': arg,
        'out_bytes': out,
        'temp_bytes': tmp,
        'logical_bytes': float(ca.get('bytes accessed', 0.0)),
        'flops': float(ca.get('flops', 0.0)),
    }
