"""mec_tpu.utils.roofline: the physical HBM-traffic model + chain timers.

Round 4's bench roofline divided XLA's LOGICAL bytes-accessed by the
HBM paper peak and published physically impossible utilizations (232%).
The corrected model counts only bytes that really cross HBM (args +
outputs + 2x temp arena), so derived utilization can never exceed the
measured achievable rate (see bench.py `_sanitize_mfu` + the contract
test). These tests pin the model's invariants on the CPU backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mec_tpu.utils import roofline


@pytest.fixture(scope='module')
def compiled_matmul():
    f = jax.jit(lambda a, b: jnp.tanh(a @ b))
    a = jnp.ones((256, 256), jnp.float32)
    b = jnp.ones((256, 256), jnp.float32)
    return f.lower(a, b).compile()


def test_traffic_model_components(compiled_matmul):
    tr = roofline.hbm_traffic_bytes(compiled_matmul)
    # two 256x256 f32 args, one 256x256 f32 output
    assert tr['arg_bytes'] == 2 * 256 * 256 * 4
    assert tr['out_bytes'] == 256 * 256 * 4
    assert tr['model_bytes'] == (tr['arg_bytes'] + tr['out_bytes']
                                 + 2 * tr['temp_bytes'])
    assert tr['flops'] > 2 * 256 ** 3 * 0.9  # the matmul's MACs


def test_model_bytes_bounded_by_logical(compiled_matmul):
    """Physical traffic can only deduplicate logical accesses, never
    invent new ones — unless temps dominate (they don't for one
    matmul+tanh: XLA fuses, temp arena ~0)."""
    tr = roofline.hbm_traffic_bytes(compiled_matmul)
    assert tr['temp_bytes'] == 0
    assert tr['model_bytes'] <= tr['logical_bytes']


def test_utilization_from_model_cannot_exceed_measured_rate():
    """The contract the bench labels rely on: bytes that really cross
    HBM, timed at the rate HBM really sustains, give <=100% (plus
    measurement noise; bench relabels anything >105)."""
    tr = {'model_bytes': 100e6}
    measured_gbps = 705.8
    floor_ms = tr['model_bytes'] / (measured_gbps * 1e9) * 1e3
    pct = 100 * (tr['model_bytes'] / (floor_ms * 1e-3) / 1e9) / measured_gbps
    assert pct <= 100.001


def test_chain_slope_cancels_constant_offset(monkeypatch):
    """slope = (wall(k2)-wall(k1))/(k2-k1) removes the fetch-RTT term
    that a single chain bakes into every per-iteration number."""
    walls = {40: 29.0 + 40 * 0.5, 160: 29.0 + 160 * 0.5}  # RTT=29, step=.5
    monkeypatch.setattr(roofline, 'chain_wall_ms',
                        lambda call, k, reps=3: walls[k])
    assert roofline.chain_slope_ms(lambda eps: eps) == pytest.approx(0.5)
    # the naive single-chain estimate would be 0.5 + 29/160 = 0.68
    assert walls[160] / 160 > 0.68


def test_chain_wall_measures_real_iterations():
    """The chained body must actually run k times: a k2 chain's wall
    minus a k1 chain's wall grows with (k2-k1) for a real workload.
    Runs on CPU with a matmul big enough to dominate overhead."""
    x = jax.device_put(
        np.random.RandomState(0).randn(256, 256).astype(np.float32))

    def call(eps):
        return jnp.tanh((x + eps) @ x)

    ms = roofline.chain_slope_ms(call, k1=10, k2=40, reps=2)
    assert ms > 0  # positive slope: the body was not hoisted/folded


def test_measure_hbm_gbps_smoke():
    """Probe runs end-to-end on the CPU backend and returns a positive,
    finite bandwidth (the VALUE is only meaningful on the TPU)."""
    gbps = roofline.measure_hbm_gbps(size_mb=8, reps=1)
    assert np.isfinite(gbps) and gbps > 0
