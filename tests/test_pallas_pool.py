"""Parity for the Pallas 3x3/s2 maxpool (interpret mode).

Round-5 A/B on the real TPU: STANDALONE the kernel beats XLA's
reduce_window 2x (0.91 vs 1.83 ms, b64@112, exact parity) — but spliced
into the stem graph it LOSES (1.36 vs 0.76 ms) because the custom-call
boundary forces the conv output through a layout-constrained
materialization that XLA's fused conv->relu->pool avoids. Kept off the
serving path; kernel + this gate remain as the documented attempt
(ROADMAP.md) and for standalone-pool use cases.
"""
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mec_tpu.ops.pallas_pool import max_pool_3x3s2


def test_pool_matches_reduce_window():
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.abs(rng.randn(2, 16, 16, 8)).astype(np.float32),
                    jnp.bfloat16)
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    got = max_pool_3x3s2(x)
    assert got.shape == ref.shape == (2, 8, 8, 8)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_pool_zero_and_tie_values():
    """Zero padding must match -inf padding for non-negative inputs,
    including all-zero windows and exact ties."""
    x = jnp.zeros((1, 8, 8, 8), jnp.bfloat16)
    assert float(jnp.max(jnp.abs(max_pool_3x3s2(x)))) == 0.0
    x = jnp.ones((1, 8, 8, 8), jnp.bfloat16)
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3s2(x), np.float32),
        np.asarray(ref, np.float32))
