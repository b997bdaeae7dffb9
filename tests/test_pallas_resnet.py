"""Parity for the fused Pallas layer1 bottleneck stack (interpret mode).

The kernel is a documented MEASURED-NEGATIVE attempt (round 5): it is
bit-exact against the XLA QuantConv path on the real TPU but runs at
0.75x XLA because Mosaic executes s8xs8 matmuls at the bf16 MXU rate
(no int8 double-pumping), while XLA's conv path gets ~1.6-1.8x — see
ROADMAP.md. The kernel and this parity gate are kept so the attempt is
reproducible and so any future toolchain with true int8 Mosaic matmuls
can re-A/B it (examples/ab_pallas_layer1.py).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mec_tpu.models.resnet import Bottleneck
from mec_tpu.ops.pallas_resnet import layer1_pallas


def _quant_params(rng, cin, cout, ksize=1):
    kw = rng.randn(ksize, ksize, cin, cout).astype(np.float32) * 0.1
    ks = np.abs(kw).max(axis=(0, 1, 2)) / 127.0 + 1e-8
    kq = np.clip(np.round(kw / ks), -127, 127).astype(np.int8)
    return {'kernel_q': jnp.asarray(kq),
            'kernel_scale': jnp.asarray(ks, jnp.float32),
            'bias': jnp.asarray(rng.randn(cout) * 0.05, jnp.float32),
            'act_scale': jnp.asarray(rng.uniform(0.01, 0.05), jnp.float32)}


@pytest.fixture(scope='module')
def params():
    rng = np.random.RandomState(0)
    p = {}
    for blk in range(3):
        cin = 64 if blk == 0 else 256
        conv = {'conv1': _quant_params(rng, cin, 64),
                'conv2': _quant_params(rng, 64, 64, ksize=3),
                'conv3': _quant_params(rng, 64, 256)}
        if blk == 0:
            conv['downsample_conv'] = _quant_params(rng, 64, 256)
        p[f'layer1_{blk}'] = conv
    return p


def test_layer1_pallas_matches_quantconv_path(params):
    class L1(nn.Module):
        @nn.compact
        def __call__(self, h):
            for block in range(3):
                h = Bottleneck(64, stride=1, downsample=(block == 0),
                               dtype=jnp.bfloat16, fold_bn=True,
                               quant=True, quant_mode='static',
                               name=f'layer1_{block}')(h)
            return h

    x = jnp.asarray(np.abs(np.random.RandomState(1).randn(
        2, 56, 56, 64)).astype(np.float32), jnp.bfloat16)
    ref = np.asarray(L1().apply({'params': params}, x), np.float32)
    got = np.asarray(layer1_pallas(x, params), np.float32)
    assert ref.shape == got.shape == (2, 56, 56, 256)
    # reciprocal-multiply quantize can differ from the XLA divide by one
    # int step on exact .5 boundaries; on the real TPU the measured
    # delta is 0.0 (examples/ab_pallas_layer1.py)
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert np.mean(np.abs(got - ref)) < 1e-3
