"""A/B: fused Pallas layer1 vs the XLA QuantConv path (real TPU, b64).

Parity first (same .mecp int8-static params, same input), then
interleaved slope-chain timing. Round-5 context: layer1 is 1.283 ms of
the 3.45 ms image stack at b64 and runs at ~3x its bandwidth floor on
the XLA path (probe data in ROADMAP.md).

Usage: python examples/ab_pallas_layer1.py [batch ...]
"""
import os
import sys

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCHES = [int(a) for a in sys.argv[1:]] or [64]


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    import bench
    from mec_tpu.models.resnet import Bottleneck
    from mec_tpu.ops.pallas_resnet import layer1_pallas
    from mec_tpu.serving.engine import EmotionEngine
    from mec_tpu.utils import roofline

    engine = EmotionEngine(models_dir=bench.models_dir_or_synthetic())
    iv = engine.image['variables']
    assert engine._image_quant and engine._image_quant_mode == 'static', \
        'needs the int8-static image artifact'
    dtype = engine.compute_dtype

    class L1(nn.Module):
        @nn.compact
        def __call__(self, h):
            for block in range(3):
                h = Bottleneck(64, stride=1, downsample=(block == 0),
                               dtype=dtype, fold_bn=True, quant=True,
                               quant_mode='static',
                               name=f'layer1_{block}')(h)
            return h

    params = {'params': {k: v for k, v in iv['params'].items()
                         if k.startswith('layer1_')}}
    l1_params = {k: v for k, v in params['params'].items()}

    for B in BATCHES:
        x = jnp.asarray(np.abs(np.random.RandomState(0).randn(
            B, 56, 56, 64)).astype(np.float32), dtype)
        x = jax.device_put(x)

        ref = np.asarray(L1().apply(params, x), np.float32)
        got = np.asarray(layer1_pallas(x, l1_params), np.float32)
        err = np.max(np.abs(ref - got))
        rel = err / max(np.max(np.abs(ref)), 1e-9)
        print(f'b{B} parity: max |delta| {err:.3e} (rel {rel:.3e}) '
              f'range [{ref.min():.2f}, {ref.max():.2f}]', flush=True)

        def xla_call(eps):
            return L1().apply(params, x + eps.astype(dtype))

        def pallas_call_(eps):
            return layer1_pallas(x + eps.astype(dtype), l1_params)

        # interleaved A/B, three rounds each
        for rnd in range(3):
            ms_x = roofline.chain_slope_ms(xla_call, reps=2)
            ms_p = roofline.chain_slope_ms(pallas_call_, reps=2)
            print(f'b{B} round {rnd}: XLA {ms_x:.3f} ms  '
                  f'Pallas {ms_p:.3f} ms  ({ms_x / ms_p:.2f}x)',
                  flush=True)


if __name__ == '__main__':
    main()
