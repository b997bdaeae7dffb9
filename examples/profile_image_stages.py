"""Per-stage ResNet50 serving-cost profile (run on the real TPU).

The image stage is the fused tri-modal step's largest slice (4.03 ms of
7.51 ms at b64, chain-measured round 4, ~34% of the int8 peak against a
~1.7 ms theoretical floor). This chain-times truncated stacks —
stem+pool, +layer1, +layer2, +layer3, +layer4 — applied with the
ENGINE's own folded+quantized params (same names, same numerics), so
successive differences localize the cost per stage: are the
high-resolution early layers (56x56, bandwidth-heavy) or the deep tail
the expensive part?

Usage: python examples/profile_image_stages.py [batch ...]
"""

import os
import sys
from typing import Sequence

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCHES = [int(a) for a in sys.argv[1:]] or [64]
K = int(os.environ.get('CHAIN', '100'))
REPS = int(os.environ.get('REPS', '3'))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import bench
    from mec_tpu.models.resnet import Bottleneck
    from mec_tpu.serving.engine import EmotionEngine

    engine = EmotionEngine(models_dir=bench.models_dir_or_synthetic())
    iv = engine.image['variables']
    assert 'conv1' in iv['params'], 'ResNet50 artifact required'
    quant = engine._image_quant
    qmode = engine._image_quant_mode
    dtype = engine.compute_dtype

    class Truncated(nn.Module):
        """Stem + the first `n_stages` ResNet50 stages, no head —
        param names match ImageEmotionModel exactly."""
        stage_sizes: Sequence[int]
        n_stages: int

        @nn.compact
        def __call__(self, x):
            x = x.astype(dtype)
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=True,
                        dtype=dtype, name='conv1')(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            for stage in range(self.n_stages):
                features = 64 * (2 ** stage)
                for block in range(self.stage_sizes[stage]):
                    stride = 2 if (stage > 0 and block == 0) else 1
                    x = Bottleneck(features, stride=stride,
                                   downsample=(block == 0), dtype=dtype,
                                   fold_bn=True, quant=quant,
                                   quant_mode=qmode,
                                   name=f'layer{stage + 1}_{block}')(x)
            return x.astype(jnp.float32)

    def subset_params(n_stages):
        keep = {'conv1'}
        keep |= {k for k in iv['params']
                 if any(k.startswith(f'layer{s + 1}_')
                        for s in range(n_stages))}
        return {'params': {k: v for k, v in iv['params'].items()
                           if k in keep}}

    from mec_tpu.utils import roofline

    def stage_call(apply_fn, params, x):
        def call(eps):
            pk = dict(params['params'])
            pk['conv1'] = dict(pk['conv1'],
                               kernel=pk['conv1']['kernel'] + eps)
            return apply_fn({'params': pk}, x)
        return call

    try:
        hbm_gbps = roofline.measure_hbm_gbps()
        print(f'measured achievable HBM stream: {hbm_gbps:.1f} GB/s '
              f'(paper peak {roofline.V5E_HBM_PAPER_GBPS})', flush=True)
    except Exception as e:
        hbm_gbps = roofline.V5E_HBM_PAPER_GBPS
        print(f'HBM probe failed ({e}); using paper peak', flush=True)

    sizes = (3, 4, 6, 3)
    for B in BATCHES:
        h, w = engine._image_size
        x = jax.device_put(np.random.RandomState(0).randn(
            B, h, w, 3).astype(np.float32))
        print(f'--- batch {B} @{h}px (quant={quant}/{qmode}, '
              f'slope {K // 2}->{K * 2}-chain, min of {REPS}) ---',
              flush=True)
        prev = prev_traffic = 0.0
        for n in range(5):
            model = Truncated(stage_sizes=sizes, n_stages=n)
            params = subset_params(n)
            ms = roofline.chain_slope_ms(
                stage_call(model.apply, params, x),
                k1=K // 2, k2=K * 2, reps=REPS)
            tr = roofline.hbm_traffic_bytes(
                jax.jit(model.apply).lower(params, x).compile())
            label = 'stem+pool' if n == 0 else f'+layer{n}'
            d_ms = ms - prev
            d_tr = tr['model_bytes'] - prev_traffic
            bw_floor_ms = d_tr / (hbm_gbps * 1e9) * 1e3
            print(f'{label:10s} cum {ms:7.3f} ms  delta {d_ms:6.3f} ms | '
                  f'stage traffic {d_tr / 1e6:7.1f} MB '
                  f'(cum temp {tr["temp_bytes"] / 1e6:6.1f} MB) '
                  f'bw-floor {bw_floor_ms:5.3f} ms '
                  f'({100 * bw_floor_ms / max(d_ms, 1e-9):5.1f}% of stage)',
                  flush=True)
            prev, prev_traffic = ms, tr['model_bytes']


if __name__ == '__main__':
    main()
