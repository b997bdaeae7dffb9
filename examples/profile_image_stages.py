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
import time
from functools import partial
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

    def chained_ms(apply_fn, params, x):
        @jax.jit
        def run():
            def body(i, c):
                eps = c * jnp.float32(1e-30)
                pk = dict(params['params'])
                pk['conv1'] = dict(pk['conv1'],
                                   kernel=pk['conv1']['kernel'] + eps)
                out = apply_fn({'params': pk}, x)
                s = sum(jnp.sum(le.astype(jnp.float32))
                        for le in jax.tree_util.tree_leaves(out))
                return c + s * jnp.float32(0.0)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        float(run())
        best = float('inf')
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run())
            best = min(best, (time.perf_counter() - t0) / K * 1e3)
        return best

    sizes = (3, 4, 6, 3)
    for B in BATCHES:
        h, w = engine._image_size
        x = jax.device_put(np.random.RandomState(0).randn(
            B, h, w, 3).astype(np.float32))
        print(f'--- batch {B} @{h}px (quant={quant}/{qmode}, '
              f'{K}-chain, min of {REPS}) ---', flush=True)
        prev = 0.0
        for n in range(5):
            model = Truncated(stage_sizes=sizes, n_stages=n)
            ms = chained_ms(model.apply, subset_params(n), x)
            label = 'stem+pool' if n == 0 else f'+layer{n}'
            print(f'{label:10s} cumulative {ms:7.3f} ms   '
                  f'stage delta {ms - prev:7.3f} ms', flush=True)
            prev = ms


if __name__ == '__main__':
    main()
