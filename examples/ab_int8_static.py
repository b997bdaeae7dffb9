"""Interleaved 3-way A/B on the real TPU: bf16 vs int8-dynamic vs
int8-static for the two MXU-bound serving models.

The engine-level A/B (examples/ab_int8_image.py) showed dynamic int8 is
nearly perf-neutral on ResNet50 — the per-example max-abs is a global
cross-tile reduction XLA materializes, costing an extra read of every
activation plus a separate quantize pass. Static calibrated scales
(ops/quant.calibrate_static_scales) let the quantize fuse into the
previous op's epilogue: activations are written once, as int8. This
script measures whether that recovers the probed 1.6-1.7x conv rate
(examples/probe_int8.py), model-only (no wire decode), interleaved in
one tunnel window.

Run standalone on the real TPU: python examples/ab_int8_static.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

ROUNDS = int(os.environ.get('ROUNDS', '4'))
N = int(os.environ.get('REPS', '30'))


def amortized_ms(fn, n=N):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from mec_tpu.models.resnet import ImageEmotionModel
    from mec_tpu.models.bert import BertForSequenceClassification
    from mec_tpu.ops.fold import fold_conv_bn
    from mec_tpu.ops.quant import (quantize_image_params,
                                   quantize_bert_params,
                                   calibrate_static_scales)

    print(f'devices: {jax.devices()}', flush=True)
    rng = np.random.RandomState(0)
    cases = []

    # ---- ResNet50 @224 ----
    live = ImageEmotionModel(dtype=jnp.bfloat16)
    x1 = rng.randn(1, 224, 224, 3).astype(np.float32)
    v = ImageEmotionModel().init(jax.random.PRNGKey(0), x1, train=True)
    folded = fold_conv_bn(jax.tree_util.tree_map(np.asarray, v))
    q = quantize_image_params(folded)
    qs = calibrate_static_scales(
        ImageEmotionModel(dtype=jnp.bfloat16, fold_bn=True, quant=True),
        q, (x1,))
    folded_d = jax.device_put(folded)
    q_d = jax.device_put(q)
    qs_d = jax.device_put(qs)
    img_models = {
        'bf16': (ImageEmotionModel(dtype=jnp.bfloat16, fold_bn=True),
                 folded_d),
        'dyn': (ImageEmotionModel(dtype=jnp.bfloat16, fold_bn=True,
                                  quant=True), q_d),
        'static': (ImageEmotionModel(dtype=jnp.bfloat16, fold_bn=True,
                                     quant=True, quant_mode='static'),
                   qs_d),
    }
    for batch in (32, 64):
        xb = jax.device_put(
            rng.randn(batch, 224, 224, 3).astype(np.float32))
        for name, (model, params) in img_models.items():
            fn = jax.jit(lambda p, x, m=model: m.apply(p, x)[0])
            amortized_ms(lambda f=fn, p=params, x=xb: f(p, x), n=2)
            cases.append((f'resnet b{batch} {name}',
                          lambda f=fn, p=params, x=xb: f(p, x)))
            print(f'compiled resnet b{batch} {name}', flush=True)

    # ---- BERT-base, seq 32 (the serving seq bucket) ----
    ids1 = rng.randint(0, 30522, (1, 32)).astype(np.int32)
    m1 = np.ones_like(ids1)
    bv = BertForSequenceClassification().init(jax.random.PRNGKey(1), ids1,
                                              m1)
    bv = jax.tree_util.tree_map(np.asarray, bv)
    bq = quantize_bert_params(bv)
    bqs = calibrate_static_scales(
        BertForSequenceClassification(dtype=jnp.bfloat16,
                                      gelu_approximate=True, quant=True),
        bq, (ids1, m1))
    bert_models = {
        'bf16': (BertForSequenceClassification(dtype=jnp.bfloat16,
                                               gelu_approximate=True),
                 jax.device_put(bv)),
        'dyn': (BertForSequenceClassification(dtype=jnp.bfloat16,
                                              gelu_approximate=True,
                                              quant=True),
                jax.device_put(bq)),
        'static': (BertForSequenceClassification(
            dtype=jnp.bfloat16, gelu_approximate=True, quant=True,
            quant_mode='static'), jax.device_put(bqs)),
    }
    batch = 64
    idsb = jax.device_put(rng.randint(0, 30522, (batch, 32)).astype(np.int32))
    maskb = jax.device_put(np.ones((batch, 32), np.int32))
    for name, (model, params) in bert_models.items():
        fn = jax.jit(lambda p, i, a, m=model: m.apply(p, i, a)[0])
        amortized_ms(lambda f=fn, p=params: f(p, idsb, maskb), n=2)
        cases.append((f'bert b{batch} {name}',
                      lambda f=fn, p=params: f(p, idsb, maskb)))
        print(f'compiled bert b{batch} {name}', flush=True)

    results = {}
    for r in range(ROUNDS):
        for label, fn in cases:
            ms = amortized_ms(fn)
            results.setdefault(label, []).append(ms)
            print(f'round {r} {label}: {ms:.2f} ms', flush=True)

    print(flush=True)
    for label, ms in results.items():
        print(f'{label}: min {min(ms):.2f} ms  median '
              f'{sorted(ms)[len(ms) // 2]:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
