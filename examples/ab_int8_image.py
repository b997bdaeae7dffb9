"""Interleaved A/B: int8-quantized vs bf16 image stage on the real TPU.

Builds two bf16 engines in ONE process — MEC_IMAGE_INT8 on and off —
and alternates amortized device-step measurements between them in the
same tunnel window (the only A/B method that survives this link's
2-3x phase swings; BASELINE.md). Reports the image stage alone and the
fused tri-modal step at batch 32 and 64.

Run standalone on the real TPU: python examples/ab_int8_image.py
"""

import os
import sys
import time

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
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


def device_args(engine, batch):
    import jax
    from bench import prepare_assets
    from mec_tpu.config import Config
    from mec_tpu.image.preprocess import load_image_uint8
    from mec_tpu.ops import wav as wav_ops
    wav_path, img_path, text = prepare_assets('/tmp/mec_bench_assets')
    waves = engine._wire_waves(np.repeat(
        wav_ops.load_and_fix_length(wav_path)[0][None], batch, 0), batch)
    ids, mask = engine._seq_slice(*engine.bert_tokenizer.encode_batch(
        [text] * batch, Config.MAX_TEXT_LENGTH))
    img = engine._wire_image(np.repeat(
        load_image_uint8(img_path, engine._image_size)[None], batch, 0),
        batch)
    return [jax.device_put(x) for x in (waves, ids, mask, img)]


def main():
    from bench import models_dir_or_synthetic
    from mec_tpu.config import Config
    from mec_tpu.serving.engine import EmotionEngine

    models_dir = models_dir_or_synthetic()
    engines = {}
    for name, flag in (('int8', True), ('bf16', False)):
        Config.IMAGE_INT8 = flag
        engines[name] = EmotionEngine(models_dir=models_dir)
        print(f'{name}: folded={engines[name]._image_folded} '
              f'quant={engines[name]._image_quant}', flush=True)
    assert engines['int8']._image_quant and not engines['bf16']._image_quant

    cases = []
    for batch in (32, 64):
        for name, eng in engines.items():
            dargs = device_args(eng, batch)
            margs = (eng.speech['variables'], eng.speech['scaler'],
                     eng.bert['variables'], eng.image['variables'],
                     eng.fusion['variables'])
            img_fn = (lambda e=eng, d=dargs:
                      e._image_jit(e.image['variables'], d[3]))
            tri_fn = lambda e=eng, m=margs, d=dargs: e._trimodal_jit(*m, *d)
            amortized_ms(img_fn, n=2)  # compile both graphs up front
            amortized_ms(tri_fn, n=2)
            cases.append((batch, name, img_fn, tri_fn))

    results = {}
    for r in range(ROUNDS):
        for batch, name, img_fn, tri_fn in cases:
            mi = amortized_ms(img_fn)
            mt = amortized_ms(tri_fn)
            results.setdefault((batch, name), []).append((mi, mt))
            print(f'round {r} b{batch} {name}: image {mi:.2f} ms '
                  f'trimodal {mt:.2f} ms', flush=True)

    print()
    for batch in (32, 64):
        row = {}
        for name in ('bf16', 'int8'):
            mis, mts = zip(*results[(batch, name)])
            row[name] = (min(mis), min(mts))
            print(f'b{batch} {name}: image {min(mis):.2f} ms  '
                  f'trimodal {min(mts):.2f} ms '
                  f'({batch / min(mts) * 1e3:.0f} preds/s)', flush=True)
        print(f'b{batch} speedup: image '
              f'{row["bf16"][0] / row["int8"][0]:.2f}x  trimodal '
              f'{row["bf16"][1] / row["int8"][1]:.2f}x', flush=True)


if __name__ == '__main__':
    main()
