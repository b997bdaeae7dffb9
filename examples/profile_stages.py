"""Standalone serving-stage profiler (run on the real TPU, no pytest).

Breaks a 32-batch tri-modal predict into its host/device stages and
times each, to decide what to optimize next. Not part of the test suite.

Usage: python examples/profile_stages.py [batch]
"""

import os
import sys
import time

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPS = int(os.environ.get('REPS', '6'))


def main():
    import bench
    from mec_tpu.config import Config
    from mec_tpu.serving.engine import EmotionEngine
    from mec_tpu.ops import wav as wav_ops
    from mec_tpu.image.preprocess import load_image_uint8
    import jax

    wav_path, img_path, text = bench.prepare_assets('/tmp/mec_bench_assets')
    engine = EmotionEngine(models_dir=bench.models_dir_or_synthetic())
    requests = [{'audio_path': wav_path, 'text': text,
                 'image_path': img_path}] * BATCH
    engine.predict_multimodal_batch(requests)  # warm

    def timeit(label, fn, reps=REPS):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f'{label:34s} {dt:8.1f} ms')
        return out

    print(f'--- per-{BATCH}-batch stage times (serial, amortized) ---')
    waves = timeit('wav decode x%d' % BATCH, lambda: np.stack(
        [wav_ops.load_and_fix_length(wav_path)[0] for _ in range(BATCH)]))
    imgs = timeit('image decode x%d (pooled)' % BATCH,
                  lambda: engine._decode_images([img_path] * BATCH))
    ids_mask = timeit('tokenize x%d' % BATCH,
                      lambda: engine._seq_slice(
                          *engine.bert_tokenizer.encode_batch(
                              [text] * BATCH, Config.MAX_TEXT_LENGTH)))
    w_wire = timeit('audio wire encode', lambda: engine._wire_waves(
        waves, BATCH))
    i_wire = timeit('image wire encode', lambda: engine._wire_image(
        imgs, BATCH))

    ids, mask = ids_mask
    from mec_tpu.serving.engine import _pad_rows
    margs = (engine.speech['variables'], engine.speech['scaler'],
             engine.bert['variables'], engine.image['variables'],
             engine.fusion['variables'])

    def dispatch_only():
        # _put, not _place: mirrors the production dispatch (async
        # device_put of each wire component; see engine._put)
        return engine._trimodal_jit(
            *margs,
            engine._put(w_wire), engine._put(_pad_rows(ids, BATCH)),
            engine._put(_pad_rows(mask, BATCH)), engine._put(i_wire))

    timeit('dispatch (async return)', dispatch_only)

    def dispatch_fetch():
        return np.asarray(dispatch_only())

    timeit('dispatch + upload + fetch', dispatch_fetch)

    # device-resident step (upload excluded)
    dargs = [jax.device_put(x)
             for x in (w_wire, _pad_rows(ids, BATCH),
                       _pad_rows(mask, BATCH), i_wire)]
    np.asarray(engine._trimodal_jit(*margs, *dargs))

    def device_step():
        outs = [engine._trimodal_jit(*margs, *dargs) for _ in range(10)]
        return np.asarray(outs[-1])

    t0 = time.perf_counter()
    device_step()
    dt = (time.perf_counter() - t0) / 10 * 1000
    print(f'{"device step (resident, amortized)":34s} {dt:8.1f} ms')

    timeit('predict_multimodal_batch e2e', lambda:
           engine.predict_multimodal_batch(requests))

    # pipelined, as bench measures
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(4) as pool:
        t0 = time.perf_counter()
        futs = [pool.submit(engine.predict_multimodal_batch, requests)
                for _ in range(REPS * 2)]
        for f in futs:
            f.result()
        dt = time.perf_counter() - t0
    print(f'{"pipelined e2e (4 workers)":34s} '
          f'{dt / (REPS * 2) * 1000:8.1f} ms/batch '
          f'= {BATCH * REPS * 2 / dt:.1f} preds/s')


if __name__ == '__main__':
    main()
