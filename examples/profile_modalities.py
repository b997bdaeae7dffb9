"""Per-modality device-step profiler (run on the real TPU, standalone).

Times each modality's jitted graph and the fused tri-modal graph with
inputs device-resident (amortized: N async dispatches, one sync), to
show where the fused step's device time goes. Complements
profile_stages.py, which decomposes the host/tunnel side.

Usage: python examples/profile_modalities.py [batch ...]
"""

import os
import sys
import time

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCHES = [int(a) for a in sys.argv[1:]] or [32, 64]
N = int(os.environ.get('REPS', '30'))


def amortized_ms(fn, n=N):
    np.asarray(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    import bench
    import jax
    from mec_tpu.config import Config
    from mec_tpu.image.preprocess import load_image_uint8
    from mec_tpu.ops import wav as wav_ops
    from mec_tpu.serving.engine import EmotionEngine, _pad_rows

    wav_path, img_path, text = bench.prepare_assets('/tmp/mec_bench_assets')
    engine = EmotionEngine(models_dir=bench.models_dir_or_synthetic())
    margs = (engine.speech['variables'], engine.speech['scaler'],
             engine.bert['variables'], engine.image['variables'],
             engine.fusion['variables'])

    wave = wav_ops.load_and_fix_length(wav_path)[0]
    img = load_image_uint8(img_path, engine._image_size)

    for B in BATCHES:
        waves = engine._wire_waves(np.repeat(wave[None], B, 0), B)
        ids, mask = engine._seq_slice(*engine.bert_tokenizer.encode_batch(
            [text] * B, Config.MAX_TEXT_LENGTH))
        imgs = engine._wire_image(np.repeat(img[None], B, 0), B)
        d = lambda x: jax.device_put(x)  # noqa: E731
        w_d, ids_d, mask_d, img_d = (d(waves), d(_pad_rows(ids, B)),
                                     d(_pad_rows(mask, B)), d(imgs))
        feats_d = d(np.zeros((B, 64), np.float32))
        cls_d = d(np.zeros((B, 768), np.float32))
        ifeat_d = d(np.zeros((B, 512), np.float32))
        probs_d = d(np.full((B, 7), 1 / 7, np.float32))

        rows = [
            ('speech (frontend+DNN)', lambda: engine._speech_jit(
                engine.speech['variables'], engine.speech['scaler'], w_d)),
            (f'bert seq{ids.shape[1]}', lambda: engine._bert_jit(
                engine.bert['variables'], ids_d, mask_d)),
            ('image (decode+resnet50)', lambda: engine._image_jit(
                engine.image['variables'], img_d)),
            ('fusion', lambda: engine._fusion_jit(
                engine.fusion['variables'], feats_d, cls_d, ifeat_d,
                probs_d, probs_d, probs_d)),
            ('TRIMODAL fused', lambda: engine._trimodal_jit(
                *margs, w_d, ids_d, mask_d, img_d)),
        ]
        print(f'--- batch {B} (device-resident, amortized over {N}) ---')
        total = 0.0
        for label, fn in rows:
            ms = amortized_ms(fn)
            if label != 'TRIMODAL fused':
                total += ms
            print(f'{label:26s} {ms:7.2f} ms   {B / ms * 1000:8.0f} preds/s')
        print(f'{"sum of parts":26s} {total:7.2f} ms')


if __name__ == '__main__':
    main()
