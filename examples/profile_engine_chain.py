"""Chain-timed engine-stage profiler (run on the real TPU, no pytest).

Times the engine's compiled serving graphs (speech/BERT/image/fused
tri-modal) with the fori_loop-chain method: K data-dependent
iterations inside ONE jit, one scalar fetch. This is DEVICE-ONLY time —
the per-dispatch measurements bench.py's stage section used include
~0.9 ms of host dispatch overhead per call through the axon tunnel
(measured round 4: the serving audio frontend is 1.01 ms device-time
at b64 where the per-dispatch method said 2.31 ms at b32), which in
pipelined serving overlaps device execution.

Usage: python examples/profile_engine_chain.py [batch ...]
"""

import os
import sys

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCHES = [int(a) for a in sys.argv[1:]] or [32, 64]
K = int(os.environ.get('CHAIN', '100'))
REPS = int(os.environ.get('REPS', '3'))


def chained_ms(call_with_eps, k=K, reps=REPS):
    """Time a stage via the chain-SLOPE method (mec_tpu/utils/roofline):
    (wall(k)-wall(k//4))/(k-k//4) cancels the ~29 ms tunnel fetch RTT a
    single chain divides into every per-iteration number (~0.3 ms at
    the old K=100). The DCE/hoist/splat traps are documented in
    roofline.py — the epsilon must perturb an input-side leaf and the
    carry must reduce EVERY output leaf."""
    from mec_tpu.utils import roofline
    return roofline.chain_slope_ms(call_with_eps, k1=max(k // 4, 10),
                                   k2=k, reps=reps)


def main():
    import jax
    import bench
    from mec_tpu.config import Config
    from mec_tpu.image.preprocess import load_image_uint8
    from mec_tpu.ops import wav as wav_ops
    from mec_tpu.serving.engine import EmotionEngine

    wav_path, img_path, text = bench.prepare_assets('/tmp/mec_bench_assets')
    engine = EmotionEngine(models_dir=bench.models_dir_or_synthetic())

    for B in BATCHES:
        waves = engine._wire_waves(np.repeat(
            wav_ops.load_and_fix_length(wav_path)[0][None], B, 0), B)
        ids, mask = engine._seq_slice(*engine.bert_tokenizer.encode_batch(
            [text] * B, Config.MAX_TEXT_LENGTH))
        img = engine._wire_image(np.repeat(
            load_image_uint8(img_path, engine._image_size)[None], B, 0), B)
        w_d, ids_d, mask_d, img_d = [jax.device_put(x)
                                     for x in (waves, ids, mask, img)]
        sv, (smean, sscale) = engine.speech['variables'], \
            engine.speech['scaler']

        def perturb_leaf(tree, path, eps):
            """Copy `tree` with tree[path...] += eps. The perturbed leaf
            must feed the ENTIRE graph (an input-side leaf): perturbing
            an output-side leaf (e.g. the classifier bias) leaves the
            rest of the body loop-invariant and XLA hoists it out of
            the chain — measured: 'trimodal' timed faster than its own
            image stage."""
            def rebuild(t, i):
                if i == len(path) - 1:
                    return dict(t, **{path[i]: t[path[i]] + eps})
                return dict(t, **{path[i]: rebuild(t[path[i]], i + 1)})
            return rebuild(tree, 0)

        bv, iv = engine.bert['variables'], engine.image['variables']
        stem = ('conv_stem' if 'conv_stem' in iv['params'] else 'conv1')

        def perturb_wire(w, eps):
            # pcm12 wire = (packed_u8, scale f32); float wire = array
            if isinstance(w, tuple):
                return (w[0], w[1] + eps)
            return w + eps

        stages = {
            'speech_stage': lambda eps: engine._speech_jit(
                sv, (smean, sscale), perturb_wire(w_d, eps)),
            'bert_stage': lambda eps: engine._bert_jit(
                perturb_leaf(bv, ('params', 'position_embeddings',
                                  'embedding'), eps), ids_d, mask_d),
            'image_stage': lambda eps: engine._image_jit(
                perturb_leaf(iv, ('params', stem, 'kernel'), eps),
                img_d),
            'trimodal_fused': lambda eps: engine._trimodal_jit(
                sv, (smean, sscale),
                perturb_leaf(bv, ('params', 'position_embeddings',
                                  'embedding'), eps),
                perturb_leaf(iv, ('params', stem, 'kernel'), eps),
                engine._fusion_dispatch_vars,
                perturb_wire(w_d, eps), ids_d, mask_d, img_d),
        }
        print(f'--- batch {B} ({K}-chain, device-only, min of {REPS}) ---',
              flush=True)
        for name, fn in stages.items():
            ms = chained_ms(fn)
            print(f'{name:16s} {ms:7.3f} ms  '
                  f'({B / ms * 1e3:,.0f} preds/s)', flush=True)


if __name__ == '__main__':
    main()
