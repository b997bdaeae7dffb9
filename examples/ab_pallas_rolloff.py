"""A/B: Pallas rolloff binary search vs the XLA cumsum path (real TPU).

Round-5 attack on the 0.46 ms rolloff stage: 11 masked-sum probes per
frame over VMEM-resident rows (ops/pallas_rolloff.py) vs the chunked
triangular-matmul cumsum. Parity on real spectrograms first, then
interleaved slope-chain timing of the isolated stage and of the whole
serving frontend both ways.

Usage: python examples/ab_pallas_rolloff.py [batch ...]
"""
import os
import sys

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCHES = [int(a) for a in sys.argv[1:]] or [64]


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    from mec_tpu.config import Config
    from mec_tpu.ops import audio_features as af
    from mec_tpu.utils import roofline

    rng = np.random.RandomState(0)
    for B in BATCHES:
        t = np.arange(66150) / 22050.0
        waves = np.stack([
            (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)
             + 0.1 * np.sin(2 * np.pi * (300 + 80 * i) * t)
             + 0.02 * rng.randn(len(t))).astype(np.float32)
            for i in range(B)])
        mag, _ = af.hop_spectrograms(jnp.asarray(waves))
        mag = jax.device_put(np.asarray(mag))

        ref = np.asarray(af.spectral_rolloff_mean(mag, use_pallas=False))
        got = np.asarray(af.spectral_rolloff_mean(mag, use_pallas=True))
        print(f'b{B} parity: max |delta| {np.max(np.abs(ref - got)):.6f} '
              f'Hz (mean over {af.N_FRAMES} frames; one flipped bin '
              f'would be ~{af.SR / 2 / 1024 / af.N_FRAMES:.3f})',
              flush=True)

        def stage_xla(eps):
            return af.spectral_rolloff_mean(mag + eps, use_pallas=False)

        def stage_pal(eps):
            return af.spectral_rolloff_mean(mag + eps, use_pallas=True)

        for rnd in range(3):
            a = roofline.chain_slope_ms(stage_xla, reps=2)
            b = roofline.chain_slope_ms(stage_pal, reps=2)
            print(f'b{B} rolloff round {rnd}: XLA {a:.3f} ms  '
                  f'Pallas {b:.3f} ms  ({a / b:.2f}x)', flush=True)

        w = jax.device_put(waves)

        def fe(up):
            def call(eps):
                Config.PALLAS_ROLLOFF = up
                return af.audio_features_56(w + eps, use_pallas=True)
            return call

        for rnd in range(2):
            Config.PALLAS_ROLLOFF = False
            a = roofline.chain_slope_ms(fe(False), reps=2)
            Config.PALLAS_ROLLOFF = True
            b = roofline.chain_slope_ms(fe(True), reps=2)
            print(f'b{B} frontend round {rnd}: XLA-rolloff {a:.3f} ms  '
                  f'Pallas-rolloff {b:.3f} ms', flush=True)


if __name__ == '__main__':
    main()
