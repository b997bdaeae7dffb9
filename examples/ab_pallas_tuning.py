"""A/B: batched Pallas tuning selection vs the XLA path (real TPU).

Round-5 attempt at ROADMAP item 8's reserved shape: eight clips per
grid cell, candidates VMEM-resident across the 32 median passes + 101
histogram edge counts. Parity on real spectrogram batches first, then
interleaved slope-chain timing of the WHOLE estimator both ways, plus
the full frontend both ways.

Usage: python examples/ab_pallas_tuning.py [batch ...]
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
    import jax.numpy as jnp

    from mec_tpu.ops import audio_features as af
    from mec_tpu.utils import roofline

    rng = np.random.RandomState(0)
    for B in BATCHES:
        # realistic inputs: tonal mixtures + noise through the real
        # frontend DFT, so candidate counts/ties look like production
        t = np.arange(66150) / 22050.0
        waves = np.stack([
            (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)
             + 0.1 * np.sin(2 * np.pi * (300 + 80 * i) * t)
             + 0.02 * rng.randn(len(t))).astype(np.float32)
            for i in range(B)])
        _, P = af.hop_spectrograms(jnp.asarray(waves))
        P = jax.device_put(np.asarray(P))

        ref = np.asarray(af.estimate_tuning_from_power(
            P, use_pallas=False))
        got = np.asarray(af.estimate_tuning_from_power(
            P, use_pallas=True))
        n_diff = int(np.sum(ref != got))
        print(f'b{B} parity: {n_diff}/{B} clips differ '
              f'(max |delta| {np.max(np.abs(ref - got)):.4f})', flush=True)

        def xla_call(eps):
            return af.estimate_tuning_from_power(P + eps,
                                                 use_pallas=False)

        def pallas_call_(eps):
            return af.estimate_tuning_from_power(P + eps,
                                                 use_pallas=True)

        for rnd in range(3):
            a = roofline.chain_slope_ms(xla_call, reps=2)
            b = roofline.chain_slope_ms(pallas_call_, reps=2)
            print(f'b{B} tuning round {rnd}: XLA {a:.3f} ms  '
                  f'Pallas {b:.3f} ms  ({a / b:.2f}x)', flush=True)

        w = jax.device_put(waves)

        # frontend-level A/B: same hop-slab serving frontend, tuning
        # selection routed through each path via the explicit arg
        def fe_xla(eps):
            return _frontend(w + eps, False)

        def fe_pal(eps):
            return _frontend(w + eps, True)

        def _frontend(y, up):
            mag, Pw = af.hop_spectrograms(y)
            from mec_tpu.ops import pallas_kernels as pk
            mfcc = pk.mfcc_mean_pallas(Pw)
            tun = af.estimate_tuning_from_power(Pw, use_pallas=up)
            chroma = af.chroma_mean_from_power(Pw, tuning=tun)
            spectral = jnp.stack(
                [af.zcr_mean_hops(y), af.spectral_centroid_mean(mag),
                 af.spectral_rolloff_mean(mag), af.rms_mean_hops(y)],
                axis=-1)
            return jnp.concatenate([mfcc, chroma, spectral], axis=-1)

        for rnd in range(2):
            a = roofline.chain_slope_ms(fe_xla, reps=2)
            b = roofline.chain_slope_ms(fe_pal, reps=2)
            print(f'b{B} frontend round {rnd}: XLA-tuning {a:.3f} ms  '
                  f'Pallas-tuning {b:.3f} ms', flush=True)


if __name__ == '__main__':
    main()
