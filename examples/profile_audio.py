"""Audio-frontend sub-stage profiler (run on the real TPU, no pytest).

The speech stage is the fused tri-modal step's lowest-MFU component
(BENCH_r03: 2.1% at b32) — this breaks audio_features_56 into its
sub-stages and times each with the fori_loop-chain method (the one
that survives the axon tunnel: K data-dependent iterations inside ONE
jit, one scalar fetch, min over reps — per-dispatch measurements here
drown in ~1 ms dispatch overhead and big-output fetches pay the
17 MB/230 ms tunnel tax). FLOPs/bytes come from XLA cost_analysis of
the UNCHAINED stage so each can be labeled compute- vs bandwidth-bound.

Usage: python examples/profile_audio.py [batch ...]
"""

import os
import sys

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BATCHES = [int(a) for a in sys.argv[1:]] or [32, 64]
K = int(os.environ.get('CHAIN', '30'))
REPS = int(os.environ.get('REPS', '4'))


def chained_ms(f, args, k=K, reps=REPS):
    """Time f(*args) via the chain-SLOPE method (roofline.py): the
    round-4 single-chain version divided the ~29 ms tunnel fetch RTT
    into every per-iteration number (~1 ms at the old K=30 default) —
    fatal for these sub-ms stages. The DCE/hoist/splat traps documented
    in roofline.py apply unchanged."""
    from mec_tpu.utils import roofline

    def call(eps):
        perturbed = (args[0] + eps,) + tuple(args[1:])
        return f(*perturbed)

    return roofline.chain_slope_ms(call, k1=k, k2=4 * k, reps=reps)


def costs(f, args):
    import jax
    c = jax.jit(f).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get('flops', 0.0)), float(c.get('bytes accessed', 0.0))


def main():
    import jax
    from mec_tpu.ops import audio_features as af

    rng = np.random.RandomState(0)
    for B in BATCHES:
        y = (0.3 * np.sin(np.arange(af.N_SAMPLES) / 17.0)
             + 0.05 * rng.randn(af.N_SAMPLES)).astype(np.float32)
        yb = jax.device_put(np.repeat(y[None], B, 0))

        mag_np, P_np = (np.asarray(x)
                        for x in jax.jit(af.hop_spectrograms)(yb))
        mag_d, P_d = jax.device_put(mag_np), jax.device_put(P_np)
        tun_d = jax.device_put(np.asarray(
            jax.jit(af.estimate_tuning_from_power)(P_d)))

        def median_only(P):
            pitches, mags, _ = af.piptrack_candidates(P)
            pm = pitches > 0
            return af._masked_median(mags.reshape(B, -1),
                                     pm.reshape(B, -1))

        stages = [
            ('hop_spectrograms', af.hop_spectrograms, (yb,)),
            ('mfcc_mean', af.mfcc_mean_from_power, (P_d,)),
            ('tuning_estimate', af.estimate_tuning_from_power, (P_d,)),
            ('tuning.median_only', median_only, (P_d,)),
            ('chroma_mean', af.chroma_mean_from_power, (P_d, tun_d)),
            ('centroid', af.spectral_centroid_mean, (mag_d,)),
            ('rolloff', af.spectral_rolloff_mean, (mag_d,)),
            ('zcr', af.zcr_mean_hops, (yb,)),
            ('rms', af.rms_mean_hops, (yb,)),
            ('FULL xla (parity path)', af.audio_features_56, (yb,)),
            ('FULL serving (pallas)',
             lambda y: af.audio_features_56(y, use_pallas=True), (yb,)),
        ]
        print(f'--- batch {B} ({K}-chain in one jit, min of {REPS}) ---',
              flush=True)
        total = 0.0
        for name, fn, args in stages:
            ms = chained_ms(fn, args)
            try:
                fl, by = costs(fn, args)
            except Exception:
                fl = by = 0.0
            tfps = fl / (ms * 1e-3) / 1e12
            gbps = by / (ms * 1e-3) / 1e9
            if not name.startswith(('FULL', 'tuning.')):
                total += ms
            print(f'{name:24s} {ms:7.3f} ms  {tfps:7.2f} TF/s '
                  f'{gbps:7.1f} GB/s  ({fl / 1e9:.2f} GF, '
                  f'{by / 1e6:.1f} MB)', flush=True)
        print(f'{"sum of parts":24s} {total:7.3f} ms', flush=True)


if __name__ == '__main__':
    main()
