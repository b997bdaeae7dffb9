"""Freeze REAL-library golden vectors for the parity tests.

This environment ships neither librosa nor torchvision (no network), so
the audio-frontend and ResNet50 parity tests assert against independent
in-repo oracles (tests/librosa_ref.py, tests/torch_oracles.py). That is
strong but not conclusive evidence — a shared misreading of upstream
semantics would pass (round-1 VERDICT item 3/4).

Run THIS script in any environment where the real libraries install:

    pip install librosa==0.10.0 torch torchvision
    python tests/make_goldens.py            # writes tests/goldens/*.npz

and commit the resulting tests/goldens/ directory. The test suite picks
the goldens up automatically (tests skip when absent):

- tests/test_audio_frontend.py::TestRealLibrosaGoldens
- tests/test_model_parity.py  (resnet50_goldens test)

The synthetic inputs are generated HERE, deterministically, with the
same constructions the tests use — no audio/image assets needed.
"""

from __future__ import annotations

import os

import numpy as np

SR = 22050
N_SAMPLES = SR * 3
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'goldens')


def golden_signals() -> dict:
    """Deterministic test waveforms (identical to the set in
    tests/test_audio_frontend.py::_signals, plus a speechlike chirp)."""
    rng = np.random.RandomState(0)
    t = np.arange(N_SAMPLES) / SR
    tone = (0.4 * np.sin(2 * np.pi * 220.0 * t)
            + 0.2 * np.sin(2 * np.pi * 452.3 * t)
            + 0.05 * rng.randn(N_SAMPLES)).astype(np.float32)
    noise = (0.1 * rng.randn(N_SAMPLES)).astype(np.float32)
    quiet = np.zeros(N_SAMPLES, dtype=np.float32)
    quiet[1000:1200] = 0.01
    chirp = (0.3 * np.sin(2 * np.pi * (120.0 + 80.0 * t) * t)
             ).astype(np.float32)
    return {'tone': tone, 'noise': noise, 'quiet': quiet, 'chirp': chirp}


def freeze_librosa() -> str:
    """56-dim feature vectors via REAL librosa, with exactly the calls
    the reference makes (reference preprocessing/audio_preprocessing.py:
    22-46: mfcc 40 + chroma_stft 12 + [zcr, centroid, rolloff, rms])."""
    import librosa  # noqa: F401  (the whole point)
    out = {}
    for name, y in golden_signals().items():
        mfcc = np.mean(
            librosa.feature.mfcc(y=y, sr=SR, n_mfcc=40).T, axis=0)
        chroma = np.mean(
            librosa.feature.chroma_stft(y=y, sr=SR).T, axis=0)
        zcr = float(np.mean(librosa.feature.zero_crossing_rate(y)))
        cent = float(np.mean(librosa.feature.spectral_centroid(y=y, sr=SR)))
        roll = float(np.mean(librosa.feature.spectral_rolloff(y=y, sr=SR)))
        rms = float(np.mean(librosa.feature.rms(y=y)))
        out[name] = np.concatenate(
            [mfcc, chroma, np.array([zcr, cent, roll, rms])]
        ).astype(np.float64)
    path = os.path.join(GOLDEN_DIR, 'librosa_features.npz')
    np.savez(path, __librosa_version__=np.array(librosa.__version__), **out)
    return path


def freeze_torchvision() -> str:
    """Real torchvision ResNet50 (IMAGENET1K_V2) logits + avgpool
    features on deterministic inputs, plus the state-dict key list, so
    convert/torch_pt.py's naming and the V1.5 stride placement are
    checked against the real thing."""
    import torch
    import torchvision
    model = torchvision.models.resnet50(weights='IMAGENET1K_V2')
    model.eval()
    rng = np.random.RandomState(7)
    x = rng.rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        feats = torch.nn.Sequential(
            *list(model.children())[:-1])(xt).flatten(1)
        logits = model(xt)
    path = os.path.join(GOLDEN_DIR, 'resnet50.npz')
    np.savez(path,
             input=x,
             logits=logits.numpy(),
             pool_features=feats.numpy(),
             state_keys=np.array(sorted(model.state_dict().keys())),
             __torchvision_version__=np.array(torchvision.__version__))
    # also save the full fp32 state dict for an end-to-end convert test
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez(os.path.join(GOLDEN_DIR, 'resnet50_state.npz'), **sd)
    return path


def adversarial_signals() -> dict:
    """Signals that DISAMBIGUATE the four at-risk librosa-0.10 semantics
    (round-2 VERDICT item 3): each is constructed so the plausible
    *alternative* reading of the upstream docs yields a visibly
    different 56-dim feature vector. See
    tests/test_semantics_disambiguation.py for the readings.
    """
    t = np.arange(N_SAMPLES) / SR
    # (1) chroma tuning estimator: a tone detuned +0.235 semitones off
    # the A440 grid (mid-histogram-bin at resolution 0.01; the 2x
    # harmonic shares the residual exactly). tuning=0 (no estimation)
    # shifts every chroma filter center.
    f_detuned = 27.5 * 2.0 ** ((49 + 0.235) / 12.0)  # ~446 Hz
    detuned = (0.4 * np.sin(2 * np.pi * f_detuned * t)
               + 0.15 * np.sin(2 * np.pi * 2 * f_detuned * t)
               ).astype(np.float32)
    # (2) power_to_db ref/top_db: 0.5 s of loud tone then near-silence.
    # Global-max top_db clamp floors the quiet frames at max-80 dB;
    # a per-frame clamp (the wrong reading) leaves them ~-200 dB.
    loudquiet = (0.5 * np.sin(2 * np.pi * 880.0 * t)
                 * (t < 0.5)).astype(np.float32)
    loudquiet += 1e-7 * np.sin(2 * np.pi * 123.0 * t).astype(np.float32)
    # (3) rolloff boundary: 94%/6% energy split between 300 Hz and
    # 6 kHz puts the 85% |S|-cumsum crossing 23% into bin 557 (measured
    # scan; stable across all interior frames, safely off both bin
    # edges) -> first-bin>=threshold (librosa) reads 5,997 Hz while
    # sub-bin interpolation (the wrong reading) is ~8.3 Hz lower.
    twotone = (np.sqrt(0.94) * 0.4 * np.sin(2 * np.pi * 300.0 * t)
               + np.sqrt(0.06) * 0.4 * np.sin(2 * np.pi * 6000.0 * t)
               ).astype(np.float32)
    # (4) zcr threshold edge: alternating-sign samples BELOW the 1e-10
    # clip threshold. librosa zeroes them (signbit(0)=False -> zcr 0);
    # skipping the clip (the wrong reading) counts a crossing at every
    # sample (zcr ~1).
    sub = np.full(N_SAMPLES, 5e-11, np.float32)
    sub[1::2] *= -1.0
    return {'detuned_tone': detuned, 'loudquiet': loudquiet,
            'twotone_rolloff': twotone, 'subthreshold_zcr': sub}


def freeze_semantics(force_oracle: bool = False) -> str:
    """56-dim vectors for the adversarial signals ->
    tests/goldens/semantics_vectors.npz.

    In this offline image the fixture is written from the in-repo
    numpy oracle (source=librosa_ref); running this script where
    librosa installs overwrites it from the REAL library
    (source=librosa-<version>), falsifying any shared misreading across
    all four frontend implementations at once — they all assert against
    this ONE file (tests/test_semantics_disambiguation.py).
    """
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out = {}
    source = 'librosa_ref'
    use_librosa = False
    if not force_oracle:
        try:
            import librosa
            source = f'librosa-{librosa.__version__}'
            use_librosa = True
        except ImportError:
            pass
    for name, y in adversarial_signals().items():
        if use_librosa:
            import librosa
            mfcc = np.mean(
                librosa.feature.mfcc(y=y, sr=SR, n_mfcc=40).T, axis=0)
            chroma = np.mean(
                librosa.feature.chroma_stft(y=y, sr=SR).T, axis=0)
            zcr = float(np.mean(librosa.feature.zero_crossing_rate(y)))
            cent = float(np.mean(
                librosa.feature.spectral_centroid(y=y, sr=SR)))
            roll = float(np.mean(
                librosa.feature.spectral_rolloff(y=y, sr=SR)))
            rms = float(np.mean(librosa.feature.rms(y=y)))
            vec = np.concatenate(
                [mfcc, chroma, np.array([zcr, cent, roll, rms])])
        else:
            from tests.librosa_ref import features_56
            vec = features_56(y)
        out[name] = np.asarray(vec, np.float64)
    path = os.path.join(GOLDEN_DIR, 'semantics_vectors.npz')
    np.savez(path, __source__=np.array(source), **out)
    return path


def _arch_input(shape, seed=11):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def freeze_arch_traces(force_oracle: bool = False) -> str:
    """Seeded-weight per-stage activation traces of ResNet50 and
    MobileNetV2 -> tests/goldens/arch_traces.npz.

    The in-repo torch oracles are hand transcriptions of torchvision
    (tests/torch_oracles.py) — the one untested link in the image-parity
    chain (round-2 VERDICT item 8). This fixture pins their operator
    graphs: weights come from tests.torch_oracles.seeded_state_dict (a
    pure function of state_dict key names/shapes, identical across the
    oracle and the real torchvision model), so the traces differ iff the
    graphs differ — e.g. a wrong V1-vs-V1.5 downsample stride placement
    (match: reference model_training/train_image_model.py:48-67 uses
    torchvision resnet50).

    In THIS env the fixture is written from the oracles (source=oracle);
    run this script where torchvision installs and the same file is
    overwritten from the real models (source=torchvision). The pinning
    test (tests/test_model_parity.py::TestArchTraceFixture) always
    asserts the oracles reproduce the fixture, so a torchvision-sourced
    run falsifies any transcription error in one place.
    """
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.torch_oracles import (OracleMobileNetV2, OracleResNet50,
                                     mobilenet_v2_stage_trace,
                                     resnet50_stage_trace,
                                     seeded_state_dict)
    source = 'oracle'
    resnet, mobilenet = OracleResNet50(), OracleMobileNetV2()
    if not force_oracle:
        try:
            import torchvision
            resnet = torchvision.models.resnet50()
            mobilenet = torchvision.models.mobilenet_v2()
            source = f'torchvision-{torchvision.__version__}'
        except ImportError:
            pass
    out = {'__source__': np.array(source)}
    for tag, model, trace_fn in (
            ('resnet50', resnet, resnet50_stage_trace),
            ('mobilenet_v2', mobilenet, mobilenet_v2_stage_trace)):
        model.load_state_dict(seeded_state_dict(model))
        for name, shape, stats in trace_fn(model, _arch_input((2, 3, 64, 64))):
            out[f'{tag}/{name}/shape'] = shape
            out[f'{tag}/{name}/stats'] = stats
    path = os.path.join(GOLDEN_DIR, 'arch_traces.npz')
    np.savez(path, **out)
    return path


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for fn in (freeze_librosa, freeze_torchvision, freeze_arch_traces,
               freeze_semantics):
        try:
            print('wrote', fn())
        except ImportError as e:
            print(f'SKIP {fn.__name__}: {e}')


if __name__ == '__main__':
    main()
