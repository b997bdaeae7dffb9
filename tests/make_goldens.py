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


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for fn in (freeze_librosa, freeze_torchvision):
        try:
            print('wrote', fn())
        except ImportError as e:
            print(f'SKIP {fn.__name__}: {e}')


if __name__ == '__main__':
    main()
