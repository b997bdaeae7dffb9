"""Plain-numpy oracle for librosa 0.10 feature semantics.

This is an *independent* straight-line implementation of the librosa calls
made by reference preprocessing/audio_preprocessing.py (librosa==0.10.0 per
reference requirements.txt). The JAX frontend in mec_tpu.ops.audio_features
is vectorized/masked for TPU; this oracle favors clarity (per-frame loops,
scipy FFT/DCT) so agreement between the two is strong evidence both match
librosa. librosa itself is not installed in this environment.
"""

import numpy as np
import scipy.fft
import scipy.signal

SR = 22050
N_FFT = 2048
HOP = 512
N_MELS = 128
N_MFCC = 40


def stft_mag(y, pad_mode="constant"):
    """|STFT| with librosa 0.10 defaults -> (1025, n_frames)."""
    win = scipy.signal.get_window("hann", N_FFT, fftbins=True)
    pad = N_FFT // 2
    y_p = np.pad(y, pad, mode=pad_mode)
    n_frames = 1 + (len(y_p) - N_FFT) // HOP
    cols = []
    for t in range(n_frames):
        frame = y_p[t * HOP: t * HOP + N_FFT] * win
        cols.append(np.abs(scipy.fft.rfft(frame)))
    return np.stack(cols, axis=1).astype(np.float32)


def hz_to_mel(f):
    f = np.asanyarray(f, dtype=np.float64)
    mels = f / (200.0 / 3)
    log_t = f >= 1000.0
    mels = np.where(log_t, 15.0 + np.log(np.maximum(f, 1e-300) / 1000.0) / (np.log(6.4) / 27.0), mels)
    return mels


def mel_to_hz(m):
    m = np.asanyarray(m, dtype=np.float64)
    f = m * (200.0 / 3)
    log_t = m >= 15.0
    return np.where(log_t, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)


def mel_fb():
    fftfreqs = np.linspace(0, SR / 2, 1 + N_FFT // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(SR / 2), N_MELS + 2))
    weights = np.zeros((N_MELS, len(fftfreqs)))
    for i in range(N_MELS):
        lower = (fftfreqs - mel_f[i]) / (mel_f[i + 1] - mel_f[i])
        upper = (mel_f[i + 2] - fftfreqs) / (mel_f[i + 2] - mel_f[i + 1])
        weights[i] = np.maximum(0, np.minimum(lower, upper))
        weights[i] *= 2.0 / (mel_f[i + 2] - mel_f[i])
    return weights.astype(np.float32)


def power_to_db(S, top_db=80.0, amin=1e-10):
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    return np.maximum(log_spec, log_spec.max() - top_db)


def mfcc_mean(y):
    S = stft_mag(y) ** 2
    mel = mel_fb() @ S
    db = power_to_db(mel)
    m = scipy.fft.dct(db, type=2, axis=0, norm="ortho")[:N_MFCC]
    return np.mean(m.T, axis=0)


# --- chroma with tuning estimation -----------------------------------------

def piptrack(S, fmin=150.0, fmax=4000.0, threshold=0.1):
    n_bins, n_frames = S.shape
    fft_freqs = np.linspace(0, SR / 2, n_bins)
    pitches = np.zeros_like(S)
    mags = np.zeros_like(S)
    tiny = np.finfo(S.dtype).tiny
    avg = np.zeros_like(S)
    shift = np.zeros_like(S)
    avg[1:-1] = 0.5 * (S[2:] - S[:-2])
    denom = 2 * S[1:-1] - S[2:] - S[:-2]
    shift[1:-1] = avg[1:-1] / (denom + (np.abs(denom) < tiny))
    dskew = 0.5 * avg * shift
    for t in range(n_frames):
        ref = threshold * S[:, t].max()
        masked = S[:, t] * (S[:, t] > ref)
        for f in range(n_bins):
            if not (fmin <= fft_freqs[f] < min(fmax, SR / 2)):
                continue
            left = masked[f - 1] if f > 0 else masked[0]
            right = masked[f + 1] if f < n_bins - 1 else masked[n_bins - 1]
            is_lmax = (masked[f] > left or f == 0 and False) and masked[f] >= right
            if f == 0:
                is_lmax = False  # edge pad compares bin 0 against itself
            else:
                is_lmax = masked[f] > left and masked[f] >= right
            if is_lmax:
                pitches[f, t] = (f + shift[f, t]) * SR / N_FFT
                mags[f, t] = S[f, t] + dskew[f, t]
    return pitches, mags


def estimate_tuning_from_S(S, resolution=0.01, bins_per_octave=12):
    pitches, mags = piptrack(S)
    pitch_mask = pitches > 0
    if pitch_mask.any():
        threshold = np.median(mags[pitch_mask])
    else:
        threshold = 0.0
    freqs = pitches[(mags >= threshold) & pitch_mask]
    freqs = freqs[freqs > 0]
    if len(freqs) == 0:
        return 0.0
    octs = np.log2(freqs / 27.5)
    residual = np.mod(bins_per_octave * octs, 1.0)
    residual[residual >= 0.5] -= 1.0
    bins = np.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
    counts, _ = np.histogram(residual, bins)
    return bins[np.argmax(counts)]


def chroma_fb(tuning, n_chroma=12, ctroct=5.0, octwidth=2.0):
    n_bins = 1 + N_FFT // 2
    fftfreqs = np.linspace(0, SR / 2, n_bins)[1:]
    a440 = 440.0 * 2.0 ** (tuning / n_chroma)
    frqbins = n_chroma * np.log2(fftfreqs / (a440 / 16))
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidth = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]))
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    n2 = round(n_chroma / 2)
    D = np.remainder(D + n2 + 10 * n_chroma, n_chroma) - n2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidth, (n_chroma, 1))) ** 2)
    col_norm = np.sqrt(np.sum(wts ** 2, axis=0))
    col_norm[col_norm < np.finfo(np.float32).tiny] = 1.0
    wts = wts / col_norm
    wts *= np.tile(np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)),
                   (n_chroma, 1))
    wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return wts.astype(np.float32)


def chroma_mean(y):
    S = stft_mag(y) ** 2
    tuning = estimate_tuning_from_S(S)
    fb = chroma_fb(tuning)
    raw = fb @ S
    length = np.max(np.abs(raw), axis=0, keepdims=True).copy()
    length[length < np.finfo(np.float32).tiny] = 1.0
    chroma = raw / length
    return np.mean(chroma.T, axis=0), tuning


# --- spectral scalars -------------------------------------------------------

def spectral_centroid_mean(y):
    S = stft_mag(y)
    freqs = np.linspace(0, SR / 2, S.shape[0])
    total = S.sum(axis=0, keepdims=True).copy()
    total[total < np.finfo(np.float32).tiny] = 1.0
    return float(np.mean(np.sum(freqs[:, None] * (S / total), axis=0)))


def spectral_rolloff_mean(y, roll_percent=0.85):
    S = stft_mag(y)
    freqs = np.linspace(0, SR / 2, S.shape[0])
    cum = np.cumsum(S, axis=0)
    out = []
    for t in range(S.shape[1]):
        thresh = roll_percent * cum[-1, t]
        idx = np.argmax(cum[:, t] >= thresh)
        out.append(freqs[idx])
    return float(np.mean(out))


def zcr_mean(y, threshold=1e-10):
    pad = N_FFT // 2
    y_p = np.pad(y, pad, mode="edge")
    n_frames = 1 + (len(y_p) - N_FFT) // HOP
    rates = []
    for t in range(n_frames):
        frame = y_p[t * HOP: t * HOP + N_FFT].copy()
        frame[np.abs(frame) <= threshold] = 0.0
        sb = np.signbit(frame)
        rates.append(np.sum(sb[1:] != sb[:-1]) / N_FFT)
    return float(np.mean(rates))


def rms_mean(y):
    pad = N_FFT // 2
    y_p = np.pad(y, pad, mode="constant")
    n_frames = 1 + (len(y_p) - N_FFT) // HOP
    vals = [np.sqrt(np.mean(y_p[t * HOP: t * HOP + N_FFT] ** 2))
            for t in range(n_frames)]
    return float(np.mean(vals))


def features_56(y):
    mfcc = mfcc_mean(y)
    chroma, _ = chroma_mean(y)
    spectral = np.array([zcr_mean(y), spectral_centroid_mean(y),
                         spectral_rolloff_mean(y), rms_mean(y)], dtype=np.float32)
    return np.concatenate([mfcc, chroma, spectral]).astype(np.float32)
