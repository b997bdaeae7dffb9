"""TPU-native audio feature frontend.

Reimplements the reference's librosa-based 56-dim feature extractor
(reference preprocessing/audio_preprocessing.py:22-46, librosa==0.10.0) as a
single batched, jittable XLA graph:

    features[b] = concat(mfcc_mean[40], chroma_mean[12],
                         [zcr, spectral_centroid, spectral_rolloff, rms])

Everything — STFT, mel projection, dB conversion, DCT, per-clip tuning
estimation (piptrack), chroma filterbank synthesis, spectral statistics —
runs on device with static shapes, so the whole frontend fuses into the
speech DNN forward pass and batches across requests. The reference runs 4+
independent librosa STFT passes per clip on the CPU
(reference preprocessing/audio_preprocessing.py:40-46); here one rFFT feeds
every consumer.

librosa-semantics notes (all defaults of librosa 0.10):
  * STFT: n_fft=2048, hop=512, periodic Hann, center=True with
    pad_mode='constant' (zeros).
  * MFCC: power melspectrogram (128 Slaney mels) -> power_to_db
    (amin=1e-10, ref=1, top_db=80, max over the whole spectrogram) ->
    orthonormal DCT-II, first 40 coefficients, mean over time.
  * chroma_stft: power spectrogram -> per-clip tuning estimation via
    piptrack parabolic-interpolation pitch tracking -> 12-bin chroma
    filterbank (base_c, ctroct=5, octwidth=2, column-L2-normalized) ->
    per-frame inf-norm normalization, mean over time.
  * spectral centroid / rolloff (roll_percent=0.85) on the magnitude
    spectrogram; ZCR (edge padding) and RMS (zero padding) on framed time
    domain signals.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from mec_tpu.config import Config
from mec_tpu.ops import filters

SR = Config.SAMPLE_RATE          # 22050
N_SAMPLES = Config.AUDIO_SAMPLES  # 66150
N_FFT = Config.N_FFT              # 2048
HOP = Config.HOP_LENGTH           # 512
N_MELS = Config.N_MELS            # 128
N_MFCC = Config.N_MFCC            # 40
N_CHROMA = 12
N_BINS = 1 + N_FFT // 2           # 1025
N_FRAMES = 1 + N_SAMPLES // HOP   # 130 (center=True framing)

_TINY32 = float(np.finfo(np.float32).tiny)
_HIGH = jax.lax.Precision.HIGHEST


def _frame_indices() -> np.ndarray:
    """(N_FRAMES, N_FFT) gather indices into the center-padded signal."""
    starts = np.arange(N_FRAMES) * HOP
    return (starts[:, None] + np.arange(N_FFT)[None, :]).astype(np.int32)


def frame_signal(y: jnp.ndarray, pad_mode: str) -> jnp.ndarray:
    """Center-framed view, (B, N_FRAMES, N_FFT). pad_mode: 'constant'|'edge'.

    Gather-free when N_FFT is a HOP multiple (the librosa defaults:
    2048 = 4*512): frame t spans hop-slices [t, t+4), so the frame tensor
    is 4 static slices of the hop-reshaped signal concatenated — bitwise
    identical to the fancy-indexing gather, which XLA:TPU lowers to a
    slow per-row gather (profiled 2026-08-17: the gather made zcr/rms
    ~2 ms each at batch 64 — TPU gathers are the known frontend tax)."""
    pad = N_FFT // 2
    y_p = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    if N_FFT % HOP == 0:
        ratio = N_FFT // HOP
        total = (N_FRAMES - 1) * HOP + N_FFT
        hops = y_p[:, :total].reshape(y.shape[0], total // HOP, HOP)
        return jnp.concatenate(
            [hops[:, i:i + N_FRAMES] for i in range(ratio)], axis=-1)
    return y_p[:, _frame_indices()]


def stft_spectrograms(y: jnp.ndarray):
    """One rFFT pass -> (magnitude, power) spectrograms, each (B, T, F)."""
    frames = frame_signal(y, 'constant')
    win = jnp.asarray(filters.hann_window(N_FFT))
    z = jnp.fft.rfft(frames * win, axis=-1)
    mag = jnp.abs(z).astype(jnp.float32)
    return mag, mag * mag


# ----------------------------------------------------------------------
# Hop-slab serving frontend: never materializes the (B, T, 2048) frame
# tensor. Valid when N_FFT is a HOP multiple (librosa defaults 2048=4*512).
# ----------------------------------------------------------------------

_HOP_RATIO = N_FFT // HOP                       # 4
_HOP_TOTAL = (N_FRAMES - 1) * HOP + N_FFT      # samples covering all frames
_N_HOPS = _HOP_TOTAL // HOP                    # 133


@lru_cache(maxsize=1)
def _hop_dft_bases():
    """UNWINDOWED cos/sin DFT bases for one 512-sample hop at the full
    2048-point bin resolution, (HOP, N_BINS+1) float32. One shared basis
    serves every hop (contraction length 512, not 2048): the window is
    applied afterwards in the frequency domain and frames are assembled
    from hop spectra with exact {1,-i,-1,i} twiddles — 4x fewer MXU
    FLOPs than windowed per-slab bases. Bin k=N_BINS (1025) is carried so
    the Hann stencil has a right neighbor at k=1024."""
    n = np.arange(HOP)[:, None]
    k = np.arange(N_BINS + 1)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@lru_cache(maxsize=1)
def _hop_twiddles():
    """Exact frame-assembly twiddles c_i[k] = e^{-i*pi*i*k/2}, i=0..3.

    Frame t = concat(hops t..t+3), so its rectangular DFT is
    U_t[k] = sum_i e^{-2*pi*i*(512 i k)/2048} * H_{t+i}[k] with
    coefficients cycling through {1, -i, -1, i} by (i*k) mod 4 — all
    entries are exact 0/+-1 floats (no rounding). Returns (re, im),
    each (4, N_BINS+1) float32."""
    k = np.arange(N_BINS + 1)
    re_cycle = np.array([1.0, 0.0, -1.0, 0.0], np.float32)
    im_cycle = np.array([0.0, -1.0, 0.0, 1.0], np.float32)
    m = (np.arange(4)[:, None] * k[None, :]) % 4
    return re_cycle[m], im_cycle[m]


def _hops(y: jnp.ndarray, pad_mode: str) -> jnp.ndarray:
    """Center-padded signal reshaped to (B, _N_HOPS, HOP)."""
    pad = N_FFT // 2
    y_p = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    return y_p[:, :_HOP_TOTAL].reshape(y.shape[0], _N_HOPS, HOP)


def hop_spectrograms(y: jnp.ndarray):
    """(mag, power) via ONE shared-basis hop DFT + frequency-domain Hann.

    Equivalent to stft_spectrograms up to summation order; runs at
    3-pass bf16-split MXU precision (error floor well under librosa's
    top_db=-80 dB clamp — see dft_spectrograms precision notes).

    Three exact identities make this 4x cheaper in MXU FLOPs than
    windowed per-frame (or per-slab) DFT matmuls:
      1. Every 512-sample hop uses the SAME unwindowed (512, 1026) basis
         at 2048-point resolution — contraction length 512, and 133 hops
         replace 130 overlapping 2048-sample frames.
      2. Frame t = concat(hops t..t+3), so its rectangular DFT is an
         elementwise combine of 4 hop spectra with twiddles in
         {1, -i, -1, i} (exact 0/+-1 floats, _hop_twiddles).
      3. The periodic Hann window is a 3-point stencil in frequency:
         V[k] = 0.5*U[k] - 0.25*(U[k-1] + U[k+1]); at k=0 the left
         neighbor is U[-1] = conj(U[1]) (real frames).
    The (B, T, 2048) frame tensor never exists, and the matmul work is
    B*133*512*1026 MACs instead of B*130*2048*1025."""
    hc = _hops(y, 'constant')
    cosb, sinb = (jnp.asarray(x) for x in _hop_dft_bases())
    B = y.shape[0]
    flat = hc.reshape(B * _N_HOPS, HOP)
    hre = jnp.dot(flat, cosb, precision=jax.lax.Precision.HIGH,
                  preferred_element_type=jnp.float32
                  ).reshape(B, _N_HOPS, N_BINS + 1)
    him = jnp.dot(flat, sinb, precision=jax.lax.Precision.HIGH,
                  preferred_element_type=jnp.float32
                  ).reshape(B, _N_HOPS, N_BINS + 1)
    twid_re, twid_im = (jnp.asarray(x) for x in _hop_twiddles())
    ure = sum(hre[:, i:i + N_FRAMES] * twid_re[i]
              - him[:, i:i + N_FRAMES] * twid_im[i]
              for i in range(_HOP_RATIO))
    uim = sum(hre[:, i:i + N_FRAMES] * twid_im[i]
              + him[:, i:i + N_FRAMES] * twid_re[i]
              for i in range(_HOP_RATIO))
    # periodic-Hann stencil over bins 1..1024 (bin 1025 exists only to
    # feed k=1024's right neighbor); k=0 uses U[-1] = conj(U[1])
    vre = 0.5 * ure[..., 1:-1] - 0.25 * (ure[..., :-2] + ure[..., 2:])
    vim = 0.5 * uim[..., 1:-1] - 0.25 * (uim[..., :-2] + uim[..., 2:])
    vre0 = 0.5 * ure[..., :1] - 0.5 * ure[..., 1:2]
    vim0 = 0.5 * uim[..., :1]
    vre = jnp.concatenate([vre0, vre], axis=-1)
    vim = jnp.concatenate([vim0, vim], axis=-1)
    P = vre * vre + vim * vim
    return jnp.sqrt(P), P


def zcr_mean_hops(y: jnp.ndarray, threshold: float = 1e-10) -> jnp.ndarray:
    """zcr_mean via per-hop crossing counts + hop-boundary pairs —
    identical integer counts to the framed version, no frame tensor."""
    he = _hops(y, 'edge')
    # exact rewrite of where(|x| <= thr, 0, x) -> signbit: values in
    # [-thr, thr] zero out to +0.0 (signbit False), so neg iff x < -thr —
    # one elementwise pass instead of abs/where/signbit.
    neg = he < -threshold
    intra = jnp.sum(neg[..., 1:] != neg[..., :-1], axis=-1)   # (B, H)
    bound = (neg[:, 1:, 0] != neg[:, :-1, -1])                # (B, H-1)
    cr = sum(intra[:, i:i + N_FRAMES] for i in range(_HOP_RATIO))
    cr = cr + sum(bound[:, i:i + N_FRAMES]
                  for i in range(_HOP_RATIO - 1))
    rate = cr.astype(jnp.float32) / N_FFT
    return jnp.mean(rate, axis=-1)


def rms_mean_hops(y: jnp.ndarray) -> jnp.ndarray:
    """rms_mean via sliding sums of per-hop energies (equivalent up to
    summation order), no frame tensor."""
    hc = _hops(y, 'constant')
    e = jnp.sum(hc * hc, axis=-1)                             # (B, H)
    fe = sum(e[:, i:i + N_FRAMES] for i in range(_HOP_RATIO))
    rms = jnp.sqrt(fe / N_FFT)
    return jnp.mean(rms, axis=-1)


# ----------------------------------------------------------------------
# MFCC
# ----------------------------------------------------------------------

def power_to_db(S: jnp.ndarray, top_db: float = 80.0, amin: float = 1e-10
                ) -> jnp.ndarray:
    """librosa.power_to_db with ref=1.0; max taken per clip (leading axis)."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    per_clip_max = jnp.max(log_spec, axis=tuple(range(1, S.ndim)), keepdims=True)
    return jnp.maximum(log_spec, per_clip_max - top_db)


def mfcc_mean_from_power(P: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F) power spectrogram -> (B, N_MFCC) time-averaged MFCCs."""
    mel_fb = jnp.asarray(filters.mel_filterbank(SR, N_FFT, N_MELS))  # (M, F)
    melspec = jnp.einsum('btf,mf->btm', P, mel_fb, precision=_HIGH)
    mel_db = power_to_db(melspec)
    dct_m = jnp.asarray(filters.dct_matrix(N_MFCC, N_MELS))          # (C, M)
    mfcc = jnp.einsum('btm,cm->btc', mel_db, dct_m, precision=_HIGH)
    return jnp.mean(mfcc, axis=1)


# ----------------------------------------------------------------------
# Tuning estimation (librosa.estimate_tuning via piptrack) + chroma
# ----------------------------------------------------------------------

# librosa.piptrack defaults as invoked by estimate_tuning; the band-limited
# fast path in estimate_tuning_from_power shares these — change them HERE,
# not at a call site, or the two implementations drift.
PIP_FMIN = 150.0
PIP_FMAX = 4000.0
PIP_THRESHOLD = 0.1


def piptrack_candidates(P: jnp.ndarray, fmin: float = PIP_FMIN,
                        fmax: float = PIP_FMAX,
                        threshold: float = PIP_THRESHOLD):
    """Parabolic-interpolated pitch candidates from a power spectrogram.

    Mirrors librosa.piptrack defaults (as invoked by estimate_tuning with
    S=the chroma power spectrogram). Returns (pitches, mags, mask), each
    (B, T, F); non-candidates have pitch=mag=0.
    """
    S = P  # piptrack applies np.abs; power spectrograms are non-negative
    # Parabolic interpolation around each bin (axis = frequency, last)
    avg_core = 0.5 * (S[..., 2:] - S[..., :-2])
    denom = 2.0 * S[..., 1:-1] - S[..., 2:] - S[..., :-2]
    shift_core = avg_core / (denom + (jnp.abs(denom) < _TINY32))
    zeros = jnp.zeros_like(S[..., :1])
    avg = jnp.concatenate([zeros, avg_core, zeros], axis=-1)
    shift = jnp.concatenate([zeros, shift_core, zeros], axis=-1)
    dskew = 0.5 * avg * shift

    freqs = jnp.asarray(filters.fft_frequencies(SR, N_FFT), dtype=jnp.float32)
    freq_mask = (freqs >= max(fmin, 0.0)) & (freqs < min(fmax, SR / 2.0))

    ref_value = threshold * jnp.max(S, axis=-1, keepdims=True)  # per frame
    masked = S * (S > ref_value)
    # localmax with edge padding: first bin compares against itself (False),
    # last bin's right-neighbor is itself (>= holds).
    left = jnp.concatenate([masked[..., :1], masked[..., :-1]], axis=-1)
    right = jnp.concatenate([masked[..., 1:], masked[..., -1:]], axis=-1)
    localmax = (masked > left) & (masked >= right)

    mask = localmax & freq_mask
    bin_idx = jnp.arange(N_BINS, dtype=jnp.float32)
    # librosa multiplies by sr before dividing by n_fft; keep that order so
    # float32 rounding matches bit-for-bit.
    pitches = jnp.where(mask, (bin_idx + shift) * float(SR) / N_FFT, 0.0)
    mags = jnp.where(mask, S + dskew, 0.0)
    return pitches, mags, mask


def _kth_smallest(values: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact k-th smallest (0-based) per row WITHOUT sorting.

    TPU sorts are O(K log^2 K) bitonic passes — the dominant frontend cost
    at K~47k. Instead binary-search the 32-bit float bit-space: map floats
    to order-preserving uint32 keys, then 32 compare+count passes pin the
    exact k-th key. values (B, K) float32, k (B,) int32 -> (B,) float32.
    """
    bits = jax.lax.bitcast_convert_type(values, jnp.int32)
    u = bits.astype(jnp.uint32)
    # order-preserving map: negative floats -> ~u, non-negative -> u | MSB
    key = jnp.where(bits < 0, ~u, u | jnp.uint32(0x80000000))

    B = values.shape[0]
    lo0 = jnp.zeros((B,), jnp.uint32)
    hi0 = jnp.full((B,), 0xFFFFFFFF, jnp.uint32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((key <= mid[:, None]).astype(jnp.int32), axis=-1)
        found = cnt >= k + 1          # k-th smallest is <= mid
        return (jnp.where(found, lo, mid + 1), jnp.where(found, mid, hi))

    # lax.fori_loop beats a trace-time unroll here (measured 2026-08-17 on
    # the v5e at batch 64: 1.52 vs 1.87 ms for the median stage) — the
    # passes are compute-bound, not While-overhead-bound.
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    # invert the key map
    back = jnp.where(lo & jnp.uint32(0x80000000) != 0,
                     lo ^ jnp.uint32(0x80000000), ~lo)
    return jax.lax.bitcast_convert_type(back.astype(jnp.uint32)
                                        .astype(jnp.int32), jnp.float32)


def _hist_edges_ceil32(n_bins: int = 100) -> np.ndarray:
    """Host-precomputed ceil-to-f32 histogram edge table (see the edge
    semantics note in estimate_tuning_from_power). Shared by the XLA
    path and ops/pallas_tuning.py so both compare identical bits."""
    edges64 = np.linspace(-0.5, 0.5, n_bins + 1)
    ceil32 = edges64.astype(np.float32)
    low = ceil32.astype(np.float64) < edges64
    ceil32[low] = np.nextafter(ceil32[low], np.float32(np.inf),
                               dtype=np.float32)
    return ceil32


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """np.median over values[mask], per batch row. values/mask: (B, K)."""
    big = jnp.float32(np.finfo(np.float32).max)
    filled = jnp.where(mask, values, big)
    k = jnp.sum(mask, axis=-1)                      # (B,)
    lo = jnp.maximum((k - 1) // 2, 0)               # lower middle, 0-based
    hi = jnp.maximum(k // 2, 0)                     # upper middle (lo or lo+1)
    # One selection pass over (B, K) finds the lower middle; the upper
    # middle is the ADJACENT order statistic, recovered with two cheap
    # extra passes instead of a second 32-pass search (the previous
    # formulation searched a (2B, K) concat for both middles — 2x the
    # count work). v_lo is a bit-exact element value, so the <=/>
    # comparisons below are exact: if more than `hi` elements are <= v_lo,
    # position `hi` duplicates v_lo; otherwise it is the smallest element
    # strictly above v_lo.
    v_lo = _kth_smallest(filled, lo)
    cnt_le = jnp.sum((filled <= v_lo[:, None]).astype(jnp.int32), axis=-1)
    nxt = jnp.min(jnp.where(filled > v_lo[:, None], filled, big), axis=-1)
    v_hi = jnp.where(cnt_le >= hi + 1, v_lo, nxt)
    med = 0.5 * (v_lo + v_hi)
    return jnp.where(k > 0, med, 0.0)


def estimate_tuning_from_power(P: jnp.ndarray, resolution: float = 0.01,
                               bins_per_octave: int = 12,
                               use_pallas: bool | None = None
                               ) -> jnp.ndarray:
    """Per-clip tuning deviation in fractional chroma bins, (B,).

    librosa.estimate_tuning: keep candidates whose magnitude is >= the median
    candidate magnitude, fold their pitches onto one octave, histogram the
    residuals at `resolution`, return the fullest bin's left edge.
    """
    B = P.shape[0]
    # Candidates only exist inside the piptrack [fmin, fmax) band, so the
    # parabolic interpolation / localmax test runs on a margin-1 slice of
    # that band only (~360 of 1025 bins): band bins see their TRUE
    # neighbors (the full-spectrum version also gives them true
    # neighbors — its self-comparing edge padding only affects bins 0 and
    # N_BINS-1, both outside the band), and the out-of-band bins it
    # skips were discarded by the frequency mask anyway. Only the
    # per-frame reference max spans the full spectrum, as in
    # piptrack_candidates (kept as the full-width reference
    # implementation; see tests).
    freqs_np = filters.fft_frequencies(SR, N_FFT)
    band = np.nonzero((freqs_np >= PIP_FMIN) & (freqs_np < PIP_FMAX))[0]
    lo_bin, hi_bin = int(band[0]), int(band[-1]) + 1
    if lo_bin >= 1 and hi_bin <= N_BINS - 1:
        S = P[..., lo_bin - 1:hi_bin + 1]          # band + 1-bin margin
        avg = 0.5 * (S[..., 2:] - S[..., :-2])
        denom = 2.0 * S[..., 1:-1] - S[..., 2:] - S[..., :-2]
        shift = avg / (denom + (jnp.abs(denom) < _TINY32))
        dskew = 0.5 * avg * shift
        ref_value = PIP_THRESHOLD * jnp.max(P, axis=-1, keepdims=True)
        masked = S * (S > ref_value)
        localmax = ((masked[..., 1:-1] > masked[..., :-2])
                    & (masked[..., 1:-1] >= masked[..., 2:]))
        bin_idx = jnp.arange(lo_bin, hi_bin, dtype=jnp.float32)
        pitches = jnp.where(localmax,
                            (bin_idx + shift) * float(SR) / N_FFT, 0.0)
        mags = jnp.where(localmax, S[..., 1:-1] + dskew, 0.0)
    else:  # non-default band touching a spectrum edge: full-width path
        pitches, mags, _ = piptrack_candidates(P)
        pitches = pitches[..., lo_bin:hi_bin]
        mags = mags[..., lo_bin:hi_bin]
    # 2:1 exact compaction along frequency: piptrack's localmax test is
    # strict against the left neighbor and >= against the right, so two
    # ADJACENT bins can never both be candidates — each (2j, 2j+1) pair
    # holds at most one, selected with an elementwise where (no gather).
    # Halves the element count every median pass and histogram chunk
    # touches; the candidate multiset is unchanged.
    Fb = pitches.shape[-1]
    if Fb % 2:
        zpad = jnp.zeros_like(pitches[..., :1])
        pitches = jnp.concatenate([pitches, zpad], axis=-1)
        mags = jnp.concatenate([mags, zpad], axis=-1)
        Fb += 1
    shape = pitches.shape[:-1] + (Fb // 2, 2)
    p2 = pitches.reshape(shape)
    m2 = mags.reshape(shape)
    left_is_cand = p2[..., 0] > 0
    pitches = jnp.where(left_is_cand, p2[..., 0], p2[..., 1]).reshape(B, -1)
    mags = jnp.where(left_is_cand, m2[..., 0], m2[..., 1]).reshape(B, -1)

    pitch_mask = pitches > 0

    if use_pallas is None:
        from mec_tpu.ops import pallas_kernels as pk
        use_pallas = (Config.PALLAS_TUNING and pk.on_tpu())
    if use_pallas:
        # Batched Pallas selection (ops/pallas_tuning.py): median +
        # histogram passes run over the VMEM-resident candidate set.
        # The residual fold is computed HERE (XLA log2 — Mosaic's
        # transcendental rounding flipped a histogram near-tie in the
        # round-1 kernel) over pitch_mask ⊇ sel: non-selected elements
        # get a residual the kernel never counts, selected ones get
        # bit-identical values to the XLA path below.
        octs = jnp.log2(jnp.where(pitch_mask, pitches, 1.0) / 27.5)
        residual = jnp.mod(bins_per_octave * octs, 1.0)
        residual = jnp.where(residual >= 0.5, residual - 1.0, residual)
        from mec_tpu.ops.pallas_tuning import tuning_select_pallas
        best, has = tuning_select_pallas(mags, residual, pitches)
        nearest = jnp.asarray(
            np.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
            .astype(np.float32))
        return jnp.where(has, nearest[best], 0.0)

    med = _masked_median(mags, pitch_mask)                       # (B,)
    sel = (mags >= med[:, None]) & pitch_mask

    # residual of bins_per_octave * log2(f / 27.5) mod 1, folded to [-0.5, 0.5)
    octs = jnp.log2(jnp.where(sel, pitches, 1.0) / 27.5)
    residual = jnp.mod(bins_per_octave * octs, 1.0)
    residual = jnp.where(residual >= 0.5, residual - 1.0, residual)

    n_bins = int(np.ceil(1.0 / resolution))                      # 100
    # np.histogram semantics: bin i is [edges[i], edges[i+1]) with float64
    # edges from linspace. The residuals are FLOAT32, so the f64 edge
    # comparison collapses to a pure f32 one: r >= e_i (f64) holds for an
    # f32 r iff r >= ceil_to_f32(e_i), and that ceiling is precomputable
    # on the host. One f32 compare per edge replaces the previous
    # double-single (hi+lo) 6-op edge test, and differencing ADJACENT edge
    # tests (ge_i & ~ge_{i+1}) means ~1 compare per bin instead of 2 —
    # measured 2.09 -> 1.70 ms for the whole estimator at batch 64. Still
    # no (B, K)-sized gathers (TPU gathers were the frontend's dominant
    # cost): edges enter each pass as a broadcast (CHUNK+1,) slice.
    edges64 = np.linspace(-0.5, 0.5, n_bins + 1)
    ceil32 = jnp.asarray(_hist_edges_ceil32(n_bins))
    # Last bin is right-inclusive in np.histogram, but the residual fold
    # maps any f32 r == 0.5 to -0.5, so r < 0.5 strictly and the shared
    # right edge test (r >= 0.5) is identically False — differencing is
    # exact for bin n_bins-1 too.

    # 20 bins per pass (5 sequential passes): each pass is one broadcast
    # compare over (B, K, 21) — big enough to fill the VPU, small enough
    # to stay in VMEM-sized working sets. TPU loop-iteration overhead made
    # a 100-iteration per-bin loop ~3 ms at batch 32.
    CHUNK = 20
    r = residual[..., None]
    s3 = sel[..., None]

    def count_chunk(c):
        edges = jax.lax.dynamic_slice(ceil32, (c * CHUNK,), (CHUNK + 1,))
        ge = r >= edges                                      # (B, K, 21)
        hit = s3 & ge[..., :-1] & ~ge[..., 1:]
        return jnp.sum(hit.astype(jnp.int32), axis=1)        # (B, 20)

    # lax.map beats a trace-time unroll (measured: 2.70 vs 2.80 ms for the
    # whole estimator at batch 64) — chunks are compute-bound, not
    # loop-overhead-bound.
    counts = jax.lax.map(count_chunk,
                         jnp.arange(n_bins // CHUNK, dtype=jnp.int32))
    counts = jnp.moveaxis(counts, 0, 1).reshape(B, n_bins)
    best = jnp.argmax(counts, axis=-1)
    # returned value is NEAREST-rounded float32(edges64[argmax]), matching
    # np bins[argmax] — distinct from the ceil table used for the bin tests
    nearest = jnp.asarray(edges64.astype(np.float32))
    tuning = nearest[best]
    has_any = jnp.any(sel, axis=-1)
    return jnp.where(has_any, tuning, 0.0)


def chroma_filterbank(tuning: jnp.ndarray, n_chroma: int = N_CHROMA,
                      ctroct: float = 5.0, octwidth: float = 2.0) -> jnp.ndarray:
    """Per-clip chroma filterbank (B, n_chroma, N_BINS).

    librosa.filters.chroma with base_c=True and column-wise L2 norm; the
    tuning estimate shifts every bin center by -tuning fractional bins
    (see mec_tpu.ops.filters.chroma_base_bins).
    """
    base = jnp.asarray(filters.chroma_base_bins(SR, N_FFT, n_chroma),
                       dtype=jnp.float32)                        # (N_BINS-1,)
    frqbins = base[None, :] - tuning[:, None]                    # (B, F-1)
    first = frqbins[:, :1] - 1.5 * n_chroma                      # DC stand-in
    frqbins = jnp.concatenate([first, frqbins], axis=-1)         # (B, F)

    widths = jnp.concatenate(
        [jnp.maximum(frqbins[:, 1:] - frqbins[:, :-1], 1.0),
         jnp.ones_like(frqbins[:, :1])], axis=-1)                # (B, F)

    c = jnp.arange(n_chroma, dtype=jnp.float32)
    D = frqbins[:, None, :] - c[None, :, None]                   # (B, C, F)
    n2 = round(n_chroma / 2)
    D = jnp.remainder(D + n2 + 10 * n_chroma, n_chroma) - n2
    wts = jnp.exp(-0.5 * (2.0 * D / widths[:, None, :]) ** 2)

    # column-wise L2 normalization (per FFT bin)
    norm = jnp.sqrt(jnp.sum(wts * wts, axis=1, keepdims=True))
    wts = wts / jnp.where(norm < _TINY32, 1.0, norm)

    # Gaussian octave weighting centered at ctroct
    wts = wts * jnp.exp(
        -0.5 * (((frqbins[:, None, :] / n_chroma) - ctroct) / octwidth) ** 2)

    # rotate so bin 0 = C (base_c): roll by -3 chroma rows
    wts = jnp.roll(wts, -3 * (n_chroma // 12), axis=1)
    return wts


def chroma_mean_from_power(P: jnp.ndarray, tuning: jnp.ndarray | None = None
                           ) -> jnp.ndarray:
    """(B, T, F) power spectrogram -> (B, 12) time-averaged chroma."""
    if tuning is None:
        tuning = estimate_tuning_from_power(P)
    fb = chroma_filterbank(tuning)                               # (B, C, F)
    raw = jnp.einsum('bcf,btf->btc', fb, P, precision=_HIGH)
    # librosa.util.normalize(norm=inf, axis=-2): per (clip, frame) max over C
    length = jnp.max(jnp.abs(raw), axis=-1, keepdims=True)
    chroma = raw / jnp.where(length < _TINY32, 1.0, length)
    return jnp.mean(chroma, axis=1)


# ----------------------------------------------------------------------
# Spectral scalars
# ----------------------------------------------------------------------

def spectral_centroid_mean(mag: jnp.ndarray) -> jnp.ndarray:
    """librosa.feature.spectral_centroid on the magnitude spectrogram, (B,)."""
    freqs = jnp.asarray(filters.fft_frequencies(SR, N_FFT), dtype=jnp.float32)
    total = jnp.sum(mag, axis=-1, keepdims=True)
    norm = mag / jnp.where(total < _TINY32, 1.0, total)
    centroid = jnp.sum(freqs * norm, axis=-1)                    # (B, T)
    return jnp.mean(centroid, axis=-1)


def _cumsum_chunked(x: jnp.ndarray, chunk: int = 256) -> jnp.ndarray:
    """Cumulative sum along the last axis via two small MXU matmuls.

    XLA lowers jnp.cumsum on TPU to a log-depth scan — ~11 full-tensor
    HBM passes at F=1025, which made the rolloff stage the most
    expensive spectral scalar (measured ~1 ms of the batch-64 frontend).
    Chunking turns it into one batched (.., C)@(C, C) triangular matmul
    for within-chunk prefixes plus a second tiny matmul for chunk-level
    prefixes: two passes over the data, prefix FLOPs on the MXU.
    float32 accumulation (HIGHEST), so only the summation GROUPING
    differs from jnp.cumsum — same tolerance class. Chunk width swept
    on the v5e (round 5, slope-timed at b64): 32/64/128/256 ->
    0.537/0.521/0.481/0.461 ms — the old 32-wide groups padded the MXU
    tile 4x on both contraction and output; 256 fills it.
    """
    F = x.shape[-1]
    pad = (-F) % chunk
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    n_chunks = (F + pad) // chunk
    xr = x.reshape(x.shape[:-1] + (n_chunks, chunk))
    # U[i, j] = 1 iff i <= j: within[..., c, j] = sum_{i<=j} xr[..., c, i]
    U = jnp.asarray(np.triu(np.ones((chunk, chunk), np.float32)))
    within = jnp.einsum('...ci,ij->...cj', xr, U, precision=_HIGH)
    totals = within[..., -1]                                   # (.., n_chunks)
    Us = jnp.asarray(np.triu(np.ones((n_chunks, n_chunks), np.float32), 1))
    prefix = jnp.einsum('...c,cd->...d', totals, Us, precision=_HIGH)
    cum = (within + prefix[..., None]).reshape(x.shape)
    return cum[..., :F]


def spectral_rolloff_mean(mag: jnp.ndarray, roll_percent: float = 0.85,
                          two_level: bool = False,
                          use_pallas: bool = False) -> jnp.ndarray:
    """librosa.feature.spectral_rolloff (lowest bin reaching 85% energy), (B,).

    use_pallas=True (bf16 serving mode only) routes the crossing search
    through ops/pallas_rolloff.py: an 11-probe binary search per frame
    over VMEM-resident rows replaces the full chunked-cumsum matmul.
    Crossing bins can flip on near-ties (different summation order), so
    the fp32 logit-parity mode never takes this path; the bin->frequency
    map is bit-identical to fft_frequencies (see the kernel docstring).

    two_level=True finds the crossing WITHOUT materializing the full
    chunked cumsum: chunk totals (one U-last-column matmul pass) ->
    exclusive chunk prefixes -> first chunk whose end-cum reaches the
    threshold -> extract ONLY that chunk (one-hot einsum) and run the
    small triangular prefix there. MEASURED NEGATIVE on the v5e (round
    5): 0.63 vs 0.47 ms at b64 — the one-hot extraction einsums cost
    more than the full-cumsum pass they avoid — and the
    same-accumulation-chain argument that makes it bit-equal on the
    CPU backend (tests/test_audio_frontend.py::
    test_rolloff_two_level_bit_equal) does NOT hold under the TPU
    matmul lowering (observed bin-level flips). Default OFF; kept as
    the documented attempt.
    """
    if use_pallas and Config.PALLAS_ROLLOFF:
        from mec_tpu.ops import pallas_kernels as pk
        if pk.on_tpu():
            from mec_tpu.ops.pallas_rolloff import rolloff_bins_pallas
            F = mag.shape[-1]
            bins = rolloff_bins_pallas(mag.reshape(-1, F), roll_percent)
            bins = bins.reshape(mag.shape[:-1])             # (B, T)
            # exact: (SR/2)/(F-1) = 11025*2^-10 and k*11025 < 2^24 are
            # both f32-representable, so k*step == freqs[k] bitwise
            step = jnp.float32(SR / 2.0 / (F - 1))
            return jnp.mean(bins.astype(jnp.float32) * step, axis=-1)
    freqs = jnp.asarray(filters.fft_frequencies(SR, N_FFT), dtype=jnp.float32)
    big = jnp.float32(np.finfo(np.float32).max)
    if not two_level:
        cum = _cumsum_chunked(mag)
        thresh = roll_percent * cum[..., -1:]
        hit = cum >= thresh
        rolloff = jnp.min(jnp.where(hit, freqs, big), axis=-1)   # (B, T)
        return jnp.mean(rolloff, axis=-1)

    chunk = 256
    F = mag.shape[-1]
    pad = (-F) % chunk
    x = jnp.pad(mag, [(0, 0)] * (mag.ndim - 1) + [(0, pad)]) if pad else mag
    fpad = jnp.pad(freqs, (0, pad), constant_values=big) if pad else freqs
    n_chunks = (F + pad) // chunk
    xr = x.reshape(x.shape[:-1] + (n_chunks, chunk))
    # chunk totals via U's LAST COLUMN (same contraction chain as the
    # full within-matmul's last column -> bit-identical values)
    U = jnp.asarray(np.triu(np.ones((chunk, chunk), np.float32)))
    totals = jnp.einsum('...ci,ij->...cj', xr, U[:, -1:],
                        precision=_HIGH)[..., 0]        # (.., n_chunks)
    Us = jnp.asarray(np.triu(np.ones((n_chunks, n_chunks), np.float32), 1))
    prefix = jnp.einsum('...c,cd->...d', totals, Us, precision=_HIGH)
    end_cum = totals + prefix                           # fl(within_last + prefix)
    thresh = roll_percent * end_cum[..., -1:]
    # first chunk whose end-cum reaches the threshold (min-index, robust
    # to 1-ulp non-monotonicity across chunk boundaries)
    cidx = jnp.arange(n_chunks, dtype=jnp.int32)
    c_star = jnp.min(jnp.where(end_cum >= thresh, cidx, n_chunks + 1),
                     axis=-1)                           # (B, T)
    # thresh = 0.85*end_cum[-1] <= end_cum[-1] for nonneg mag, so a
    # crossing chunk always exists; clamp anyway so a pathological
    # input can only pick the last chunk, never an all-zero one-hot
    c_star = jnp.minimum(c_star, n_chunks - 1)
    onehot = (cidx == c_star[..., None]).astype(jnp.float32)
    # extract the crossing chunk's bins + frequencies (exact: x1.0/x0.0)
    x_star = jnp.einsum('...c,...ci->...i', onehot, xr, precision=_HIGH)
    f_star = jnp.einsum('...c,ci->...i', onehot,
                        fpad.reshape(n_chunks, chunk), precision=_HIGH)
    p_star = jnp.einsum('...c,...c->...', onehot, prefix,
                        precision=_HIGH)[..., None]
    within = jnp.einsum('...i,ij->...j', x_star, U, precision=_HIGH)
    hit = within + p_star >= thresh
    rolloff = jnp.min(jnp.where(hit, f_star, big), axis=-1)      # (B, T)
    return jnp.mean(rolloff, axis=-1)


def zcr_mean(y: jnp.ndarray, threshold: float = 1e-10) -> jnp.ndarray:
    """librosa.feature.zero_crossing_rate mean, (B,).

    Edge padding, per-frame fraction of sign changes (the first slot of each
    frame never counts, matching zero_crossings' pad=True).
    """
    frames = frame_signal(y, 'edge')                             # (B, T, W)
    # neg iff x < -thr (see zcr_mean_hops: exact signbit-after-clamp rewrite)
    neg = frames < -threshold
    crossings = neg[..., 1:] != neg[..., :-1]
    rate = jnp.sum(crossings, axis=-1).astype(jnp.float32) / N_FFT
    return jnp.mean(rate, axis=-1)


def rms_mean(y: jnp.ndarray) -> jnp.ndarray:
    """librosa.feature.rms mean (zero-padded center framing), (B,)."""
    frames = frame_signal(y, 'constant')
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
    return jnp.mean(rms, axis=-1)


# ----------------------------------------------------------------------
# Full 56-dim frontend
# ----------------------------------------------------------------------

def audio_features_56(y: jnp.ndarray, use_pallas: bool = False,
                      rolloff_pallas: bool | None = None) -> jnp.ndarray:
    """(B, 66150) float32 waveforms -> (B, 56) features.

    Feature order matches reference preprocessing/audio_preprocessing.py:40-46:
    40 MFCC, 12 chroma, then [zcr, centroid, rolloff, rms]
    (reference :33-37).

    use_pallas routes the DFT and the mel->dB->DCT MFCC stage through the
    fused Mosaic kernels (mec_tpu.ops.pallas_kernels); the XLA path is the
    float32 logit-parity reference.

    rolloff_pallas (default: follow use_pallas) separately controls the
    Pallas rolloff crossing search: standalone it is a 2.1x win (serving
    frontend 2.32 -> 1.98 ms b64) but inside the fused tri-modal engine
    graph it measured NEGATIVE at b64 (7.02-7.15 -> 7.16-7.28 ms
    interleaved chain A/B, 2026-08-21) — the custom-call boundary costs
    more than the MXU cumsum it removes once XLA can overlap that matmul
    with the image/BERT stages — so the engine passes False there.
    """
    if y.ndim == 1:
        y = y[None, :]
    if use_pallas and Config.DFT_PRECISION == 'high':
        # Serving default: hop-slab frontend — one shared unwindowed hop
        # DFT basis with the Hann window applied as its exact 3-point
        # frequency stencil (see hop_spectrograms), zcr/rms from per-hop
        # statistics, the (B, T, 2048) frame tensor never materialized
        # (measured 2026-08-17 at batch 64: framed-path frontend 7.8 ms
        # fp32-highest / 6.0 ms XLA-high -> 3.44 ms hop-slab).
        from mec_tpu.ops import pallas_kernels as pk
        mag, P = hop_spectrograms(y)
        mfcc = pk.mfcc_mean_pallas(P)
        zcr = zcr_mean_hops(y)
        rms = rms_mean_hops(y)
    elif use_pallas:
        from mec_tpu.ops import pallas_kernels as pk
        win = jnp.asarray(filters.hann_window(N_FFT))
        frames = frame_signal(y, 'constant') * win
        mag, P = pk.dft_spectrograms(frames,
                                     precision=Config.DFT_PRECISION)
        mfcc = pk.mfcc_mean_pallas(P)
        zcr = zcr_mean(y)
        rms = rms_mean(y)
    else:
        mag, P = stft_spectrograms(y)
        mfcc = mfcc_mean_from_power(P)
        zcr = zcr_mean(y)
        rms = rms_mean(y)
    # Tuning estimation stays on the XLA path in BOTH modes: a fused
    # per-clip Pallas kernel measured 2.31 ms vs XLA's 1.43 ms at batch 32
    # (grid cells serialize per-clip fori_loops; XLA batches the median
    # search + histogram across clips) — see ROADMAP.md item 5.
    chroma = chroma_mean_from_power(P)
    centroid = spectral_centroid_mean(mag)
    rolloff = spectral_rolloff_mean(
        mag, use_pallas=(use_pallas if rolloff_pallas is None
                         else rolloff_pallas))
    spectral = jnp.stack([zcr, centroid, rolloff, rms], axis=-1)
    return jnp.concatenate([mfcc, chroma, spectral], axis=-1).astype(jnp.float32)


audio_features_56_jit = jax.jit(audio_features_56)


@partial(jax.jit, static_argnames=())
def spectral_features_4(y: jnp.ndarray) -> jnp.ndarray:
    """Just [zcr, centroid, rolloff, rms], (B, 4) — the heuristic-fallback
    input (reference inference/speech_inference.py:36-44)."""
    if y.ndim == 1:
        y = y[None, :]
    mag, _ = stft_spectrograms(y)
    return jnp.stack([zcr_mean(y), spectral_centroid_mean(mag),
                      spectral_rolloff_mean(mag), rms_mean(y)], axis=-1)
