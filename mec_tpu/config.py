"""Central configuration.

Behavioral parity with the reference `Config` (reference config.py:5-65):
same attribute names, same defaults, same env-var overrides, so code written
against the reference keeps working. TPU-specific knobs are added at the
bottom and are all overridable via environment variables.
"""

import os
import sys
from datetime import timedelta

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_dotenv(path: str = '.env') -> bool:
    """Minimal python-dotenv equivalent. The reference calls
    `load_dotenv()` before its Config is read (reference app.py:40) so a
    `.env` file in the working directory configures the service; same
    here, without the dependency. Existing environment variables win
    (python-dotenv's default override=False). Returns True if a file was
    loaded. See `.env.example` at the repo root for the known keys."""
    try:
        with open(path, encoding='utf-8') as f:
            lines = f.readlines()
    except OSError:
        return False
    for line in lines:
        line = line.strip()
        if not line or line.startswith('#'):
            continue
        if line.startswith('export '):  # shell-style prefix, as dotenv does
            line = line[len('export '):].lstrip()
        key, sep, value = line.partition('=')
        key, value = key.strip(), value.strip()
        if not sep or not key:
            continue
        if len(value) >= 2 and value[0] == value[-1] and value[0] in '\'"':
            value = value[1:-1]
        else:
            # unquoted values: a whitespace-preceded '#' starts a comment
            for marker in (' #', '\t#'):
                idx = value.find(marker)
                if idx != -1:
                    value = value[:idx].rstrip()
        os.environ.setdefault(key, value)
    return True


# Implicit load at import time mirrors the reference (app.py:40), but a
# stray .env in the CWD must not silently reconfigure tests/benches:
# pytest runs and MEC_SKIP_DOTENV=1 opt out.
if os.environ.get('MEC_SKIP_DOTENV', '').strip().lower() not in (
        '1', 'true', 'yes', 'on') and 'pytest' not in sys.modules:
    load_dotenv()


def _env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


class Config:
    # Secret key (reference config.py:7)
    SECRET_KEY = os.environ.get('SECRET_KEY') or 'change-this-secret-key'

    # CSRF protection (reference config.py:10-11)
    WTF_CSRF_ENABLED = True
    WTF_CSRF_TIME_LIMIT = None

    # HTTPS enforcement in production (reference app.py:77-83: Talisman
    # force_https when FLASK_ENV=production; plain HTTP requests are
    # redirected to https)
    FORCE_HTTPS = os.environ.get('FLASK_ENV') == 'production'

    # Session security (reference config.py:14-18)
    SESSION_COOKIE_SECURE = os.environ.get('FLASK_ENV') == 'production'
    SESSION_COOKIE_HTTPONLY = True
    SESSION_COOKIE_SAMESITE = 'Lax'
    PERMANENT_SESSION_LIFETIME = timedelta(hours=24)
    SESSION_REFRESH_EACH_REQUEST = True

    # Security headers (reference config.py:21-26)
    SECURITY_HEADERS = {
        'X-Content-Type-Options': 'nosniff',
        'X-Frame-Options': 'DENY',
        'X-XSS-Protection': '1; mode=block',
        'Strict-Transport-Security': 'max-age=31536000; includeSubDomains',
    }

    # Database (reference config.py:29-35). SQLite by default; DATABASE_URL
    # env var overrides (sqlite:///path URIs are supported natively, other
    # dialects require the matching driver).
    DATABASE_PATH = os.path.join(_REPO_ROOT, 'mec_tpu', 'database', 'emotion.db')
    SQLALCHEMY_DATABASE_URI = (
        os.environ.get('DATABASE_URL')
        or f"sqlite:///{DATABASE_PATH}"
    )

    # Model artifact paths (reference config.py:39-44). The framework's own
    # orbax/msgpack artifacts live next to the reference-format ones; loaders
    # accept either.
    SPEECH_MODEL_PATH = os.environ.get('SPEECH_MODEL_PATH', 'models/speech_model.h5')
    SPEECH_SCALER_PATH = os.environ.get('SPEECH_SCALER_PATH', 'models/speech_scaler.pkl')
    TEXT_MODEL_PATH = os.environ.get('TEXT_MODEL_PATH', 'models/text_model.h5')
    IMAGE_MODEL_PATH = os.environ.get('IMAGE_MODEL_PATH', 'models/image_model.h5')
    FUSION_MODEL_PATH = os.environ.get('FUSION_MODEL_PATH', 'models/fusion_model.pkl')
    BERT_MODEL_PATH = os.environ.get('BERT_MODEL_PATH', 'models/bert_model')

    # Upload settings (reference config.py:47-50)
    UPLOAD_FOLDER = os.environ.get('UPLOAD_FOLDER', 'static/uploads')
    MAX_FILE_SIZE = 16 * 1024 * 1024  # 16MB
    ALLOWED_AUDIO_EXTENSIONS = {'wav', 'mp3', 'ogg'}
    ALLOWED_IMAGE_EXTENSIONS = {'png', 'jpg', 'jpeg'}

    # Labels (reference config.py:53-54)
    EMOTIONS = ['happy', 'sad', 'angry', 'fear', 'disgust', 'surprise', 'neutral']
    NUM_EMOTIONS = 7

    # Audio settings (reference config.py:57-59)
    SAMPLE_RATE = 22050
    AUDIO_DURATION = 3
    N_MFCC = 40

    # Text settings (reference config.py:62)
    MAX_TEXT_LENGTH = 128

    # Image settings (reference config.py:65)
    IMAGE_SIZE = (224, 224)

    # ------------------------------------------------------------------
    # TPU-native framework settings (new; no reference counterpart)
    # ------------------------------------------------------------------

    # Number of audio samples per clip after pad/trim (SAMPLE_RATE * AUDIO_DURATION)
    AUDIO_SAMPLES = SAMPLE_RATE * AUDIO_DURATION  # 66150

    # STFT parameters matching librosa 0.10 defaults
    # (reference requirements.txt pins librosa==0.10.0)
    N_FFT = 2048
    HOP_LENGTH = 512
    N_MELS = 128

    # Serving: micro-batch bucket sizes. Requests are padded up to the
    # smallest bucket >= pending count so every shape compiles exactly once.
    BATCH_BUCKETS = tuple(
        int(x) for x in os.environ.get('MEC_BATCH_BUCKETS', '1,8,32').split(',')
    )
    # Max time the batcher waits to fill a bucket before flushing (seconds).
    BATCH_TIMEOUT_S = float(os.environ.get('MEC_BATCH_TIMEOUT_S', '0.003'))
    # Adaptive linger cap: while NEW requests keep arriving within each
    # BATCH_TIMEOUT_S slice, the batcher keeps lingering (deeper
    # coalescing under sustained concurrency) up to this total, per
    # batch. Sparse traffic still flushes after one BATCH_TIMEOUT_S.
    # Measured on the v5e HTTP path (examples/load_http.py, K=32
    # closed-loop clients): 20 ms cap lifted /api/predict/text 232.9 ->
    # 342.2 req/s AND cut its p50 117.9 -> 79.6 ms (deeper batches =
    # fewer ~30 ms tunnel fetch RTTs).
    BATCH_MAX_LINGER_S = float(
        os.environ.get('MEC_BATCH_MAX_LINGER_S', '0.02'))
    # Load shedding: max requests queued per batch queue before new
    # submissions are rejected (webapp surfaces HTTP 503 + Retry-After
    # instead of letting queueing delay and memory grow unboundedly).
    # 0 disables the bound. Default 8 backlogged largest buckets.
    BATCH_MAX_PENDING = int(os.environ.get('MEC_BATCH_MAX_PENDING', '256'))

    # Batches in flight per queue: host prep of batch N+1 (decode,
    # tokenize, wire encode) overlaps the device round trip of batch N.
    # 1 = serial (the pre-pipelining behavior).
    BATCH_PIPELINE_DEPTH = int(os.environ.get('MEC_BATCH_PIPELINE', '2'))

    # Rate limiting (the reference's Flask-Limiter rules by default).
    # MEC_RATELIMIT=0 disables; MEC_RATELIMIT_DEFAULT / _REGISTER /
    # _LOGIN override the rules as 'count/window_seconds' pairs
    # (e.g. '200/86400,50/3600') — parsed in webapp/ratelimit.py.
    RATELIMIT_ENABLED = _env_flag('MEC_RATELIMIT', True)

    # Compute dtype for encoder matmuls. 'bfloat16' rides the MXU at full
    # rate on v5e; 'float32' is the parity mode (logits match the fp32
    # reference to <=1e-4).
    COMPUTE_DTYPE = os.environ.get('MEC_COMPUTE_DTYPE', 'float32')

    # Enable Pallas kernels on the hot paths (fall back to plain XLA when
    # off or when running on CPU).
    USE_PALLAS = _env_flag('MEC_USE_PALLAS', True)

    # Batched Pallas tuning-estimator selection phase
    # (ops/pallas_tuning.py): median + histogram over the VMEM-resident
    # candidate set, eight clips per grid cell. Default ON: bit-exact
    # vs the XLA path and measured 1.40x at b64 (0.70 -> 0.50 ms,
    # frontend 2.43 -> 2.22 ms), 3.0x at b1 — the batched shape wins
    # where round 1's per-clip grid lost (examples/ab_pallas_tuning.py,
    # 2026-08-21). TPU-only (the gate checks the backend).
    PALLAS_TUNING = _env_flag('MEC_PALLAS_TUNING', True)

    # Pallas spectral-rolloff crossing search (ops/pallas_rolloff.py):
    # 11-probe binary search per frame over VMEM-resident rows instead
    # of the full chunked-cumsum matmul. bf16 serving mode only (the
    # probe sums use a different association order than the cumsum, so
    # crossing bins can flip on measure-zero near-ties; fp32 parity mode
    # keeps the XLA path). TPU-only (the gate checks the backend).
    PALLAS_ROLLOFF = _env_flag('MEC_PALLAS_ROLLOFF', True)

    # Serving-mode DFT MXU precision: 'high' (default, 3-pass bf16
    # split, error floor below librosa's -80 dB top_db clamp), 'bf16'
    # (1 pass — fastest but its ~-64 dB floor measurably shifts dB-scale
    # features of spectrally sparse clips), or 'highest' (full fp32
    # emulation, the parity grade). Only affects the perf path
    # (use_pallas); fp32 parity mode always runs fp32 highest.
    DFT_PRECISION = os.environ.get('MEC_DFT_PRECISION', 'high')

    # Padded sequence-length buckets for BERT dispatch. The reference
    # pads every text to MAX_TEXT_LENGTH=128; BERT cost is linear in the
    # padded length and emotion texts are mostly <32 tokens. Slicing to
    # the smallest covering bucket is exact: padded keys carry an
    # additive bias of the dtype's min, so their attention weight
    # underflows to 0.0 and removing them cannot change any logit.
    SEQ_BUCKETS = tuple(
        int(x) for x in os.environ.get('MEC_SEQ_BUCKETS',
                                       '16,32,128').split(',')
        if x.strip())

    # Compressed host->device wire formats in perf mode (packed 12-bit
    # PCM audio, YUV 4:2:0 images, expanded on device). Serving is
    # upload-bandwidth-bound: measured 1.29x end-to-end throughput; off
    # ships PCM16 audio + raw uint8 RGB. See mec_tpu.serving.wire.
    WIRE_COMPRESS = _env_flag('MEC_WIRE_COMPRESS', True)

    # Store serving weights as bfloat16 in HBM. MEASURED NEGATIVE on the
    # v5e (2026-08-17): the fused tri-modal device step REGRESSED 3,263
    # -> 2,518 preds/s at batch 32 — XLA's per-use fp32->bf16 convert
    # fuses into the weight read for free, while bf16-resident params
    # appear to pay relayout/upcast costs elsewhere. Default off; knob
    # kept for other model/batch regimes. No effect in fp32 parity mode.
    BF16_PARAMS = _env_flag('MEC_BF16_PARAMS', False)

    # bf16 serving: fold image-model BatchNorm into the conv
    # kernels+biases at artifact load (ops/fold.fold_conv_bn) so no BN
    # elementwise work runs per forward. fp32 parity mode ignores this
    # (live batch_stats = exact reference eval semantics).
    FOLD_BN = _env_flag('MEC_FOLD_BN', True)

    # bf16 serving: after the BN fold, quantize the ResNet50 bottleneck
    # convs to int8 (per-output-channel weights at load, per-example
    # dynamic activation scales on device; ops/quant.py). The v5e MXU
    # runs s8 x s8 -> s32 at ~1.7x the bf16 conv rate (measured,
    # examples/probe_int8.py) and the image stage dominates the fused
    # tri-modal step. Decision parity is pinned by tests/test_quant.py
    # (softmax Linf ~0.01 — inside the 0.002-0.05 perf-mode band).
    # fp32 parity mode ignores this. No effect on MobileNetV2 artifacts
    # (already the fast variant; depthwise convs don't ride the MXU).
    IMAGE_INT8 = _env_flag('MEC_IMAGE_INT8', True)

    # bf16 serving: quantize the BERT encoder matmuls (q/k/v, attention
    # out, FFN — ~97% of the forward's FLOPs) to int8 with per-token
    # dynamic activation scales (ops/quant.quantize_bert_params,
    # models/qconv.QuantDense). Embeddings, LayerNorms, the attention
    # score/context matmuls, pooler, and classifier stay bf16. fp32
    # parity mode ignores this.
    BERT_INT8 = _env_flag('MEC_BERT_INT8', True)

    # Static-PTQ activation scales for the int8 paths: calibrate a
    # per-layer act_scale at engine load (one dynamic forward on a
    # deterministic synthetic batch) so the quantize fuses into the
    # producer's epilogue instead of paying a per-batch max-reduce +
    # extra activation pass. Measured on the v5e (b64): ResNet50
    # 6.01 -> 4.62 ms, BERT 3.84 -> 3.14 ms vs bf16
    # (examples/ab_int8_static.py). Off = dynamic per-example/per-token
    # scales (zero calibration, batch-invariant, perf-neutral).
    INT8_STATIC = _env_flag('MEC_INT8_STATIC', True)

    # Space-to-depth ResNet50 stem (models/resnet._stem_conv_s2d:
    # exact rewrite packing 2x2x3=12 input channels for 4x MXU lane
    # use). Measured NEGATIVE on the v5e (2026-08-21, chain A/B at the
    # int8 image stage: s2d 3.97 vs standard 3.85 ms at b64, 2.00 vs
    # 1.88 at b32) — XLA:TPU already handles the 3-channel stem well
    # and the input reshape/transpose costs a materialized pass.
    # Default OFF; knob kept for other hardware/XLA versions.
    STEM_S2D = _env_flag('MEC_STEM_S2D', False)

    # Perf-mode host audio featurization: compute the 56-dim frontend on
    # the host (C++ single-pass, mec_tpu/native/audiofeat.cpp) and ship
    # 224 B of features per clip instead of the ~99 KB packed waveform.
    # Trades host CPU (~ms/clip) for upload bandwidth — wins on
    # multi-core serving hosts, loses on single-core ones, so 'auto'
    # enables it only when >=4 CPUs are available. fp32 parity mode
    # always keeps the traced on-device frontend.
    HOST_AUDIO_FEATURES = os.environ.get('MEC_HOST_AUDIO_FEATURES', 'auto')

    # Fusion backend: 'attention' (the reference code's attention network,
    # default) or 'rf' (the README-advertised random-forest ensemble over
    # per-modality softmax outputs, served as a vectorized XLA
    # tree-ensemble — mec_tpu.models.forest). 'rf' requires the
    # fusion_rf artifact (training.train_fusion_rf).
    FUSION_MODE = os.environ.get('MEC_FUSION_MODE', 'attention')
    FUSION_RF_MODEL_PATH = os.environ.get('FUSION_RF_MODEL_PATH',
                                          'models/fusion_rf.pkl')

    # Mesh axis sizes for multi-chip deployment; 'auto' uses all local
    # devices on the data axis. See mec_tpu.parallel.mesh.
    MESH_DATA = os.environ.get('MEC_MESH_DATA', 'auto')
    MESH_MODEL = int(os.environ.get('MEC_MESH_MODEL', '1'))

    # Logging
    LOG_DIR = os.environ.get('MEC_LOG_DIR', 'logs')
