"""mec_tpu — TPU-native multimodal emotion classification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
RachaCodez/multimodal-emotion-classification (reference mounted read-only at
/root/reference): speech / text / image emotion classifiers plus an
attention-based multimodal fusion network, served behind the same web API and
persistence layer.

Design stance (TPU-first, not a port):
  * All compute-path math is pure-functional JAX, traced once and jitted;
    models are Flax linen modules with params loaded once per process
    (the reference reconstructs every model per HTTP request,
    reference app.py:225,256,290,336).
  * The audio DSP frontend (librosa in the reference,
    reference preprocessing/audio_preprocessing.py) is reimplemented as a
    single batched XLA graph (with Pallas kernels for the hot ops) that runs
    on-device and fuses into the speech DNN forward.
  * Requests are micro-batched so encoder forwards saturate the MXU instead
    of running one sample at a time.
  * Multi-chip scaling is a `jax.sharding.Mesh` config change, not a rewrite
    (see mec_tpu.parallel).

Package layout:
  ops/        device-side kernels: WAV decode, STFT/mel/DCT/chroma frontend,
              Pallas fused kernels
  models/     Flax model definitions (speech DNN, BERT, BiLSTM, ResNet50,
              fusion net)
  text/       tokenization (HF BERT tokenizer wrapper, Keras-style tokenizer)
  image/      image decode / resize / normalize, face detection utility
  parallel/   mesh construction + sharding rules (dp/tp)
  serving/    the inference engine: param registry, jitted entry points,
              micro-batching queue
  inference/  reference-compatible facade classes (public API parity)
  training/   optax training CLIs for all five trainers
  convert/    one-shot Keras .h5 / torch .pt / HF-dir -> framework params
  database/   sqlite-backed persistence (users, predictions, statistics)
  webapp/     the web service (stdlib WSGI app + jinja2 templates)
  utils/      config plumbing, logging, security helpers, profiling
  datasets/   dataset download / reorganization tooling
"""

__version__ = "0.1.0"

from mec_tpu.config import Config  # noqa: F401

# Matmul precision policy. TPU MXUs default f32 matmuls to one bf16 pass
# (~1e-1 abs error at hidden-size 256) which breaks the <=1e-4 logit-parity
# contract. In parity mode (COMPUTE_DTYPE=float32, the default) force full
# fp32 matmuls; the perf path instead casts params/activations to bfloat16,
# which this flag does not slow down (bf16 inputs always run one MXU pass
# with fp32 accumulation).
if Config.COMPUTE_DTYPE == "float32":
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the serving graphs are large (BERT +
# ResNet50 + frontend fused) and this environment's remote compile service
# is slow/variable; caching compiled executables across processes cuts
# cold starts ~5x. Opt out with MEC_JAX_CACHE_DIR=''.
#
# The default cache path is suffixed with a CPU fingerprint: XLA:CPU AOT
# entries are machine-feature-specific, so a cache directory shared across
# heterogeneous hosts (containers mounting the same /tmp) must never load
# an executable compiled for another CPU's features (SIGILL) — the same
# failure mode the native .so cache keys against (native/build.py). An
# explicit MEC_JAX_CACHE_DIR is used verbatim.
import os as _os

_cache_dir = _os.environ.get("MEC_JAX_CACHE_DIR")
if _cache_dir is None:
    import hashlib as _hashlib

    from mec_tpu.native.build import _cpu_fingerprint

    _cache_dir = ("/tmp/mec_jax_cache-"
                  + _hashlib.sha256(_cpu_fingerprint()).hexdigest()[:12])
if _cache_dir:
    import jax as _jax2

    _jax2.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax2.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
