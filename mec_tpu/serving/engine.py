"""The inference engine.

Inverts the reference's serving design: instead of N forked workers each
reconstructing all four models from disk per HTTP request
(reference app.py:225,256,290,336,502,519,540,568 — the dominant latency
pathology, SURVEY.md §3.1), one process loads every available artifact once,
keeps params on device, and serves batched jitted graphs:

  * speech: waveform -> fused frontend(56-dim) -> scaler -> DNN, returning
    probabilities AND the 64-dim penultimate vector in one pass
  * text (BERT): ids/mask -> logits + [CLS] embedding in one pass
  * text (Bi-LSTM): ids -> probabilities (the fast variant)
  * image: uint8 pixels -> on-device normalize -> ResNet50 -> logits + feat
  * fusion: features+preds -> logits + attention/decision weights
  * tri-modal: ALL of the above as ONE traced graph — a single device
    dispatch per multimodal request batch (the reference runs 3 encoders
    twice each plus fusion = 7+ framework invocations)

Batch sizes are bucketed (Config.BATCH_BUCKETS) so each shape compiles
exactly once; requests are padded up to the bucket and results sliced.

Artifacts load with priority: native .mecp -> reference format
(.h5/.pt/HF dir, converted on first load and cached as .mecp). Absent
artifacts leave the modality in fallback mode — the deterministic heuristic
ladder (reference speech_inference.py:36-58, text_inference.py:53-70,
image_inference.py:94-102) is preserved as observable API behavior.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mec_tpu.config import Config
from mec_tpu.convert import store
from mec_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from mec_tpu.models.bert import BertForSequenceClassification
from mec_tpu.models import forest as forest_ops
from mec_tpu.models.bilstm import BiLSTMTextModel
from mec_tpu.models.fusion import MultiModalFusionModel
from mec_tpu.models.resnet import ImageEmotionModel
from mec_tpu.models.speech_dnn import SpeechDNN
from mec_tpu.ops import audio_features as af
from mec_tpu.ops import wav
from mec_tpu.utils.profiling import timer as stage_timer
from mec_tpu.serving import wire
from mec_tpu.image.preprocess import IMAGENET_MEAN, IMAGENET_STD
from mec_tpu.text.cleaning import clean_text
from mec_tpu.text.keras_tokenizer import KerasTokenizer
from mec_tpu.text.wordpiece import WordPieceTokenizer

log = logging.getLogger('mec_tpu.serving')

EMOTIONS = Config.EMOTIONS

# Keyword fallback map (reference text_inference.py:12-20)
KEYWORD_MAP = {
    'happy': ['happy', 'joy', 'glad', 'pleased', 'delighted', 'cheerful',
              'love', 'excited'],
    'sad': ['sad', 'down', 'unhappy', 'depressed', 'blue', 'disappointed',
            'heartbroken'],
    'angry': ['angry', 'mad', 'furious', 'rage', 'annoyed', 'irritated',
              'frustrated'],
    'fear': ['scared', 'afraid', 'fear', 'terrified', 'anxious', 'nervous',
             'worried'],
    'disgust': ['disgust', 'gross', 'nasty', 'revolting', 'sick'],
    'surprise': ['surprised', 'amazed', 'astonished', 'wow', 'shocked'],
    'neutral': [],
}


def heuristic_probs(label: str) -> List[float]:
    """The 0.9 / uniform-0.1 split used by every reference fallback
    (reference speech_inference.py:50-52)."""
    probs = np.ones(len(EMOTIONS)) * (0.1 / (len(EMOTIONS) - 1))
    probs[EMOTIONS.index(label)] = 0.9
    return probs.tolist()


def result_dict(probs: Sequence[float]) -> Dict[str, Any]:
    probs = [float(p) for p in probs]
    idx = int(np.argmax(probs))
    return {'emotion': EMOTIONS[idx], 'confidence': float(probs[idx]),
            'all_probabilities': probs}


def _bucket_for(n: int) -> int:
    for b in Config.BATCH_BUCKETS:
        if n <= b:
            return b
    return int(np.ceil(n / Config.BATCH_BUCKETS[-1])) * Config.BATCH_BUCKETS[-1]


def _pad_rows(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.zeros((n - x.shape[0],) + x.shape[1:], dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


class EmotionEngine:
    """Process-wide singleton owning params + compiled graphs."""

    def __init__(self, models_dir: Optional[str] = None, mesh='auto'):
        self.models_dir = models_dir
        self.compute_dtype = (jnp.bfloat16
                              if Config.COMPUTE_DTYPE == 'bfloat16'
                              else jnp.float32)
        # Serving data parallelism: with >1 visible device, request
        # batches shard along the mesh 'data' axis and params replicate —
        # scaling out is placement, not new code (SURVEY.md §2.3).
        # mesh='auto' (default) builds it from the visible devices;
        # mesh=None forces single-device (the dryrun equality reference);
        # an explicit Mesh is used as-is.
        if mesh == 'auto':
            self.mesh = make_mesh() if jax.device_count() > 1 else None
        else:
            self.mesh = mesh
        self._data_size = self.mesh.shape['data'] if self.mesh else 1
        # Host audio featurization (perf mode): ship 56 floats per clip
        # instead of the packed waveform (Config.HOST_AUDIO_FEATURES;
        # 'auto' = only on multi-core hosts, where the C++ featurizer
        # threads across clips and beats the upload it replaces).
        ha = str(Config.HOST_AUDIO_FEATURES).lower()

        def _auto_host_audio() -> bool:
            if (os.cpu_count() or 1) < 4:
                return False
            # auto's rationale is the threaded C++ featurizer; without a
            # compiler the numpy fallback would be a latency regression
            # over the on-device frontend — keep the waveform wire.
            from mec_tpu.native import featurizer
            return featurizer.have_native()

        self._host_audio = (
            self.compute_dtype == jnp.bfloat16
            and (ha in ('1', 'true', 'yes', 'on')
                 or (ha == 'auto' and _auto_host_audio())))
        # Batch-1 arg streaming (MEC_B1_STREAM): device_put each wire
        # component the moment it is encoded so its tunnel upload
        # overlaps the remaining host decode work (the batched path's
        # convention), instead of passing host numpy straight into the
        # jit call. MEASURED NEGATIVE at batch 1 (2026-08-19, real v5e,
        # interleaved A/B x24: stream 38.54 ms p50 / 35.32 min vs
        # host-args 36.36 / 32.87) even with the puts issued BEFORE
        # tokenize+image decode: three extra put dispatches on this
        # 1-core host cost more than overlapping the ~175 KB upload
        # saves (host work is only ~1.3 ms). Confirms round 1. The knob
        # stays for multi-core hosts; default off.
        from mec_tpu.config import _env_flag
        self._b1_stream = _env_flag('MEC_B1_STREAM', False)
        self.speech: Optional[Dict[str, Any]] = None
        self.bert: Optional[Dict[str, Any]] = None
        self.lstm: Optional[Dict[str, Any]] = None
        self.image: Optional[Dict[str, Any]] = None
        self.fusion: Optional[Dict[str, Any]] = None
        self.forest: Optional[Dict[str, Any]] = None
        self.bert_tokenizer: Optional[WordPieceTokenizer] = None
        self.lstm_tokenizer: Optional[KerasTokenizer] = None
        self._decode_pool = None
        self._decode_pool_lock = threading.Lock()
        # int8 static-PTQ scale cache (.mecp meta): native artifact
        # paths for persisting first-calibration scales, and whether
        # this build's scales came from the cache (no dynamic-mode
        # calibration compile — worth ~5 min on a fresh compile cache)
        self._image_native_path: Optional[str] = None
        self._bert_native_path: Optional[str] = None
        self._image_scales_cached = False
        self._bert_scales_cached = False
        # per-call batch-1 phase timings (ms), written by
        # _predict_trimodal_fused for bench.py's same-window p50
        # decomposition
        self._last_b1_phases: Dict[str, float] = {}

        self._load_all()
        # Serving image resolution: the reference always serves 224x224
        # (reference inference/image_inference.py:28-32); an artifact
        # trained at another size (e.g. MobileNetV2 at FER2013's native
        # 48x48, --img-size 48) declares it in its .mecp meta and the
        # whole image path — decode, wire, graphs — follows. At 48 px
        # the YUV wire is ~22x smaller, which matters on an
        # upload-bound link.
        self._image_size = tuple(Config.IMAGE_SIZE)
        meta_size = (self.image or {}).get('meta', {}).get('img_size')
        if meta_size:
            self._image_size = ((int(meta_size), int(meta_size))
                                if np.isscalar(meta_size)
                                else tuple(int(v) for v in meta_size))
        self._build_jits()

    def _ensure_decode_pool(self):
        if self._decode_pool is None:
            with self._decode_pool_lock:
                if self._decode_pool is None:
                    from concurrent.futures import ThreadPoolExecutor
                    self._decode_pool = ThreadPoolExecutor(
                        max_workers=4, thread_name_prefix='mec-decode')
        return self._decode_pool

    def _decode_images(self, paths: Sequence[str]) -> np.ndarray:
        """Decode+resize a batch of images on a small thread pool (PIL
        releases the GIL in its C decode/resize paths; serial decode
        costs ~220 ms per 32-batch of distinct PNGs on the request
        thread, ~100 ms pooled). Raises on the first bad image."""
        from mec_tpu.image.preprocess import load_image_uint8
        size = self._image_size
        if len(paths) <= 1:
            return np.stack([load_image_uint8(p, size) for p in paths])
        pool = self._ensure_decode_pool()
        return np.stack(list(pool.map(
            lambda p: load_image_uint8(p, size), paths)))

    # ------------------------------------------------------------------
    # artifact loading
    # ------------------------------------------------------------------
    def _path(self, p: str) -> str:
        if self.models_dir is not None:
            return os.path.join(self.models_dir, os.path.basename(p))
        return p

    def _load_native_or(self, ref_path: str, convert_fn):
        """Try .mecp, else convert the reference artifact and cache.

        convert_fn may return either a variables tree or a
        (variables, meta) pair; meta is persisted into the cached .mecp
        and always present in the returned dict."""
        ref_path = self._path(ref_path)
        nat = store.native_path(ref_path)
        if os.path.exists(nat):
            loaded = store.load_params(nat)
            loaded.setdefault('meta', {})
            return loaded
        if os.path.exists(ref_path):
            converted = convert_fn(ref_path)
            meta = {}
            if isinstance(converted, tuple):
                converted, meta = converted
            try:
                store.save_params(nat, converted, meta=meta)
            except OSError:
                pass
            return {'variables': converted, 'meta': meta}
        return None

    @staticmethod
    def _validate_forest(arrays, meta) -> Dict[str, Any]:
        """Reject unserveable forest artifacts at load (fallback ladder
        takes over), rather than serving silently-wrong fusions."""
        if 'depth' not in meta:
            raise ValueError('forest artifact missing the depth meta '
                             '(static trace constant) — re-convert it')
        n_feat = int(meta.get('n_features',
                              3 * Config.NUM_EMOTIONS))
        if n_feat != 3 * Config.NUM_EMOTIONS:
            raise ValueError(
                f'forest expects {n_feat} features; the fusion input is '
                f'{3 * Config.NUM_EMOTIONS} concatenated softmax outputs')
        classes = tuple(int(c) for c in
                        meta.get('classes', range(Config.NUM_EMOTIONS)))
        if not set(classes) <= set(range(Config.NUM_EMOTIONS)):
            raise ValueError(f'forest classes {classes} are not emotion '
                             f'ids 0..{Config.NUM_EMOTIONS - 1}')
        if len(classes) < Config.NUM_EMOTIONS:
            # trained on data missing some emotions (e.g. a small
            # --manifest): legal — outputs scatter into the full vector
            log.warning('forest fusion trained on %d/%d classes; missing '
                        'emotions get probability 0', len(classes),
                        Config.NUM_EMOTIONS)
        return {'arrays': arrays, 'meta': meta, 'classes': classes}

    def _load_all(self) -> None:
        # speech: .h5 + scaler .pkl
        try:
            from mec_tpu.convert.keras_h5 import (convert_speech_h5,
                                                  load_sklearn_scaler)
            loaded = self._load_native_or(Config.SPEECH_MODEL_PATH,
                                          convert_speech_h5)
            if loaded is not None:
                scaler_path = self._path(Config.SPEECH_SCALER_PATH)
                scaler_nat = os.path.splitext(scaler_path)[0] + '.npz'
                if os.path.exists(scaler_nat):
                    z = np.load(scaler_nat)
                    mean, scale = z['mean'], z['scale']
                elif os.path.exists(scaler_path):
                    mean, scale = load_sklearn_scaler(scaler_path)
                else:
                    mean = np.zeros(56, np.float32)
                    scale = np.ones(56, np.float32)
                self.speech = {'variables': loaded['variables'],
                               'scaler': (jnp.asarray(mean),
                                          jnp.asarray(scale))}
        except Exception as e:  # degrade-don't-fail, reference-wide pattern
            log.warning('speech model unavailable: %s', e)

        # BERT dir
        try:
            bert_dir = self._path(Config.BERT_MODEL_PATH)
            nat = os.path.join(bert_dir, 'bert_model.mecp')
            kwargs = None
            if os.path.isdir(bert_dir):
                from mec_tpu.convert.hf_bert import (convert_bert_dir,
                                                     model_kwargs_from_config,
                                                     read_config)
                if os.path.exists(os.path.join(bert_dir, 'config.json')):
                    kwargs = model_kwargs_from_config(read_config(bert_dir))
                bert_meta = {}
                if os.path.exists(nat):
                    loaded = store.load_params(nat)
                    variables = loaded['variables']
                    bert_meta = loaded.get('meta') or {}
                else:
                    variables = convert_bert_dir(bert_dir)
                    try:
                        store.save_params(nat, variables)
                    except OSError:
                        pass
                self.bert = {'variables': variables, 'kwargs': kwargs or {},
                             'meta': bert_meta}
                self._bert_native_path = nat
                self.bert_tokenizer = WordPieceTokenizer.from_pretrained_dir(
                    bert_dir)
                if self.bert_tokenizer is not None:
                    # C++ fast path for ASCII batches (hot-path CPU work;
                    # mec_tpu/native/wordpiece.cpp). Best-effort: falls
                    # back to the Python encoder when g++ is unavailable.
                    try:
                        from mec_tpu.native.tokenizer import accelerate
                        accelerate(self.bert_tokenizer)
                    except Exception as e:
                        log.info('native tokenizer unavailable: %s', e)
                if self.bert_tokenizer is None:
                    log.warning('BERT vocab.txt missing; text model disabled')
                    self.bert = None
        except Exception as e:
            log.warning('BERT model unavailable: %s', e)
            self.bert = None

        # Bi-LSTM .h5 + tokenizer
        try:
            from mec_tpu.convert.keras_h5 import convert_lstm_text_h5
            loaded = self._load_native_or(Config.TEXT_MODEL_PATH,
                                          convert_lstm_text_h5)
            if loaded is not None:
                tok_path = self._path(
                    os.path.splitext(Config.TEXT_MODEL_PATH)[0]
                    + '_tokenizer')
                tok = None
                for cand in (tok_path + '.json', tok_path + '.pkl'):
                    if os.path.exists(cand):
                        tok = KerasTokenizer.load(cand)
                        break
                if tok is not None:
                    self.lstm = {'variables': loaded['variables']}
                    self.lstm_tokenizer = tok
        except Exception as e:
            log.warning('LSTM text model unavailable: %s', e)

        # image .pt
        try:
            from mec_tpu.convert.torch_pt import convert_image_pt
            ref = Config.IMAGE_MODEL_PATH.replace('.h5', '.pt')
            loaded = self._load_native_or(ref, convert_image_pt)
            if loaded is not None:
                self.image = {'variables': loaded['variables'],
                              'meta': loaded.get('meta') or {}}
                self._image_native_path = store.native_path(self._path(ref))
        except Exception as e:
            log.warning('image model unavailable: %s', e)

        # fusion .pt
        try:
            from mec_tpu.convert.torch_pt import (convert_fusion_pt,
                                                  fusion_config_from_pt)
            ref = self._path(Config.FUSION_MODEL_PATH.replace('.pkl', '.pt'))
            nat = store.native_path(ref)
            if os.path.exists(nat):
                loaded = store.load_params(nat)
                self.fusion = {'variables': loaded['variables'],
                               'config': loaded['meta'].get('config', {})}
            elif os.path.exists(ref):
                cfg = fusion_config_from_pt(ref)
                variables = convert_fusion_pt(ref)
                try:
                    store.save_params(nat, variables, meta={'config': cfg})
                except OSError:
                    pass
                self.fusion = {'variables': variables, 'config': cfg}
        except Exception as e:
            log.warning('fusion model unavailable: %s', e)

        # random-forest fusion variant (the README-advertised ensemble
        # over per-modality softmax outputs, reference README.md:14,33;
        # models/forest.py). Only loaded when MEC_FUSION_MODE=rf — the
        # (T, N[, C]) arrays would otherwise occupy device memory that
        # the attention graph never reads.
        if Config.FUSION_MODE == 'rf':
            try:
                from mec_tpu.convert.sklearn_rf import convert_fusion_rf
                loaded = self._load_native_or(Config.FUSION_RF_MODEL_PATH,
                                              convert_fusion_rf)
                if loaded is not None:
                    self.forest = self._validate_forest(
                        loaded['variables']['forest'], loaded['meta'])
            except Exception as e:
                log.warning('random-forest fusion unavailable: %s', e)

        # Commit every params tree to the device ONCE. Passing host numpy
        # trees into jit re-uploads them on every call (for bert-base that
        # is ~440 MB per request batch — the dominant cost over a remote
        # device link); committed jax.Arrays are reused by reference.
        # Under a multi-device mesh, params replicate across it.
        #
        # MEC_BF16_PARAMS stores the weights as bfloat16 in HBM.
        # Measured NEGATIVE on the v5e (device step 3,263 -> 2,518
        # preds/s at batch 32 — see Config.BF16_PARAMS), so default off;
        # BN/LayerNorm statistics ('batch_stats') stay fp32 either way.
        # bf16 serving mode folds every image-model (conv, BN) pair into
        # the conv kernel + a bias at load (ops/fold.fold_conv_bn) — the
        # image-path analogue of the speech DNN fold
        # (ops/pallas_kernels.fold_batchnorm). Removes all BatchNorm
        # elementwise traffic from the stage that dominates the fused
        # tri-modal step. fp32 parity mode keeps live batch_stats
        # (reference eval-mode semantics exactly,
        # reference inference/image_inference.py:48-92).
        self._image_folded = False
        self._image_quant = False
        if (self.image is not None and Config.FOLD_BN
                and self.compute_dtype == jnp.bfloat16):
            try:
                from mec_tpu.ops.fold import fold_conv_bn
                self.image['variables'] = fold_conv_bn(
                    self.image['variables'])
                self._image_folded = True
            except Exception as e:
                log.warning('conv+BN fold unavailable, serving live '
                            'batch_stats: %s', e)
        # Folded image convs -> int8 (s8 x s8 -> s32 on the MXU at
        # ~1.7x the bf16 conv rate, examples/probe_int8.py; scheme +
        # parity bounds in ops/quant.py). ResNet50: all bottleneck
        # convs. MobileNetV2: the 1x1 expand/project convs + conv_head
        # (plain MXU matmuls carrying ~2/3 of its FLOPs); its depthwise
        # 3x3 stacks stay bf16 (VPU-bound — ops/quant._is_folded_conv
        # skips them by kernel shape).
        if self._image_folded and Config.IMAGE_INT8:
            try:
                from mec_tpu.ops.quant import quantize_image_params
                self.image['variables'] = quantize_image_params(
                    self.image['variables'])
                self._image_quant = True
            except Exception as e:
                log.warning('image int8 quantization unavailable, '
                            'serving bf16 convs: %s', e)
        # BERT encoder matmuls -> int8 (per-token dynamic activation
        # scales; embeddings/LN/attention-scores/pooler stay bf16 —
        # ops/quant.quantize_bert_params)
        self._bert_quant = False
        if (self.bert is not None and Config.BERT_INT8
                and self.compute_dtype == jnp.bfloat16):
            try:
                from mec_tpu.ops.quant import quantize_bert_params
                self.bert['variables'] = quantize_bert_params(
                    self.bert['variables'])
                self._bert_quant = True
            except Exception as e:
                log.warning('BERT int8 quantization unavailable, '
                            'serving bf16 matmuls: %s', e)

        cast_bf16 = (self.compute_dtype == jnp.bfloat16
                     and Config.BF16_PARAMS)

        def _commit(tree):
            if cast_bf16:
                tree = dict(tree)
                tree['params'] = jax.tree_util.tree_map(
                    lambda x: (x.astype(jnp.bfloat16)
                               if getattr(x, 'dtype', None) == np.float32
                               else x), tree['params'])
            sharding = replicated(self.mesh) if self.mesh else None
            return (jax.device_put(tree, sharding) if sharding
                    else jax.device_put(tree))

        for art in (self.speech, self.bert, self.lstm, self.image,
                    self.fusion):
            if art is not None:
                art['variables'] = _commit(art['variables'])
        if self.forest is not None:
            # int32 topology + fp32 thresholds/probas — never bf16-cast
            # (threshold comparisons define the tree walk exactly)
            sharding = replicated(self.mesh) if self.mesh else None
            self.forest['arrays'] = (
                jax.device_put(self.forest['arrays'], sharding) if sharding
                else jax.device_put(self.forest['arrays']))

        # Fusion backend selection (Config.FUSION_MODE): 'rf' serves the
        # tree ensemble when its artifact is live, else degrades to the
        # attention network / weighted-average ladder.
        self._fusion_kind: Optional[str] = None
        if Config.FUSION_MODE == 'rf' and self.forest is not None:
            self._fusion_kind = 'rf'
        elif self.fusion is not None:
            self._fusion_kind = 'attention'
            if Config.FUSION_MODE == 'rf':
                log.warning('MEC_FUSION_MODE=rf but no fusion_rf artifact '
                            '(%s); serving attention fusion',
                            Config.FUSION_RF_MODEL_PATH)

    def _bucket(self, n: int) -> int:
        """Bucket size for n rows, rounded so it splits over the mesh."""
        b = _bucket_for(n)
        d = self._data_size
        return -(-b // d) * d

    def _place(self, x: np.ndarray):
        """Shard a padded batch over the data axis (no-op single-device)."""
        if self.mesh is None:
            return x
        return jax.device_put(x, batch_sharding(self.mesh))

    def _put(self, x):
        """Start the host->device transfer of a wire component NOW.

        jax.device_put is async (measured through the axon tunnel:
        returns in ~5-15 ms while a 3 MB payload streams for ~50-150 ms
        in the background), so encoding+putting each modality as soon as
        it is ready overlaps its upload with the remaining host decode
        work; the later jit dispatch then receives device arrays and
        returns immediately. Handles the (packed, scale)/(y, uv) wire
        tuples — jax.device_put takes the whole pytree in ONE call
        (per-call dispatch overhead is milliseconds on a 1-core host, so
        group related components into a single put). Sharded over the
        data axis under a mesh (every leaf is batch-dim-leading)."""
        if self.mesh is not None:
            return jax.device_put(x, batch_sharding(self.mesh))
        return jax.device_put(x)

    # ------------------------------------------------------------------
    # jitted graphs
    # ------------------------------------------------------------------
    def _calibration_images(self) -> np.ndarray:
        """Deterministic synthetic calibration batch (normalized NHWC)
        for static-PTQ: noise at two contrasts, both gradients, and the
        range extremes — spans the [0, 255] input range so per-layer
        max-abs scales are not starved; calibrate_static_scales' margin
        plus int8 saturation covers the rest."""
        h, w = self._image_size
        rng = np.random.RandomState(0)
        yy = np.broadcast_to(
            np.linspace(0.0, 255.0, h, dtype=np.float32)[:, None, None],
            (h, w, 3))
        xx = np.broadcast_to(
            np.linspace(0.0, 255.0, w, dtype=np.float32)[None, :, None],
            (h, w, 3))
        frames = [rng.randint(0, 256, (h, w, 3)).astype(np.float32),
                  rng.randint(96, 160, (h, w, 3)).astype(np.float32),
                  yy, xx,
                  np.full((h, w, 3), 255.0, np.float32),
                  np.zeros((h, w, 3), np.float32)]
        x = np.stack(frames) / 255.0
        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)
        return ((x - mean) / std).astype(np.float32)

    # ------------------------------------------------------------------
    # int8 static-PTQ calibration (+ .mecp scale cache)
    # ------------------------------------------------------------------
    @staticmethod
    def _scales_cache_put(nat_path, key: str, scales) -> None:
        """Persist first-calibration act scales into the artifact's
        .mecp meta (keyed on the quant config) so every LATER engine
        build skips the calibration compile — the compile cache is
        per-session on some hosts, but the artifact survives. Inverts
        the reference's load-every-request design one step further
        (reference app.py:225,256,290,336): calibration becomes a
        convert-step cost, not a process-start cost."""
        try:
            if not nat_path or not os.path.exists(nat_path):
                return
            loaded = store.load_params(nat_path)
            meta = loaded.get('meta') or {}
            cache = dict(meta.get('int8_scales') or {})
            cache[key] = {k: float(v) for k, v in scales.items()}
            store.save_params(nat_path, loaded['variables'],
                              meta=dict(meta, int8_scales=cache))
        except Exception as e:  # cache is best-effort; serving works
            log.info('int8 scale cache not persisted: %s', e)

    def _cached_scales(self, art, key: str):
        ent = (((art or {}).get('meta') or {})
               .get('int8_scales') or {}).get(key)
        if ent:
            return {k: float(v) for k, v in ent.items()}
        return None

    def _calibrate_image_static(self) -> None:
        """Resolve static act scales for the quantized image tree:
        artifact cache hit => insert scalars (zero compiles); miss =>
        one dynamic-mode calibration forward, then persist. Raises on
        failure (caller keeps dynamic scales)."""
        from mec_tpu.ops.quant import (calibrate_static_scales,
                                       extract_static_scales,
                                       insert_static_scales)
        h, w = self._image_size
        arch = ('mobilenet_v2'
                if 'conv_stem' in self.image['variables']['params']
                else 'resnet50')
        key = (f'image|{arch}|{h}x{w}|'
               f'{jnp.dtype(self.compute_dtype).name}|m1.25|v1')
        cal = None
        cached = self._cached_scales(self.image, key)
        if cached is not None:
            try:
                cal = insert_static_scales(self.image['variables'], cached)
                self._image_scales_cached = True
                log.info('image int8 act scales from artifact cache')
            except ValueError as e:
                log.warning('stale image int8 scale cache (%s); '
                            'recalibrating', e)
        if cal is None:
            if arch == 'mobilenet_v2':
                from mec_tpu.models.mobilenet import MobileNetV2EmotionModel
                dyn = MobileNetV2EmotionModel(dtype=self.compute_dtype,
                                              fold_bn=True, quant=True)
            else:
                dyn = ImageEmotionModel(dtype=self.compute_dtype,
                                        fold_bn=True, quant=True,
                                        stem_s2d=Config.STEM_S2D)
            cal = calibrate_static_scales(dyn, self.image['variables'],
                                          (self._calibration_images(),))
            self._scales_cache_put(self._image_native_path, key,
                                   extract_static_scales(cal))
        # re-commit: only the new act_scale scalars upload (committed
        # leaves pass through device_put)
        sh = replicated(self.mesh) if self.mesh else None
        self.image['variables'] = (jax.device_put(cal, sh) if sh
                                   else jax.device_put(cal))

    def _calibrate_bert_static(self, bert_kwargs) -> None:
        """BERT analogue of _calibrate_image_static (calibration corpus:
        seven keyworded sentences, one per emotion, through the real
        tokenizer at the max length)."""
        from mec_tpu.ops.quant import (calibrate_static_scales,
                                       extract_static_scales,
                                       insert_static_scales)
        approx = self.compute_dtype == jnp.bfloat16
        key = (f'bert|seq{Config.MAX_TEXT_LENGTH}|'
               f'{jnp.dtype(self.compute_dtype).name}|'
               f'gelu{int(approx)}|m1.25|v1')
        cal = None
        cached = self._cached_scales(self.bert, key)
        if cached is not None:
            try:
                cal = insert_static_scales(self.bert['variables'], cached)
                self._bert_scales_cached = True
                log.info('BERT int8 act scales from artifact cache')
            except ValueError as e:
                log.warning('stale BERT int8 scale cache (%s); '
                            'recalibrating', e)
        if cal is None:
            dyn = BertForSequenceClassification(
                **bert_kwargs, dtype=self.compute_dtype,
                gelu_approximate=approx, quant=True)
            cal_texts = [f'i feel so {e} about all of this today'
                         for e in Config.EMOTIONS]
            ids, mask = self.bert_tokenizer.encode_batch(
                cal_texts, Config.MAX_TEXT_LENGTH)
            cal = calibrate_static_scales(dyn, self.bert['variables'],
                                          (ids, mask))
            self._scales_cache_put(self._bert_native_path, key,
                                   extract_static_scales(cal))
        sh = replicated(self.mesh) if self.mesh else None
        self.bert['variables'] = (jax.device_put(cal, sh) if sh
                                  else jax.device_put(cal))

    def _build_jits(self) -> None:
        # quant modes resolve during model construction below ('static'
        # after successful calibration); referenced by bench/tests
        self._image_quant_mode = 'dynamic'
        self._bert_quant_mode = 'dynamic'
        # Derive architecture dims from the loaded params so non-default
        # artifacts (e.g. different widths) serve correctly.
        if self.speech is not None:
            p = self.speech['variables']['params']
            n_blocks = sum(1 for k in p if k.startswith('bn_'))
            widths = tuple(p[f'dense_{i}']['kernel'].shape[1]
                           for i in range(n_blocks))
            speech_model = SpeechDNN(widths=widths,
                                     dropout_rates=(0.0,) * len(widths),
                                     dtype=self.compute_dtype)
        else:
            speech_model = SpeechDNN(dtype=self.compute_dtype)
        if (self.image is not None
                and 'conv_stem' in self.image['variables']['params']):
            # README-advertised MobileNetV2 variant (models/mobilenet.py);
            # same 512-dim head feature, so fusion is unchanged
            from mec_tpu.models.mobilenet import MobileNetV2EmotionModel
            image_cls = MobileNetV2EmotionModel
        else:
            image_cls = ImageEmotionModel
        # Static-PTQ calibration: one dynamic-mode forward on a
        # deterministic synthetic batch, then per-layer act_scale
        # params. Static scales let the quantize fuse into the
        # producer's epilogue — the dynamic per-example scale's
        # global reduce costs an extra materialized pass over every
        # activation (ResNet50 b64 measured: bf16 6.01 / dynamic
        # 5.83 / static 4.62 ms, examples/ab_int8_static.py).
        if self._image_quant and Config.INT8_STATIC:
            try:
                self._calibrate_image_static()
                self._image_quant_mode = 'static'
            except Exception as e:
                log.warning('int8 static calibration (image) failed,'
                            ' serving dynamic scales: %s', e)
        image_kwargs = dict(dtype=self.compute_dtype,
                            fold_bn=self._image_folded,
                            quant=self._image_quant,
                            quant_mode=self._image_quant_mode)
        if image_cls is ImageEmotionModel:
            # space-to-depth stem (exact; Config.STEM_S2D) — bf16
            # folded serving only; MobileNetV2's 3x3 stem has no
            # 7x7/2 to rewrite
            image_kwargs['stem_s2d'] = (Config.STEM_S2D
                                        and self._image_folded)
        image_model = image_cls(**image_kwargs)
        fusion_kwargs = (self.fusion or {}).get('config') or {}
        fusion_model = MultiModalFusionModel(**{
            k: v for k, v in fusion_kwargs.items()
            if k in ('speech_dim', 'text_dim', 'image_dim', 'num_classes',
                     'hidden_dim')}, dtype=self.compute_dtype)
        bert_kwargs = (self.bert or {}).get('kwargs') or {}
        # bf16 serving swaps erf-GELU for the tanh approximation: ~1e-3
        # absolute activation error (at the bf16 quantization level;
        # packed-output deltas measured within the existing 0.002 serving
        # tolerance) for 0.44 ms/step off the BERT stage at batch 64.
        # fp32 parity mode keeps erf (exact HF bert-base semantics).
        # BERT static-PTQ calibration (seven keyworded sentences — one
        # per emotion — through the real tokenizer at the max length;
        # measured b64 seq-32: bf16 3.84 / dynamic 3.36 / static
        # 3.14 ms, examples/ab_int8_static.py)
        if self._bert_quant and Config.INT8_STATIC \
                and self.bert_tokenizer is not None:
            try:
                self._calibrate_bert_static(bert_kwargs)
                self._bert_quant_mode = 'static'
            except Exception as e:
                log.warning('int8 static calibration (BERT) failed, '
                            'serving dynamic scales: %s', e)
        bert_model = BertForSequenceClassification(
            **bert_kwargs, dtype=self.compute_dtype,
            gelu_approximate=self.compute_dtype == jnp.bfloat16,
            quant=self._bert_quant, quant_mode=self._bert_quant_mode)
        if self.lstm is not None:
            p = self.lstm['variables']['params']
            lstm_model = BiLSTMTextModel(
                dtype=self.compute_dtype,
                vocab_size=p['embedding']['embedding'].shape[0],
                embed_dim=p['embedding']['embedding'].shape[1],
                lstm_units=(
                    p['bilstm_1']['forward']['recurrent_kernel'].shape[0],
                    p['bilstm_2']['forward']['recurrent_kernel'].shape[0]),
                dense_units=(p['dense_1']['kernel'].shape[1],
                             p['dense_2']['kernel'].shape[1]))
        else:
            lstm_model = BiLSTMTextModel(dtype=self.compute_dtype)

        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)

        # Every entry point returns ONE packed (B, K) array. Over a remote
        # device link each fetched array pays a full round trip (~30 ms on
        # the axon tunnel); packing makes any result exactly one fetch.
        def _decode_waves(waves):
            # compressed wire formats (perf mode), expanded on device:
            # tuple = packed 12-bit PCM + per-clip scale, int16 = PCM16
            # (see serving/wire.py)
            if isinstance(waves, (tuple, list)):
                return wire.decode_pcm12(*waves)
            if waves.dtype == jnp.int16:
                return waves.astype(jnp.float32) / 32768.0
            return waves

        def _decode_image(img):
            # tuple = YUV 4:2:0 wire format; array = raw uint8 RGB.
            # Both decode to float32 RGB in [0, 255].
            if isinstance(img, (tuple, list)):
                return wire.decode_yuv420(*img)
            return img.astype(jnp.float32)

        # Perf mode on TPU routes the speech path through the fused Mosaic
        # kernels (DFT-matmul spectrogram, mel->dB->DCT MFCC, whole-DNN
        # forward with folded BatchNorm); fp32 parity mode keeps the XLA
        # path that matches librosa/Keras to <=1e-4.
        from mec_tpu.ops import pallas_kernels as pk
        use_pallas = (Config.USE_PALLAS and pk.on_tpu()
                      and self.compute_dtype == jnp.bfloat16)
        dnn_pallas = None
        if use_pallas and self.speech is not None:
            try:
                dnn_pallas = pk.make_speech_dnn_pallas(
                    self.speech['variables'])
            except Exception as e:  # degrade to the XLA forward
                log.warning('pallas DNN unavailable: %s', e)

        def speech_fwd(variables, scaler, waves, rolloff_pallas=True):
            # _host_audio is static at trace time: the graph either takes
            # (B, 56) precomputed features (host C++ frontend,
            # native/audiofeat.cpp) or the waveform wire + on-device
            # frontend. rolloff_pallas is also static: the Pallas rolloff
            # search wins standalone (speech-only graph) but measured
            # negative INSIDE the fused tri-modal graph, where XLA
            # overlaps the cumsum matmul with the image/BERT stages and
            # the custom-call boundary only adds a barrier (interleaved
            # chain A/B b64 2026-08-21; see audio_features_56).
            if self._host_audio:
                feats = waves
            else:
                feats = af.audio_features_56(_decode_waves(waves),
                                             use_pallas=use_pallas,
                                             rolloff_pallas=rolloff_pallas)
            x = (feats - scaler[0]) / scaler[1]
            if dnn_pallas is not None:
                packed = dnn_pallas(x)
                probs = packed[:, :7]
                penult = packed[:, 7:7 + dnn_pallas.penult_dim]
            else:
                probs, penult = speech_model.apply(variables, x)
            return jnp.concatenate([probs, penult], axis=-1)  # (B, 7+64)

        def bert_fwd(variables, ids, mask):
            logits, cls = bert_model.apply(variables, ids, mask)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.concatenate([probs, cls], axis=-1)     # (B, 7+768)

        def lstm_fwd(variables, ids):
            probs, _pen = lstm_model.apply(variables, ids)
            return probs

        def image_fwd(variables, img_wire):
            x = _decode_image(img_wire) / 255.0
            x = (x - mean) / std
            logits, feat = image_model.apply(variables, x)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.concatenate([probs, feat], axis=-1)    # (B, 7+512)

        def fusion_fwd(variables, s_feat, t_feat, i_feat, s_p, t_p, i_p):
            logits, aw, dw = fusion_model.apply(variables, s_feat, t_feat,
                                                i_feat, s_p, t_p, i_p)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.concatenate([probs, aw, dw], axis=-1)  # (B, 7+3+3)

        # README-advertised fusion variant: random forest over the
        # concatenated per-modality softmax outputs, evaluated as one
        # level-synchronous jitted walk (models/forest.py). Comparisons
        # run fp32 — tree thresholds define the walk exactly. A forest
        # fitted on fewer classes scatters into the full 7-wide vector
        # (static index set, validated at load).
        forest_depth = (int(self.forest['meta']['depth'])
                        if self.forest is not None else 0)
        forest_classes = (self.forest['classes']
                          if self.forest is not None
                          else tuple(range(Config.NUM_EMOTIONS)))

        def forest_fwd(arrays, s_p, t_p, i_p):
            x = jnp.concatenate([s_p, t_p, i_p],
                                axis=-1).astype(jnp.float32)
            p = forest_ops.forest_apply(arrays, x, forest_depth)
            if forest_classes == tuple(range(Config.NUM_EMOTIONS)):
                return p
            full = jnp.zeros((p.shape[0], Config.NUM_EMOTIONS), p.dtype)
            return full.at[:, jnp.asarray(forest_classes)].set(p)

        def trimodal_fwd(sv, scaler, bv, iv, fv, waves, ids, mask, img_wire):
            """One traced graph: 3 encoders (single pass each) + fusion,
            packed into a single (B, 7+7+7+13) output = one fetch
            (tail is 7 wide in rf fusion mode — no attention weights)."""
            s = speech_fwd(sv, scaler, waves, rolloff_pallas=False)
            s_probs, s_pen = s[:, :7], s[:, 7:]
            t = bert_fwd(bv, ids, mask)
            t_probs, cls = t[:, :7], t[:, 7:]
            im = image_fwd(iv, img_wire)
            i_probs, i_feat = im[:, :7], im[:, 7:]
            if self._fusion_kind == 'rf':  # static at trace time
                f = forest_fwd(fv, s_probs, t_probs, i_probs)
            else:
                f = fusion_fwd(fv, s_pen, cls, i_feat,
                               s_probs, t_probs, i_probs)
            return jnp.concatenate([s_probs, t_probs, i_probs, f], axis=-1)

        self._speech_jit = jax.jit(speech_fwd)
        self._bert_jit = jax.jit(bert_fwd)
        self._lstm_jit = jax.jit(lstm_fwd)
        self._image_jit = jax.jit(image_fwd)
        self._fusion_jit = jax.jit(fusion_fwd)
        self._forest_jit = jax.jit(forest_fwd)
        self._trimodal_jit = jax.jit(trimodal_fwd)
        self._spectral_jit = jax.jit(af.spectral_features_4)

    @property
    def _fusion_dispatch_vars(self):
        """The fusion-slot argument of the tri-modal graph: forest arrays
        in rf mode, the attention net's variables otherwise."""
        if self._fusion_kind == 'rf':
            return self.forest['arrays']
        return self.fusion['variables'] if self.fusion else None

    def _fusion_from_packed(self, row: np.ndarray) -> Dict[str, Any]:
        """Slice the fusion tail of a packed tri-modal output row."""
        if self._fusion_kind == 'rf':
            r = result_dict(row[21:28])
            r['method'] = 'random_forest'
            return r
        return self._fusion_result(row[21:28], row[28:31], row[31:34])

    def warmup(self, buckets: Sequence[int] = (1,)) -> None:
        """Compile the serving graphs ahead of traffic (exactly the
        padded/placed shapes the predict paths dispatch, including the
        fused tri-modal graph when all models are live)."""
        all_live = (self._fusion_kind is not None and self.speech is not None
                    and self.bert is not None and self.image is not None)
        # every seq bucket PLUS the full-length fallback _seq_slice can
        # dispatch (texts longer than the largest bucket, or an empty/
        # misconfigured MEC_SEQ_BUCKETS) — nothing may compile on the
        # request hot path
        seqs = sorted({s for s in Config.SEQ_BUCKETS
                       if s < Config.MAX_TEXT_LENGTH}
                      | {Config.MAX_TEXT_LENGTH})
        for b in buckets:
            t_bucket = time.perf_counter()
            b = self._bucket(b)
            waves = np.zeros((b, af.N_SAMPLES), np.float32)
            full_ids = np.zeros((b, Config.MAX_TEXT_LENGTH), np.int32)
            imgs = np.zeros((b,) + self._image_size + (3,), np.uint8)
            if self.speech:
                self._run_speech(waves)
            if self.lstm:
                self._lstm_jit(self.lstm['variables'], self._place(full_ids))
            if self.image:
                self._image_jit(self.image['variables'],
                                self._place(self._wire_image(imgs, b)))
            if self.bert or all_live:
                w_wire = self._place(self._wire_waves(waves, b))
                i_wire = self._place(self._wire_image(imgs, b))
                for s in seqs:  # every dispatched (batch, seq) shape
                    ids = self._place(full_ids[:, :s])
                    if self.bert:
                        self._bert_jit(self.bert['variables'], ids, ids)
                    if all_live:
                        self._trimodal_jit(
                            self.speech['variables'], self.speech['scaler'],
                            self.bert['variables'], self.image['variables'],
                            self._fusion_dispatch_vars,
                            w_wire, ids, ids, i_wire)
            # per-bucket compile cost is visible at startup, not as
            # mystery latency under traffic (compiles through the remote
            # tunnel here have measured 41-154 s per shape; BASELINE.md
            # batch-128 root-cause)
            log.info('warmup: bucket %d compiled in %.1fs', b,
                     time.perf_counter() - t_bucket)

    # ------------------------------------------------------------------
    # per-modality prediction (batched, fallback-laddered)
    # ------------------------------------------------------------------
    @property
    def _compress(self) -> bool:
        return (self.compute_dtype == jnp.bfloat16
                and bool(Config.WIRE_COMPRESS))

    def _wire_waves(self, waves: np.ndarray, bucket: int):
        """Perf mode ships packed 12-bit PCM with a per-clip scale
        (37.5% of the float32 bytes over the device link, measured
        feature-transparent — see serving/wire.py for why 8-bit is not)
        or PCM16 with MEC_WIRE_COMPRESS=0; parity mode ships float32.
        Expanded on device by _decode_waves. Row-padded to the bucket.

        With host featurization on, the audio wire is the (B, 56)
        feature matrix itself — 224 B/clip; accepts either waveforms
        (featurized here) or already-featurized (B, 56) rows."""
        if self._host_audio:
            if waves.shape[1] != 56:
                from mec_tpu.native import featurizer
                waves = featurizer.extract56(waves)
            return _pad_rows(np.ascontiguousarray(waves, np.float32),
                             bucket)
        if self._compress:
            packed, scale = wire.encode_pcm12(waves)
            return (_pad_rows(packed, bucket), _pad_rows(scale, bucket))
        if self.compute_dtype == jnp.bfloat16:
            pcm = np.clip(np.rint(waves * 32768.0),
                          -32768, 32767).astype(np.int16)
            return _pad_rows(pcm, bucket)
        return _pad_rows(waves, bucket)

    def _seq_slice(self, ids: np.ndarray, mask: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Slice BERT inputs to the smallest Config.SEQ_BUCKETS bucket
        covering the batch's longest real sequence. Exact: padded keys'
        additive bias (dtype min) underflows their attention weight to
        0.0, so dropping them cannot change any logit (pinned by
        tests/test_inference.py). BERT cost is linear in padded length
        and emotion texts are mostly short — this is ~4x on the text
        stage for <=32-token batches."""
        longest = int(mask.sum(axis=1).max()) if mask.size else 1
        for s in sorted(Config.SEQ_BUCKETS):
            if longest <= s and s <= ids.shape[1]:
                return ids[:, :s], mask[:, :s]
        return ids, mask

    def _wire_image(self, imgs: np.ndarray, bucket: int):
        """Perf mode ships YUV 4:2:0 (half the uint8 RGB bytes); parity
        mode ships raw uint8. Row-padded to the dispatch bucket.
        4:2:0 subsampling needs even H/W (wire.py invariant) — an
        odd-resolution artifact ships raw uint8 instead of crashing."""
        if (self._compress and imgs.shape[1] % 2 == 0
                and imgs.shape[2] % 2 == 0):
            y8, uv8 = wire.encode_yuv420(imgs)
            return (_pad_rows(y8, bucket), _pad_rows(uv8, bucket))
        return _pad_rows(imgs, bucket)

    def _run_speech(self, waves: np.ndarray):
        b = self._bucket(waves.shape[0])
        packed = np.asarray(self._speech_jit(
            self.speech['variables'], self.speech['scaler'],
            self._put(self._wire_waves(waves, b))
            ))[:waves.shape[0]]
        return packed[:, :7], packed[:, 7:]

    def predict_speech_waves(self, waves: np.ndarray,
                             want_features: bool = False) -> List[Dict]:
        """(B, 66150) float32 -> result dicts (+features for fusion)."""
        if self.speech is None:
            return [self._speech_heuristic(w) for w in waves]
        probs, penult = self._run_speech(waves)
        out = []
        for i in range(waves.shape[0]):
            r = result_dict(probs[i])
            if want_features:
                r['_features'] = penult[i]
            out.append(r)
        return out

    def _speech_heuristic(self, wave: np.ndarray) -> Dict[str, Any]:
        """RMS/centroid threshold fallback
        (reference speech_inference.py:36-58)."""
        zcr, centroid, rolloff, rms = np.asarray(
            self._spectral_jit(wave[None, :]))[0]
        if rms > 0.06 and centroid > 2000:
            label = 'angry'
        elif rms < 0.02 and centroid < 1500:
            label = 'sad'
        else:
            label = 'neutral'
        probs = heuristic_probs(label)
        return {'emotion': label, 'confidence': float(max(probs)),
                'all_probabilities': probs, '_fallback': True}

    def predict_speech_paths(self, paths: Sequence[str],
                             want_features: bool = False) -> List[Dict]:
        waves = np.zeros((len(paths), af.N_SAMPLES), np.float32)
        decoded = np.ones(len(paths), bool)
        for i, p in enumerate(paths):
            try:
                waves[i] = wav.load_and_fix_length(p)[0]
            except Exception as e:  # degrade-don't-fail: undecodable ->
                log.warning('audio decode failed for %s: %s', p, e)
                decoded[i] = False
        out = self.predict_speech_waves(waves, want_features)
        for i, ok in enumerate(decoded):
            if not ok:
                probs = heuristic_probs('neutral')
                out[i] = {'emotion': 'neutral',
                          'confidence': float(max(probs)),
                          'all_probabilities': probs, '_fallback': True}
        return out

    def text_keyword_heuristic(self, text: str) -> Dict[str, Any]:
        """Keyword-map fallback (reference text_inference.py:53-70)."""
        cleaned = clean_text(text)
        selected = 'neutral'
        for label, keywords in KEYWORD_MAP.items():
            for kw in keywords:
                if f' {kw} ' in f' {cleaned} ':
                    selected = label
                    break
            if selected != 'neutral':
                break
        probs = heuristic_probs(selected)
        return {'emotion': selected, 'confidence': float(max(probs)),
                'all_probabilities': probs, '_fallback': True}

    def predict_texts(self, texts: Sequence[str],
                      want_features: bool = False) -> List[Dict]:
        if self.bert is None or self.bert_tokenizer is None:
            return [self.text_keyword_heuristic(t) for t in texts]
        ids, mask = self._seq_slice(*self.bert_tokenizer.encode_batch(
            list(texts), Config.MAX_TEXT_LENGTH))
        b = self._bucket(ids.shape[0])
        packed = np.asarray(self._bert_jit(
            self.bert['variables'],
            *self._put((_pad_rows(ids, b),
                        _pad_rows(mask, b)))))[:ids.shape[0]]
        probs, cls = packed[:, :7], packed[:, 7:]
        out = []
        for i in range(len(texts)):
            r = result_dict(probs[i])
            if want_features:
                r['_features'] = cls[i]
            out.append(r)
        return out

    def predict_texts_lstm(self, texts: Sequence[str]) -> List[Dict]:
        """The fast Bi-LSTM variant (reference text_lstm_inference.py)."""
        if self.lstm is None or self.lstm_tokenizer is None:
            return [self.text_keyword_heuristic(t) for t in texts]
        cleaned = [t.lower().strip() for t in texts]
        ids = self.lstm_tokenizer.encode_batch(cleaned,
                                               Config.MAX_TEXT_LENGTH)
        b = self._bucket(ids.shape[0])
        probs = np.asarray(self._lstm_jit(
            self.lstm['variables'],
            self._put(_pad_rows(ids, b))))[:len(texts)]
        return [result_dict(p) for p in probs]

    IMAGE_FALLBACK_LABEL = 'neutral'

    def image_fallback(self) -> Dict[str, Any]:
        probs = heuristic_probs(self.IMAGE_FALLBACK_LABEL)
        return {'emotion': self.IMAGE_FALLBACK_LABEL,
                'confidence': float(max(probs)),
                'all_probabilities': probs, '_fallback': True}

    def predict_images(self, imgs_u8: np.ndarray,
                       want_features: bool = False) -> List[Dict]:
        """(B, H, W, 3) uint8 -> result dicts (H, W = self._image_size,
        224x224 unless the artifact declares another size)."""
        if self.image is None:
            return [self.image_fallback() for _ in range(imgs_u8.shape[0])]
        b = self._bucket(imgs_u8.shape[0])
        packed = np.asarray(self._image_jit(
            self.image['variables'],
            self._put(self._wire_image(imgs_u8, b))))[:imgs_u8.shape[0]]
        probs, feat = packed[:, :7], packed[:, 7:]
        out = []
        for i in range(imgs_u8.shape[0]):
            r = result_dict(probs[i])
            if want_features:
                r['_features'] = feat[i]
            out.append(r)
        return out

    def predict_image_paths(self, paths: Sequence[str],
                            want_features: bool = False) -> List[Dict]:
        if self.image is None:
            return [self.image_fallback() for _ in paths]
        try:
            imgs = self._decode_images(paths)
        except Exception as e:
            log.warning('image decode failed: %s', e)
            return [self.image_fallback() for _ in paths]
        return self.predict_images(imgs, want_features)

    # ------------------------------------------------------------------
    # fusion
    # ------------------------------------------------------------------
    WEIGHTS = [0.3, 0.35, 0.35]  # speech, text, image (reference :23)

    def fuse_weighted(self, speech_probs, text_probs, image_probs
                      ) -> Dict[str, Any]:
        """Weighted-average fallback
        (reference multimodal_fusion.py:184-199)."""
        n = len(EMOTIONS)
        s = np.array(speech_probs) if speech_probs is not None else np.zeros(n)
        t = np.array(text_probs) if text_probs is not None else np.zeros(n)
        i = np.array(image_probs) if image_probs is not None else np.zeros(n)
        weighted = (self.WEIGHTS[0] * s + self.WEIGHTS[1] * t
                    + self.WEIGHTS[2] * i)
        if weighted.sum() > 0:
            weighted = weighted / weighted.sum()
        idx = int(np.argmax(weighted))
        return {'emotion': EMOTIONS[idx],
                'confidence': float(weighted[idx]),
                'all_probabilities': weighted.tolist()}

    def fuse_attention(self, s_feat, t_feat, i_feat, s_p, t_p, i_p
                       ) -> Dict[str, Any]:
        packed = np.asarray(self._fusion_jit(
            self.fusion['variables'],
            np.asarray(s_feat, np.float32)[None],
            np.asarray(t_feat, np.float32)[None],
            np.asarray(i_feat, np.float32)[None],
            np.asarray(s_p, np.float32)[None],
            np.asarray(t_p, np.float32)[None],
            np.asarray(i_p, np.float32)[None]))[0]
        return self._fusion_result(packed[:7], packed[7:10], packed[10:13])

    @staticmethod
    def _fusion_result(probs, aw, dw) -> Dict[str, Any]:
        r = result_dict(probs)
        r['attention_weights'] = {'speech': float(aw[0]),
                                  'text': float(aw[1]),
                                  'image': float(aw[2])}
        r['decision_weights'] = {'speech': float(dw[0]),
                                 'text': float(dw[1]),
                                 'image': float(dw[2])}
        return r

    # ------------------------------------------------------------------
    # multimodal orchestration (reference multimodal_fusion.py:244-287)
    # ------------------------------------------------------------------
    def predict_multimodal(self, audio_path: Optional[str] = None,
                           text: Optional[str] = None,
                           image_path: Optional[str] = None
                           ) -> Dict[str, Dict]:
        all_live = (self._fusion_kind is not None and self.speech is not None
                    and self.bert is not None and self.image is not None)
        use_trimodal = all_live and audio_path and text and image_path

        if use_trimodal:
            try:
                return self._predict_trimodal_fused(audio_path, text,
                                                    image_path)
            except Exception as e:
                log.warning('fused tri-modal path failed: %s', e)

        results: Dict[str, Dict] = {}
        if audio_path:
            results['speech'] = self.predict_speech_paths([audio_path])[0]
        if text:
            results['text'] = self.predict_texts([text])[0]
        if image_path:
            results['image'] = self.predict_image_paths([image_path])[0]
        if len(results) > 1:
            results['fusion'] = self.fuse_weighted(
                results.get('speech', {}).get('all_probabilities'),
                results.get('text', {}).get('all_probabilities'),
                results.get('image', {}).get('all_probabilities'))
        for r in results.values():
            r.pop('_features', None)
        return results

    def _predict_trimodal_fused(self, audio_path: str, text: str,
                                image_path: str) -> Dict[str, Dict]:
        """Single device dispatch for the flagship path.

        Batch-1 passes host numpy STRAIGHT into the jit call — measured
        fastest (2026-08-17, interleaved same-window shootout: 42.2 ms
        median vs 43.5 one-put vs 45.1 per-component-puts): the whole
        wire is ~140 KB, so per-put tunnel round trips cost more than
        the upload they could overlap. The explicit-put convention is
        for BATCHED payloads (MBs), where overlap wins — see
        predict_multimodal_batch. Same window's echo RTT (tiny jit
        dispatch + fetch): 29.3 ms median — the floor this path can
        never beat through the remote tunnel."""
        from mec_tpu.image.preprocess import load_image_uint8
        b = self._bucket(1)
        # Every phase is timed in THIS call (same-window attribution —
        # bench.py medians self._last_b1_phases over its p50 reps, so
        # the decomposition sums to the measured p50 instead of being a
        # cross-window subtraction). ~6 perf_counter calls of overhead.
        pc = time.perf_counter
        t0 = pc()
        if self._b1_stream:
            # Stream each wire component to the device the moment it is
            # encoded (audio first — it is the largest, ~99 KB):
            # device_put is async through the tunnel, so the upload
            # overlaps tokenize + image decode and the jit dispatch
            # receives device handles instead of blocking on transfer.
            waves = wav.load_and_fix_length(audio_path)[0][None, :]
            t1 = pc()
            w_arg = self._put(self._wire_waves(waves, b))
            t1b = pc()
            ids, mask = self._seq_slice(*self.bert_tokenizer.encode_batch(
                [text], Config.MAX_TEXT_LENGTH))
            t2 = pc()
            t_args = self._put((_pad_rows(ids, b), _pad_rows(mask, b)))
            t2b = pc()
            img = load_image_uint8(image_path, self._image_size)[None]
            t3 = pc()
            i_arg = self._put(self._wire_image(img, b))
            t4 = pc()
            packed = np.asarray(self._trimodal_jit(
                self.speech['variables'], self.speech['scaler'],
                self.bert['variables'], self.image['variables'],
                self._fusion_dispatch_vars,
                w_arg, *t_args, i_arg))[0]
            t5 = pc()
            # each put (encode + async device_put dispatch, milliseconds
            # on a 1-core host — see _put) is accounted to ONE phase, so
            # the decomposition never misattributes put cost to
            # tokenize/image_load
            phases = {'wav_load': t1 - t0, 'tokenize': t2 - t1b,
                      'image_load': t3 - t2b,
                      'wire_encode_put': (t1b - t1) + (t2b - t2)
                      + (t4 - t3),
                      'dispatch_fetch': t5 - t4}
        else:
            waves = wav.load_and_fix_length(audio_path)[0][None, :]
            t1 = pc()
            ids, mask = self._seq_slice(*self.bert_tokenizer.encode_batch(
                [text], Config.MAX_TEXT_LENGTH))
            t2 = pc()
            img = load_image_uint8(image_path, self._image_size)[None]
            t3 = pc()
            args = (self._wire_waves(waves, b), _pad_rows(ids, b),
                    _pad_rows(mask, b), self._wire_image(img, b))
            t4 = pc()
            packed = np.asarray(self._trimodal_jit(
                self.speech['variables'], self.speech['scaler'],
                self.bert['variables'], self.image['variables'],
                self._fusion_dispatch_vars, *args))[0]
            t5 = pc()
            phases = {'wav_load': t1 - t0, 'tokenize': t2 - t1,
                      'image_load': t3 - t2, 'wire_encode': t4 - t3,
                      'dispatch_fetch': t5 - t4}
        out = {
            'speech': result_dict(packed[:7]),
            'text': result_dict(packed[7:14]),
            'image': result_dict(packed[14:21]),
            'fusion': self._fusion_from_packed(packed),
        }
        phases['result_unpack'] = pc() - t5
        self._last_b1_phases = {k: v * 1e3 for k, v in phases.items()}
        return out

    def predecode_multimodal(self, request: Dict) -> Dict:
        """Decode a tri-modal request's uploads in the CALLER's thread
        (the WSGI request thread), so batch formation never waits on
        host decode: predict_multimodal_batch consumes the 'wave' /
        'image' arrays directly. PIL/wav decode release the GIL in
        their C paths, so concurrent request threads decode in
        parallel — this moved ~3 ms/request of image decode off the
        coalescing critical path (round-3 VERDICT item 3). Decode
        failures keep only the path: the batch path re-attempts and
        degrades that request down the fallback ladder (its error
        handling stays in one place)."""
        from mec_tpu.image.preprocess import load_image_uint8
        out = dict(request)
        if request.get('audio_path') and out.get('wave') is None:
            try:
                out['wave'] = wav.load_and_fix_length(
                    request['audio_path'])[0]
            except Exception:
                pass
        if request.get('image_path') and out.get('image') is None:
            try:
                out['image'] = load_image_uint8(request['image_path'],
                                                self._image_size)
            except Exception:
                pass
        return out

    def predict_multimodal_batch(self, requests: Sequence[Dict]
                                 ) -> List[Dict[str, Dict]]:
        """Batched tri-modal: requests with all three inputs share one
        dispatch; the rest take the per-modality path. Requests may
        carry pre-decoded 'wave'/'image' arrays (predecode_multimodal)
        — those skip the decode pool entirely."""
        out: List[Optional[Dict]] = [None] * len(requests)
        degraded: Dict[int, Dict[str, Any]] = {}
        full_idx = [i for i, r in enumerate(requests)
                    if r.get('audio_path') and r.get('text')
                    and r.get('image_path')]
        all_live = (self._fusion_kind is not None and self.speech is not None
                    and self.bert is not None and self.image is not None)
        if all_live and full_idx:
            # Per-request decode with isolation: one undecodable upload
            # must degrade THAT request down the fallback ladder (via the
            # single-request path below), not fail the whole coalesced
            # batch with it (reference behavior: degrade, don't fail).
            # Audio and image decodes for the whole batch run interleaved
            # on the decode pool (both release the GIL in their C paths);
            # pre-decoded entries resolve immediately.
            from mec_tpu.image.preprocess import load_image_uint8

            def _ready(val):
                f: "Future" = Future()
                f.set_result(val)
                return f

            pool = (self._ensure_decode_pool()
                    if any(requests[i].get('wave') is None
                           or requests[i].get('image') is None
                           for i in full_idx) else None)
            t_dec = time.perf_counter()
            futs = [(i,
                     _ready(requests[i]['wave'])
                     if requests[i].get('wave') is not None else
                     pool.submit(lambda p: wav.load_and_fix_length(p)[0],
                                 requests[i]['audio_path']),
                     _ready(requests[i]['image'])
                     if requests[i].get('image') is not None else
                     pool.submit(load_image_uint8,
                                 requests[i]['image_path'],
                                 self._image_size))
                    for i in full_idx]
            # Audio results land first (wav parse is ~10x cheaper than
            # image decode); encode + device_put the audio wire NOW so
            # its upload streams while the image decodes finish
            # (device_put is async — see _put).
            audio_good = []
            for i, wf, imf in futs:
                try:
                    audio_good.append((i, wf.result(), imf))
                except Exception as e:
                    log.warning('batch audio decode failed (%s): %s',
                                requests[i]['audio_path'], e)
                    imf.cancel()
                    degraded[i] = {'audio_failed': True}

            def stage_audio_text(rows):
                """Encode + device_put the audio wire and token ids for
                `rows` [(req_idx, wave, ...)]; starts their uploads."""
                sb = self._bucket(len(rows))
                sw = np.stack([w for _i, w, _x in rows])
                s_ids, s_mask = self._seq_slice(
                    *self.bert_tokenizer.encode_batch(
                        [requests[i]['text'] for i, _w, _x in rows],
                        Config.MAX_TEXT_LENGTH))
                return (sb, *self._put((self._wire_waves(sw, sb),
                                        _pad_rows(s_ids, sb),
                                        _pad_rows(s_mask, sb))))

            if audio_good:
                b, w_dev, ids_dev, mask_dev = stage_audio_text(audio_good)
            good = []
            for i, w, imf in audio_good:
                try:
                    good.append((i, w, imf.result()))
                except Exception as e:
                    log.warning('batch image decode failed (%s): %s',
                                requests[i]['image_path'], e)
                    degraded[i] = {'wave': w, 'image_failed': True}
            if len(good) != len(audio_good) and good:
                # rare: an image decode failed after the audio rows were
                # already streaming — restage the (cheap) host-side parts
                # for the surviving rows only
                b, w_dev, ids_dev, mask_dev = stage_audio_text(good)
            full_idx = [i for i, _w, _im in good]
            stage_timer.record('trimodal.decode_stage_ms',
                               (time.perf_counter() - t_dec) * 1e3)
        if all_live and full_idx:
            imgs = np.stack([im for _i, _w, im in good])
            with stage_timer.span('trimodal.dispatch_fetch'):
                packed = np.asarray(self._trimodal_jit(
                    self.speech['variables'], self.speech['scaler'],
                    self.bert['variables'], self.image['variables'],
                    self._fusion_dispatch_vars,
                    w_dev, ids_dev, mask_dev,
                    self._put(self._wire_image(imgs, b))))
            for j, i in enumerate(full_idx):
                row = packed[j]
                out[i] = {
                    'speech': result_dict(row[:7]),
                    'text': result_dict(row[7:14]),
                    'image': result_dict(row[14:21]),
                    'fusion': self._fusion_from_packed(row),
                }
        for i, r in enumerate(requests):
            if out[i] is None:
                if i in degraded:
                    # decode already failed once in this batch — build
                    # the fallback-ladder result from the pieces instead
                    # of re-running the fused path (which would re-decode
                    # the good audio and re-fail on the bad image)
                    out[i] = self._predict_degraded(r, **degraded[i])
                else:
                    out[i] = self.predict_multimodal(r.get('audio_path'),
                                                     r.get('text'),
                                                     r.get('image_path'))
        return out

    def _predict_degraded(self, request: Dict, wave=None,
                          audio_failed: bool = False,
                          image_failed: bool = False) -> Dict[str, Dict]:
        """Full tri-modal request with one undecodable upload (detected
        in the batched path): per-modality results + weighted fusion —
        exactly what the single-request ladder produces — computed from
        what already decoded, with no second decode attempt."""
        results: Dict[str, Dict] = {}
        if audio_failed:
            probs = heuristic_probs('neutral')
            results['speech'] = {'emotion': 'neutral',
                                 'confidence': float(max(probs)),
                                 'all_probabilities': probs,
                                 '_fallback': True}
        elif wave is not None:
            results['speech'] = self.predict_speech_waves(wave[None])[0]
        results['text'] = self.predict_texts([request['text']])[0]
        results['image'] = (self.image_fallback() if image_failed
                            else self.predict_image_paths(
                                [request['image_path']])[0])
        results['fusion'] = self.fuse_weighted(
            results['speech'].get('all_probabilities'),
            results['text'].get('all_probabilities'),
            results['image'].get('all_probabilities'))
        for r in results.values():
            r.pop('_features', None)
        return results


_engine: Optional[EmotionEngine] = None
_engine_lock = threading.Lock()


def get_engine(models_dir: Optional[str] = None,
               reload: bool = False) -> EmotionEngine:
    global _engine
    with _engine_lock:
        if _engine is None or reload:
            _engine = EmotionEngine(models_dir=models_dir)
        return _engine
