"""Random-init serving artifacts for benchmarks, demos, and tests.

The reference ships no model weights; its README documents running with
deterministic fallbacks (reference README.md:148). For benchmarking and
hermetic tests we need the *real* compute graphs live, so this factory
writes randomly-initialized artifacts in the native .mecp layout the
serving engine loads: full-size by default (bert-base, ResNet50), or a
tiny variant for fast CPU tests.
"""

from __future__ import annotations

import json
import os
import string
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mec_tpu.config import Config
from mec_tpu.convert import store
from mec_tpu.models.bert import BertForSequenceClassification
from mec_tpu.models.bilstm import BiLSTMTextModel
from mec_tpu.models.fusion import MultiModalFusionModel
from mec_tpu.models.resnet import ImageEmotionModel
from mec_tpu.models.speech_dnn import SpeechDNN
from mec_tpu.text.keras_tokenizer import KerasTokenizer

_WORDS = ('the a i you it is was happy sad angry fear disgust surprise '
          'neutral love hate great terrible wonderful awful day today feel '
          'feeling so very really not no yes and or but this that').split()


def make_vocab() -> Dict[str, int]:
    """Small, deterministic WordPiece-compatible vocab."""
    tokens = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]']
    tokens += list(string.ascii_lowercase) + list(string.digits)
    tokens += ['##' + c for c in string.ascii_lowercase + string.digits]
    tokens += _WORDS
    return {t: i for i, t in enumerate(tokens)}


def write_synthetic_artifacts(models_dir: str, *, tiny: bool = False,
                              seed: int = 0,
                              image_arch: str = 'resnet50',
                              image_size: int = 224) -> str:
    """Populate `models_dir` with all five artifacts; returns the dir.

    image_arch/image_size select the image variant ('mobilenet_v2' and
    e.g. 48 for the FER2013-native fast configuration)."""
    os.makedirs(models_dir, exist_ok=True)
    rng = jax.random.PRNGKey(seed)

    # speech DNN + scaler
    speech = SpeechDNN()
    v = speech.init(rng, jnp.zeros((1, 56), jnp.float32))
    store.save_params(os.path.join(models_dir, 'speech_model.mecp'),
                      {'params': v['params'],
                       'batch_stats': v['batch_stats']})
    np.savez(os.path.join(models_dir, 'speech_scaler.npz'),
             mean=np.zeros(56, np.float32), scale=np.ones(56, np.float32))

    # BERT dir (config + vocab + params)
    vocab = make_vocab()
    bert_dir = os.path.join(models_dir, 'bert_model')
    os.makedirs(bert_dir, exist_ok=True)
    if tiny:
        kwargs = dict(vocab_size=len(vocab), hidden_size=64, num_layers=2,
                      num_heads=2, intermediate_size=128, max_position=128)
    else:
        kwargs = dict(vocab_size=len(vocab))
    bert = BertForSequenceClassification(**kwargs)
    dummy = jnp.zeros((1, 8), jnp.int32)
    v = bert.init(rng, dummy, dummy)
    store.save_params(os.path.join(bert_dir, 'bert_model.mecp'),
                      {'params': v['params']})
    cfg = {'vocab_size': bert.vocab_size, 'hidden_size': bert.hidden_size,
           'num_hidden_layers': bert.num_layers,
           'num_attention_heads': bert.num_heads,
           'intermediate_size': bert.intermediate_size,
           'max_position_embeddings': bert.max_position,
           'type_vocab_size': bert.type_vocab_size, 'num_labels': 7}
    with open(os.path.join(bert_dir, 'config.json'), 'w') as f:
        json.dump(cfg, f)
    inv = sorted(vocab.items(), key=lambda kv: kv[1])
    with open(os.path.join(bert_dir, 'vocab.txt'), 'w') as f:
        f.write('\n'.join(t for t, _ in inv))

    # Bi-LSTM + tokenizer
    lstm = BiLSTMTextModel(vocab_size=1000 if tiny else 10000)
    v = lstm.init(rng, jnp.zeros((1, Config.MAX_TEXT_LENGTH), jnp.int32))
    store.save_params(os.path.join(models_dir, 'text_model.mecp'),
                      {'params': v['params']})
    tok = KerasTokenizer(num_words=1000 if tiny else 10000)
    tok.fit_on_texts([' '.join(_WORDS)])
    tok.to_json_file(os.path.join(models_dir, 'text_model_tokenizer.json'))

    # image encoder (the engine detects the arch from the params layout
    # and serves at the artifact-declared resolution)
    if image_arch == 'mobilenet_v2':
        from mec_tpu.models.mobilenet import MobileNetV2EmotionModel
        image = MobileNetV2EmotionModel()
    else:
        image = ImageEmotionModel()
    v = image.init(rng, jnp.zeros((1, image_size, image_size, 3),
                                  jnp.float32))
    store.save_params(os.path.join(models_dir, 'image_model.mecp'),
                      {'params': v['params'],
                       'batch_stats': v['batch_stats']},
                      meta={'arch': image_arch, 'img_size': image_size})

    # fusion
    cfg = {'speech_dim': 64, 'text_dim': kwargs.get('hidden_size', 768),
           'image_dim': 512, 'num_classes': 7, 'hidden_dim': 256}
    fusion = MultiModalFusionModel(**cfg)
    v = fusion.init(rng, jnp.zeros((1, cfg['speech_dim'])),
                    jnp.zeros((1, cfg['text_dim'])),
                    jnp.zeros((1, cfg['image_dim'])),
                    jnp.zeros((1, 7)), jnp.zeros((1, 7)),
                    jnp.zeros((1, 7)))
    store.save_params(os.path.join(models_dir, 'fusion_model.mecp'),
                      {'params': v['params']}, meta={'config': cfg})
    return models_dir
