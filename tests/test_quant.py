"""Int8 quantization parity (ops/quant.py, models/qconv.py).

bf16 serving quantizes the BN-folded ResNet50 bottleneck convs AND the
BERT encoder matmuls to int8 (per-output-channel weights at load,
per-example/per-token dynamic activation scales on device) for the
measured 1.6-1.8x MXU rate (examples/probe_int8.py). These tests pin
the contract: decisions match fp32 on confident inputs, probabilities
stay inside the perf-mode band, and — because activation scales are
per-example/per-token, never per-batch — a request's logits do not
depend on what shares its serving bucket (reference eval-mode
semantics per request, reference inference/image_inference.py:104-129,
reference inference/text_inference.py:72-104).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mec_tpu.models.resnet import ImageEmotionModel
from mec_tpu.ops.fold import fold_conv_bn
from mec_tpu.ops.quant import quantize_image_params

from tests.test_fold import _random_stats


@pytest.fixture(scope='module')
def folded_resnet():
    model = ImageEmotionModel()
    variables = _random_stats(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True))
    return variables, fold_conv_bn(variables)


def test_quantized_forward_matches_fp32(folded_resnet):
    variables, folded = folded_resnet
    x = np.random.RandomState(0).randn(4, 64, 64, 3).astype(np.float32)
    want, _ = ImageEmotionModel().apply(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, x)
    q = quantize_image_params(folded)
    got, _ = ImageEmotionModel(fold_bn=True, quant=True).apply(q, x)
    pw = np.asarray(jax.nn.softmax(want))
    pg = np.asarray(jax.nn.softmax(got))
    # 16 sequential int8 blocks measured softmax Linf 0.033 on this
    # random-init net (near-tied classes amplify logit error through
    # the softmax); 0.05 is the perf-mode band (test_perf_mode.py)
    np.testing.assert_allclose(pg, pw, atol=0.05)
    # decisions agree wherever fp32 is confident (all 4 rows here)
    confident = pw.max(-1) > 0.5
    assert confident.any()
    assert (pw.argmax(-1) == pg.argmax(-1))[confident].all()


def test_quantized_forward_is_batch_invariant(folded_resnet):
    """Per-example activation scales: batch-of-N == N x batch-of-1."""
    _, folded = folded_resnet
    q = quantize_image_params(folded)
    model = ImageEmotionModel(fold_bn=True, quant=True)
    x = np.random.RandomState(1).randn(3, 64, 64, 3).astype(np.float32)
    batched, _ = model.apply(q, x)
    for i in range(3):
        single, _ = model.apply(q, x[i:i + 1])
        np.testing.assert_allclose(np.asarray(single),
                                   np.asarray(batched[i:i + 1]), atol=1e-4)


def test_quantized_forward_zero_input_is_finite(folded_resnet):
    """All-zero bucket-padding rows hit the activation-scale epsilon
    floor, not a divide-by-zero."""
    _, folded = folded_resnet
    q = quantize_image_params(folded)
    logits, feat = ImageEmotionModel(fold_bn=True, quant=True).apply(
        q, np.zeros((1, 64, 64, 3), np.float32))
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(feat)).all()


def test_quantize_rejects_unfolded_trees(folded_resnet):
    variables, _ = folded_resnet
    with pytest.raises(ValueError, match='BN-folded'):
        quantize_image_params(variables)
    with pytest.raises(ValueError, match='no folded convs'):
        quantize_image_params({'params': {'fc1': {
            'kernel': np.ones((2, 2), np.float32),
            'bias': np.zeros(2, np.float32)}}})


def test_quant_requires_fold_bn():
    with pytest.raises(ValueError, match='quant requires fold_bn'):
        ImageEmotionModel(quant=True).apply(
            {'params': {}}, np.zeros((1, 32, 32, 3), np.float32))


def test_static_scales_match_fp32_and_saturate_gracefully(folded_resnet):
    """quant_mode='static' (calibrated per-layer act_scale,
    ops/quant.calibrate_static_scales): parity on in-range inputs, and
    out-of-calibration-range inputs saturate at +-127 without NaN/Inf
    (the standard static-PTQ clip)."""
    from mec_tpu.ops.quant import calibrate_static_scales
    variables, folded = folded_resnet
    x = np.random.RandomState(0).randn(4, 64, 64, 3).astype(np.float32)
    q = quantize_image_params(folded)
    qs = calibrate_static_scales(
        ImageEmotionModel(fold_bn=True, quant=True), q, (x[:2],))
    want, _ = ImageEmotionModel().apply(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, x)
    got, _ = ImageEmotionModel(fold_bn=True, quant=True,
                               quant_mode='static').apply(qs, x)
    pw = np.asarray(jax.nn.softmax(want))
    pg = np.asarray(jax.nn.softmax(got))
    np.testing.assert_allclose(pg, pw, atol=0.05)  # measured 0.018
    confident = pw.max(-1) > 0.5
    assert (pw.argmax(-1) == pg.argmax(-1))[confident].all()
    # 5x the calibration range: clipped, never non-finite
    wild, _ = ImageEmotionModel(fold_bn=True, quant=True,
                                quant_mode='static').apply(qs, 5.0 * x)
    assert np.isfinite(np.asarray(wild)).all()


def test_bert_static_scales_match_fp32(tiny_bert):
    from mec_tpu.models.bert import BertForSequenceClassification
    from mec_tpu.ops.quant import (quantize_bert_params,
                                   calibrate_static_scales)
    cfg, v, ids, mask = tiny_bert
    want, _ = BertForSequenceClassification(**cfg).apply(v, ids, mask)
    q = quantize_bert_params(v)
    qs = calibrate_static_scales(
        BertForSequenceClassification(**cfg, quant=True), q,
        (ids[:2], mask[:2]))
    got, _ = BertForSequenceClassification(
        **cfg, quant=True, quant_mode='static').apply(qs, ids, mask)
    pw = np.asarray(jax.nn.softmax(want))
    pg = np.asarray(jax.nn.softmax(got))
    np.testing.assert_allclose(pg, pw, atol=0.02)  # measured 0.0044


@pytest.fixture(scope='module')
def tiny_bert():
    from mec_tpu.models.bert import BertForSequenceClassification
    cfg = dict(vocab_size=200, hidden_size=64, num_layers=3, num_heads=4,
               intermediate_size=128, max_position=64)
    model = BertForSequenceClassification(**cfg)
    ids = np.random.RandomState(0).randint(0, 200, (3, 16)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 10:] = 0
    v = model.init(jax.random.PRNGKey(0), ids, mask)
    return cfg, v, ids, mask


def test_bert_quantized_forward_matches_fp32(tiny_bert):
    from mec_tpu.models.bert import BertForSequenceClassification
    from mec_tpu.ops.quant import quantize_bert_params
    cfg, v, ids, mask = tiny_bert
    want, wcls = BertForSequenceClassification(**cfg).apply(v, ids, mask)
    q = quantize_bert_params(v)
    got, gcls = BertForSequenceClassification(**cfg, quant=True).apply(
        q, ids, mask)
    pw = np.asarray(jax.nn.softmax(want))
    pg = np.asarray(jax.nn.softmax(got))
    # measured Linf 0.0023 on this net (18 int8 matmuls); 0.02 headroom
    np.testing.assert_allclose(pg, pw, atol=0.02)
    # the [CLS] feature feeds fusion — pin its drift too (measured 0.043)
    np.testing.assert_allclose(np.asarray(gcls), np.asarray(wcls),
                               atol=0.15)


def test_bert_quantized_forward_is_batch_invariant(tiny_bert):
    """Per-token activation scales: a padded request's logits are the
    same alone and in a bucket with other requests."""
    from mec_tpu.models.bert import BertForSequenceClassification
    from mec_tpu.ops.quant import quantize_bert_params
    cfg, v, ids, mask = tiny_bert
    q = quantize_bert_params(v)
    model = BertForSequenceClassification(**cfg, quant=True)
    batched, _ = model.apply(q, ids, mask)
    single, _ = model.apply(q, ids[1:2], mask[1:2])
    np.testing.assert_allclose(np.asarray(single),
                               np.asarray(batched[1:2]), atol=1e-4)


def test_engine_bf16_quantizes_bert_artifact(tmp_path):
    """bf16 engine quantizes the BERT artifact at load; text decisions
    stay consistent with fp32 (keyworded sentences = the confident
    case, reference text_inference.py:72-104 contract)."""
    from mec_tpu.serving.synthetic_artifacts import write_synthetic_artifacts
    write_synthetic_artifacts(str(tmp_path), tiny=True)
    from tests.test_perf_mode import _engine
    texts = ['i am so happy today', 'this is terrible and sad',
             'what a surprise']
    fp32 = _engine(str(tmp_path), 'float32')
    assert fp32._bert_quant is False
    r32 = fp32.predict_texts(texts)
    bf16 = _engine(str(tmp_path), 'bfloat16')
    assert bf16._bert_quant is True
    assert bf16._bert_quant_mode == 'static'  # load-time calibration ran
    r16 = bf16.predict_texts(texts)
    for a, b in zip(r32, r16):
        np.testing.assert_allclose(np.asarray(a['all_probabilities']),
                                   np.asarray(b['all_probabilities']),
                                   atol=0.05)
        if a['confidence'] > 0.6:
            assert a['emotion'] == b['emotion']


def test_engine_bf16_quantizes_resnet_artifact(tmp_path):
    """bf16 engine folds + quantizes a ResNet50 artifact at load and
    serves decisions consistent with the fp32 live-BN engine."""
    from mec_tpu.convert import store

    img_size = 32
    variables = _random_stats(ImageEmotionModel().init(
        jax.random.PRNGKey(1), jnp.zeros((1, img_size, img_size, 3)),
        train=True), seed=5)
    store.save_params(
        store.native_path(str(tmp_path / 'image_model.pt')), variables,
        meta={'img_size': img_size})

    from tests.test_perf_mode import _engine
    imgs = np.random.RandomState(2).randint(
        0, 255, (3, img_size, img_size, 3), np.uint8)
    fp32 = _engine(str(tmp_path), 'float32')
    assert fp32._image_quant is False
    r32 = fp32.predict_images(imgs)
    bf16 = _engine(str(tmp_path), 'bfloat16')
    assert bf16._image_folded is True and bf16._image_quant is True
    assert bf16._image_quant_mode == 'static'  # load-time calibration ran
    r16 = bf16.predict_images(imgs)
    for a, b in zip(r32, r16):
        # three lossy stages stack here: YUV 4:2:0 wire chroma (random
        # noise images are the worst case), bf16 compute, int8 convs —
        # measured 0.059 on this random-init net whose classes are all
        # near-tied (max prob 0.38). The pure-quantization band is the
        # 0.05 asserted in test_quantized_forward_matches_fp32.
        np.testing.assert_allclose(np.asarray(a['all_probabilities']),
                                   np.asarray(b['all_probabilities']),
                                   atol=0.08)
        if a['confidence'] > 0.6:
            assert a['emotion'] == b['emotion']
