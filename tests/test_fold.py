"""Conv+BN folding parity (round-2 VERDICT item 2).

bf16 serving folds every image-model (conv, BN) pair into the conv
kernel + a bias at artifact load (ops/fold.fold_conv_bn) and serves
with fold_bn=True. These tests pin the fold in fp32: the folded model
must match the live-batch_stats model to the 1e-4 logit-parity budget
(reference eval-mode semantics: inference/image_inference.py:48-92).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mec_tpu.ops.fold import fold_conv_bn


def _random_stats(variables, seed=3):
    """Realistic running statistics (init gives mean=0, var=1 — folding
    those exercises nothing)."""
    rng = np.random.RandomState(seed)
    stats = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                   variables['batch_stats'])

    def fill(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                fill(v)
            elif k == 'mean':
                tree[k] = rng.randn(*v.shape).astype(np.float32) * 0.5
            elif k == 'var':
                tree[k] = rng.uniform(0.25, 2.0, v.shape).astype(np.float32)
    fill(stats)
    return {'params': variables['params'], 'batch_stats': stats}


@pytest.mark.parametrize('arch', ['resnet50', 'mobilenet_v2'])
def test_fold_matches_live_batch_stats_fp32(arch):
    if arch == 'resnet50':
        from mec_tpu.models.resnet import ImageEmotionModel as Model
    else:
        from mec_tpu.models.mobilenet import MobileNetV2EmotionModel as Model
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    live = Model()
    variables = _random_stats(live.init(jax.random.PRNGKey(0),
                                        jnp.asarray(x), train=True))
    want_logits, want_feat = live.apply(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, x)

    folded = fold_conv_bn(variables)
    got_logits, got_feat = Model(fold_bn=True).apply(folded, x)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_feat),
                               np.asarray(want_feat), atol=1e-4)


def test_stem_s2d_matches_standard_conv():
    """The space-to-depth stem (models/resnet._stem_conv_s2d,
    Config.STEM_S2D) is an exact algebraic rewrite of the 7x7/2 conv:
    same params tree, logits within fp32 summation-order noise."""
    import jax.numpy as jnp
    from mec_tpu.models.resnet import ImageEmotionModel
    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    live = ImageEmotionModel()
    variables = _random_stats(live.init(jax.random.PRNGKey(0),
                                        jnp.asarray(x), train=True))
    folded = fold_conv_bn(variables)
    want, wfeat = ImageEmotionModel(fold_bn=True).apply(folded, x)
    got, gfeat = ImageEmotionModel(fold_bn=True,
                                   stem_s2d=True).apply(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gfeat), np.asarray(wfeat),
                               atol=1e-4)
    # odd input sizes fall back to the standard conv (guard, not crash)
    x_odd = np.random.RandomState(1).randn(1, 63, 63, 3).astype(np.float32)
    lo, _ = ImageEmotionModel(fold_bn=True, stem_s2d=True).apply(
        folded, x_odd)
    assert np.isfinite(np.asarray(lo)).all()


def test_fold_rejects_unfoldable_trees():
    with pytest.raises(ValueError, match='no .conv, bn. pairs'):
        fold_conv_bn({'params': {'fc1': {'kernel': np.ones((2, 2)),
                                         'bias': np.zeros(2)}},
                      'batch_stats': {}})
    # a bn the fold missed must raise, not silently change the graph
    from mec_tpu.models.resnet import ImageEmotionModel
    v = ImageEmotionModel().init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)), train=True)
    v = jax.tree_util.tree_map(np.asarray, v)
    stats = dict(v['batch_stats'])
    stats['orphan_bn'] = {'mean': np.zeros(4, np.float32),
                          'var': np.ones(4, np.float32)}
    with pytest.raises(ValueError, match='leaves'):
        fold_conv_bn({'params': v['params'], 'batch_stats': stats})


def test_fold_keeps_conv_own_bias():
    """A use_bias conv before BN (legal in converted torch artifacts)
    folds as beta + (b0 - mean) * s — the conv bias must not be
    silently dropped."""
    rng = np.random.RandomState(7)
    K = rng.randn(3, 3, 4, 8).astype(np.float32)
    b0 = rng.randn(8).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.randn(8).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = rng.uniform(0.25, 2.0, 8).astype(np.float32)
    folded = fold_conv_bn({
        'params': {'conv1': {'kernel': K, 'bias': b0},
                   'bn1': {'scale': gamma, 'bias': beta}},
        'batch_stats': {'bn1': {'mean': mean, 'var': var}}})
    s = gamma / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(folded['params']['conv1']['kernel'], K * s,
                               rtol=1e-6)
    np.testing.assert_allclose(folded['params']['conv1']['bias'],
                               beta + (b0 - mean) * s, rtol=1e-6)


def test_fold_rejects_unknown_conv_params():
    """An unrecognized conv param key must refuse to fold (the engine
    then serves with live batch_stats) rather than drop it."""
    with pytest.raises(ValueError, match='unexpected params'):
        fold_conv_bn({
            'params': {'conv1': {'kernel': np.ones((1, 1, 2, 2),
                                                   np.float32),
                                 'prelu': np.ones(2, np.float32)},
                       'bn1': {'scale': np.ones(2, np.float32),
                               'bias': np.zeros(2, np.float32)}},
            'batch_stats': {'bn1': {'mean': np.zeros(2, np.float32),
                                    'var': np.ones(2, np.float32)}}})


def test_engine_bf16_folds_image_artifact(tmp_path):
    """bf16 engine folds at load and serves decisions consistent with the
    fp32 live-BN engine (the perf-mode contract, tests/test_perf_mode.py
    pattern)."""
    from mec_tpu.config import Config
    from mec_tpu.convert import store
    from mec_tpu.models.mobilenet import MobileNetV2EmotionModel

    img_size = 32
    model = MobileNetV2EmotionModel()
    variables = _random_stats(model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, img_size, img_size, 3)),
        train=True), seed=5)
    models_dir = str(tmp_path)
    store.save_params(
        store.native_path(str(tmp_path / 'image_model.pt')), variables,
        meta={'arch': 'mobilenet_v2', 'img_size': img_size})

    from tests.test_perf_mode import _engine
    imgs = np.random.RandomState(2).randint(
        0, 255, (3, img_size, img_size, 3), np.uint8)
    fp32 = _engine(models_dir, 'float32')
    assert fp32._image_folded is False
    r32 = fp32.predict_images(imgs)
    bf16 = _engine(models_dir, 'bfloat16')
    assert bf16._image_folded is True
    r16 = bf16.predict_images(imgs)
    for a, b in zip(r32, r16):
        np.testing.assert_allclose(np.asarray(a['all_probabilities']),
                                   np.asarray(b['all_probabilities']),
                                   atol=0.05)
        if a['confidence'] > 0.6:
            assert a['emotion'] == b['emotion']
