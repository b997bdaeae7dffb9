"""Random-forest fusion: XLA tree-ensemble parity vs REAL sklearn.

Unlike the librosa/torchvision oracles (reimplementations — see
BASELINE.md), sklearn ships in this image, so these tests pin the
vectorized forest walk against the upstream library itself.
"""

import os

import numpy as np
import pytest

from mec_tpu.models import forest


def _fit_rf(n_estimators=25, n_features=21, n_classes=7, n_samples=500,
            seed=0, **kw):
    from sklearn.ensemble import RandomForestClassifier
    rng = np.random.RandomState(seed)
    x = rng.rand(n_samples, n_features).astype(np.float32)
    # class-correlated so trees actually split
    y = (x[:, :n_classes].argmax(axis=1) + rng.randint(0, 2, n_samples)
         ) % n_classes
    rf = RandomForestClassifier(n_estimators=n_estimators, random_state=seed,
                                **kw).fit(x, y)
    assert rf.n_classes_ == n_classes
    return rf, rng.rand(64, n_features).astype(np.float32)


def _apply(rf, x):
    arrays, meta = forest.from_sklearn(rf)
    return np.asarray(forest.forest_apply(arrays, x, meta['depth']))


class TestForestParity:
    def test_matches_sklearn_proba(self):
        rf, x = _fit_rf()  # unbounded depth, 25 trees
        ours = _apply(rf, x)
        ref = rf.predict_proba(x)
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        assert (ours.argmax(axis=1) == rf.predict(x)).all()

    def test_depth_one_stumps(self):
        rf, x = _fit_rf(n_estimators=8, max_depth=1)
        np.testing.assert_allclose(_apply(rf, x), rf.predict_proba(x),
                                   atol=1e-6)

    def test_single_leaf_tree(self):
        # one training class -> every tree is a root leaf (max_depth 0)
        from sklearn.ensemble import RandomForestClassifier
        x = np.random.RandomState(0).rand(20, 5).astype(np.float32)
        rf = RandomForestClassifier(n_estimators=3, random_state=0
                                    ).fit(x, np.zeros(20, np.int64))
        ours = _apply(rf, x[:7])
        np.testing.assert_allclose(ours, rf.predict_proba(x[:7]), atol=1e-6)

    def test_ragged_tree_sizes_padded(self):
        # mixed depths force node-count padding across trees
        rf, x = _fit_rf(n_estimators=12, max_depth=None, n_samples=900,
                        min_samples_leaf=1)
        sizes = {est.tree_.node_count for est in rf.estimators_}
        assert len(sizes) > 1, 'fixture should produce ragged trees'
        np.testing.assert_allclose(_apply(rf, x), rf.predict_proba(x),
                                   atol=1e-6)


class TestForestConvertStore:
    def test_mecp_roundtrip(self, tmp_path):
        from mec_tpu.convert import store
        rf, x = _fit_rf(n_estimators=6, max_depth=4)
        arrays, meta = forest.from_sklearn(rf)
        path = str(tmp_path / 'fusion_rf.mecp')
        store.save_params(path, {'forest': arrays}, meta=meta)
        loaded = store.load_params(path)
        out = np.asarray(forest.forest_apply(
            loaded['variables']['forest'], x,
            int(loaded['meta']['depth'])))
        np.testing.assert_allclose(out, rf.predict_proba(x), atol=1e-6)

    def test_convert_fusion_rf_pkl(self, tmp_path):
        import joblib
        from mec_tpu.convert.sklearn_rf import convert_fusion_rf
        rf, x = _fit_rf(n_estimators=5, max_depth=3)
        pkl = str(tmp_path / 'fusion_rf.pkl')
        joblib.dump(rf, pkl)
        variables, meta = convert_fusion_rf(pkl)
        out = np.asarray(forest.forest_apply(variables['forest'], x,
                                             meta['depth']))
        np.testing.assert_allclose(out, rf.predict_proba(x), atol=1e-6)

    def test_convert_rejects_non_forest(self, tmp_path):
        import joblib
        from mec_tpu.convert.sklearn_rf import convert_fusion_rf
        pkl = str(tmp_path / 'not_a_forest.pkl')
        joblib.dump({'weights': [1, 2, 3]}, pkl)
        with pytest.raises((ValueError, AttributeError)):
            convert_fusion_rf(pkl)


def test_trainer_fits_and_saves(tmp_path):
    from mec_tpu.training import train_fusion_rf
    rf, arrays, meta = train_fusion_rf.train(
        num_samples=700, n_estimators=12, max_depth=8,
        models_dir=str(tmp_path), verbose=False)
    # the synthetic distribution peaks each modality's softmax at the true
    # label (reference train_fusion_model.py:457-519) — trivially learnable
    assert meta['val_acc'] > 0.8
    assert os.path.exists(tmp_path / 'fusion_rf.pkl')
    assert os.path.exists(tmp_path / 'fusion_rf.mecp')


@pytest.fixture(scope='module')
def rf_engine(tmp_path_factory):
    """Engine in MEC_FUSION_MODE=rf over synthetic encoder artifacts."""
    from mec_tpu.config import Config
    from mec_tpu.serving import engine as eng
    from mec_tpu.serving.synthetic_artifacts import write_synthetic_artifacts
    from mec_tpu.training import train_fusion_rf
    d = str(tmp_path_factory.mktemp('rf_models'))
    write_synthetic_artifacts(d, tiny=True)
    rf, _arrays, _meta = train_fusion_rf.train(
        num_samples=400, n_estimators=8, max_depth=6, models_dir=d,
        verbose=False)
    old = Config.FUSION_MODE
    Config.FUSION_MODE = 'rf'
    try:
        yield eng.EmotionEngine(models_dir=d), rf
    finally:
        Config.FUSION_MODE = old


@pytest.fixture(scope='module')
def rf_assets(tmp_path_factory):
    from mec_tpu.ops import wav as wav_ops
    from PIL import Image
    d = tmp_path_factory.mktemp('rf_assets')
    t = np.arange(22050 * 3) / 22050.0
    y = (0.25 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    wav_path = str(d / 'a.wav')
    wav_ops.write_wav(wav_path, y, 22050)
    img_path = str(d / 'i.png')
    Image.fromarray(np.random.RandomState(1).randint(
        0, 255, (224, 224, 3), np.uint8)).save(img_path)
    return wav_path, img_path, 'what a wonderful surprise'


class TestEngineRFMode:
    def test_trimodal_rf_fusion(self, rf_engine, rf_assets):
        engine, rf = rf_engine
        wav_path, img_path, text = rf_assets
        out = engine.predict_multimodal(wav_path, text, img_path)
        assert engine._fusion_kind == 'rf'
        f = out['fusion']
        assert f.get('method') == 'random_forest'
        assert 'attention_weights' not in f
        probs = np.asarray(f['all_probabilities'])
        assert probs.shape == (7,) and abs(probs.sum() - 1) < 1e-5
        # end-to-end parity: the served fusion tail equals real sklearn
        # applied to the served per-modality softmax outputs (fp32 mode)
        x = np.concatenate([out['speech']['all_probabilities'],
                            out['text']['all_probabilities'],
                            out['image']['all_probabilities']]
                           ).astype(np.float32)[None]
        np.testing.assert_allclose(probs, rf.predict_proba(x)[0], atol=1e-5)

    def test_batch_matches_single(self, rf_engine, rf_assets):
        engine, _rf = rf_engine
        wav_path, img_path, text = rf_assets
        req = {'audio_path': wav_path, 'text': text, 'image_path': img_path}
        single = engine.predict_multimodal(**{
            'audio_path': wav_path, 'text': text, 'image_path': img_path})
        batch = engine.predict_multimodal_batch([req] * 3)
        for r in batch:
            np.testing.assert_allclose(
                r['fusion']['all_probabilities'],
                single['fusion']['all_probabilities'], atol=1e-5)

    def test_rf_mode_without_artifact_degrades(self, tmp_path, rf_assets):
        """MEC_FUSION_MODE=rf with no forest artifact serves the
        attention/weighted ladder instead of failing."""
        from mec_tpu.config import Config
        from mec_tpu.serving import engine as eng
        from mec_tpu.serving.synthetic_artifacts import (
            write_synthetic_artifacts)
        d = str(tmp_path / 'models')
        write_synthetic_artifacts(d, tiny=True)
        old = Config.FUSION_MODE
        Config.FUSION_MODE = 'rf'
        try:
            engine = eng.EmotionEngine(models_dir=d)
            assert engine._fusion_kind == 'attention'
            wav_path, img_path, text = rf_assets
            out = engine.predict_multimodal(wav_path, text, img_path)
            assert 'attention_weights' in out['fusion']
        finally:
            Config.FUSION_MODE = old


class TestReviewHardening:
    def test_threshold_floor32_invariant(self):
        """Thresholds are stored as the largest float32 <= the float64
        sklearn threshold, so `x <= t` decisions match sklearn exactly
        for float32 inputs (midpoint round-up would flip boundary
        cases)."""
        rf, _x = _fit_rf(n_estimators=10, n_samples=900)
        arrays, _meta = forest.from_sklearn(rf)
        for i, est in enumerate(rf.estimators_):
            t = est.tree_
            n = t.node_count
            internal = t.children_left[:n] != -1
            t64 = t.threshold[:n][internal]
            t32 = arrays['threshold'][i, :n][internal]
            assert (t32.astype(np.float64) <= t64).all()
            up = np.nextafter(t32, np.float32(np.inf), dtype=np.float32)
            assert (up.astype(np.float64) > t64).all()

    def test_parity_on_training_values(self):
        # inputs exactly equal to training feature values are the ones
        # that can sit on split boundaries
        rf, _ = _fit_rf(n_estimators=20, n_samples=600, seed=3)
        rng = np.random.RandomState(3)
        x_train = rng.rand(600, 21).astype(np.float32)  # same draw as fit
        np.testing.assert_allclose(_apply(rf, x_train),
                                   rf.predict_proba(x_train), atol=1e-6)
        assert (_apply(rf, x_train).argmax(1) == rf.predict(x_train)).all()

    def test_engine_rejects_missing_depth(self, tmp_path):
        from mec_tpu.config import Config
        from mec_tpu.serving.engine import EmotionEngine
        arrays, meta = forest.from_sklearn(_fit_rf(n_estimators=3)[0])
        del meta['depth']
        from mec_tpu.convert import store
        d = tmp_path / 'models'
        d.mkdir()
        store.save_params(str(d / 'fusion_rf.mecp'), {'forest': arrays},
                          meta=meta)
        old = Config.FUSION_MODE
        Config.FUSION_MODE = 'rf'
        try:
            e = EmotionEngine(models_dir=str(d))
            assert e.forest is None          # rejected at load
            assert e._fusion_kind is None    # fallback ladder
        finally:
            Config.FUSION_MODE = old

    def test_engine_rejects_wrong_feature_count(self, tmp_path):
        from mec_tpu.config import Config
        from mec_tpu.serving.engine import EmotionEngine
        rf, _ = _fit_rf(n_estimators=3, n_features=10)
        arrays, meta = forest.from_sklearn(rf)
        from mec_tpu.convert import store
        d = tmp_path / 'models'
        d.mkdir()
        store.save_params(str(d / 'fusion_rf.mecp'), {'forest': arrays},
                          meta=meta)
        old = Config.FUSION_MODE
        Config.FUSION_MODE = 'rf'
        try:
            assert EmotionEngine(models_dir=str(d)).forest is None
        finally:
            Config.FUSION_MODE = old

    def test_class_subset_scatters_to_full_vector(self, tmp_path):
        """A forest fitted without some emotions (possible via a small
        --manifest) must scatter its outputs into the full 7-wide vector
        rather than shifting labels."""
        from sklearn.ensemble import RandomForestClassifier
        from mec_tpu.config import Config
        from mec_tpu.convert import store
        from mec_tpu.serving.engine import EmotionEngine
        from mec_tpu.serving.synthetic_artifacts import (
            write_synthetic_artifacts)
        rng = np.random.RandomState(0)
        x = rng.rand(300, 21).astype(np.float32)
        y = rng.choice([0, 2, 6], 300)  # happy, angry, neutral only
        rf = RandomForestClassifier(n_estimators=6, max_depth=5,
                                    random_state=0).fit(x, y)
        arrays, meta = forest.from_sklearn(rf)
        assert meta['classes'] == [0, 2, 6]
        d = str(tmp_path / 'models')
        write_synthetic_artifacts(d, tiny=True)
        store.save_params(f'{d}/fusion_rf.mecp', {'forest': arrays},
                          meta=meta)
        old = Config.FUSION_MODE
        Config.FUSION_MODE = 'rf'
        try:
            e = EmotionEngine(models_dir=d)
            assert e._fusion_kind == 'rf' and e.forest['classes'] == (0, 2, 6)
            probe = rng.rand(2, 21).astype(np.float32)
            out = np.asarray(e._forest_jit(e.forest['arrays'],
                                           probe[:, :7], probe[:, 7:14],
                                           probe[:, 14:]))
            assert out.shape == (2, 7)
            np.testing.assert_allclose(out[:, [0, 2, 6]],
                                       rf.predict_proba(probe), atol=1e-6)
            assert (out[:, [1, 3, 4, 5]] == 0).all()
        finally:
            Config.FUSION_MODE = old

    def test_attention_mode_skips_forest_load(self, tmp_path):
        """With the default MEC_FUSION_MODE=attention, a present forest
        artifact is not loaded (no device memory for arrays the graph
        never reads)."""
        from mec_tpu.config import Config
        from mec_tpu.serving.engine import EmotionEngine
        from mec_tpu.convert import store
        arrays, meta = forest.from_sklearn(_fit_rf(n_estimators=3)[0])
        d = tmp_path / 'models'
        d.mkdir()
        store.save_params(str(d / 'fusion_rf.mecp'), {'forest': arrays},
                          meta=meta)
        # pin the mode: the module-scoped rf_engine fixture holds
        # FUSION_MODE='rf' until module teardown
        old = Config.FUSION_MODE
        Config.FUSION_MODE = 'attention'
        try:
            e = EmotionEngine(models_dir=str(d))
            assert e.forest is None
        finally:
            Config.FUSION_MODE = old


def test_odd_image_size_rejected_and_wire_safe(tmp_path):
    import pytest as _pytest
    from mec_tpu.training import train_image
    rng = np.random.RandomState(0)
    with _pytest.raises(SystemExit, match='even'):
        train_image.train(data_root='', img_size=49, epochs=1,
                          models_dir=str(tmp_path),
                          imgs=rng.randint(0, 255, (8, 49, 49, 3), np.uint8),
                          labels=(np.arange(8) % 7).astype(np.int32),
                          augment=False, verbose=False)


def test_webapp_renders_rf_fusion_chip(tmp_path):
    """The HTML results page shows the random-forest badge when rf
    fusion served (and the API JSON carries method=random_forest)."""
    from werkzeug.test import Client
    from mec_tpu.config import Config
    from mec_tpu.database import Database
    from mec_tpu.ops import wav as wav_ops
    from mec_tpu.serving import engine as eng
    from mec_tpu.serving.synthetic_artifacts import write_synthetic_artifacts
    from mec_tpu.training import train_fusion_rf
    from mec_tpu.webapp.app import create_app
    from PIL import Image

    d = str(tmp_path / 'models')
    write_synthetic_artifacts(d, tiny=True)
    train_fusion_rf.train(num_samples=300, n_estimators=6, max_depth=5,
                          models_dir=d, verbose=False)
    old_mode, old_upload = Config.FUSION_MODE, Config.UPLOAD_FOLDER
    Config.FUSION_MODE = 'rf'
    Config.UPLOAD_FOLDER = str(tmp_path / 'uploads')
    try:
        eng.get_engine(models_dir=d, reload=True)
        client = Client(create_app(db=Database(str(tmp_path / 'web.db')),
                                   testing=True))
        client.post('/register', data={'username': 'tester',
                                       'email': 't@example.com',
                                       'password': 'password123'})
        wavp = str(tmp_path / 'a.wav')
        t = np.arange(22050 * 3) / 22050.0
        wav_ops.write_wav(wavp, (0.2 * np.sin(2 * np.pi * 440 * t)
                                 ).astype(np.float32), 22050)
        imgp = str(tmp_path / 'i.png')
        Image.fromarray(np.random.RandomState(0).randint(
            0, 255, (64, 64, 3), np.uint8)).save(imgp)
        r = client.post('/predict/multimodal',
                        data={'text_input': 'so happy today',
                              'audio_file': (open(wavp, 'rb'), 'a.wav'),
                              'image_file': (open(imgp, 'rb'), 'i.png')})
        assert r.status_code == 200
        assert 'random-forest fusion' in r.get_data(as_text=True)
        rj = client.post('/api/predict/multimodal',
                         data={'text': 'so happy today',
                               'audio': (open(wavp, 'rb'), 'a.wav'),
                               'image': (open(imgp, 'rb'), 'i.png')})
        assert rj.status_code == 200
        assert rj.get_json()['fusion'].get('method') == 'random_forest'
    finally:
        Config.FUSION_MODE = old_mode
        Config.UPLOAD_FOLDER = old_upload
        eng._engine = None  # drop the global so other tests rebuild
