"""Regression tests for the round-2 review findings (webapp limiter
keying, malformed-cookie/CSRF robustness, batcher full-bucket drain,
degraded-batch double-decode)."""

import time
import types

import numpy as np

from mec_tpu.webapp import ratelimit
from mec_tpu.webapp.sessions import Session, dump_session, load_session


class TestRateLimiterKeying:
    def test_default_and_login_rules_do_not_share_windows(self):
        """The app dispatcher checks DEFAULT_RULES and the login handler
        checks LOGIN_RULES against the same key; index-keyed windows made
        them share deques (one GET of /login consumed login budget)."""
        rl = ratelimit.RateLimiter()
        key = 'login:1.2.3.4'
        assert rl.allow(key, ratelimit.DEFAULT_RULES)  # the page GET
        login_rules = ((5, 900.0),)
        for _ in range(5):
            assert rl.allow(key, login_rules)
        assert not rl.allow(key, login_rules)          # 6th attempt denied
        # the default budget is unaffected by login-rule hits
        assert rl.allow(key, ratelimit.DEFAULT_RULES)

    def test_register_budget_not_consumed_by_page_view(self):
        rl = ratelimit.RateLimiter()
        key = 'register:1.2.3.4'
        rl.allow(key, ratelimit.DEFAULT_RULES)
        reg = ((3, 3600.0),)
        assert all(rl.allow(key, reg) for _ in range(3))
        assert not rl.allow(key, reg)


class TestCookieRobustness:
    def test_non_ascii_signature_yields_fresh_session(self):
        # attacker-controlled sig must never raise (compare_digest
        # TypeErrors on non-ASCII str)
        s = load_session('YWJj.sig\xe9xyz')
        assert isinstance(s, Session) and not s

    def test_garbage_cookie_yields_fresh_session(self):
        for bad in ('', 'no-dot', '..', 'a.b', '\xff\xfe.\xff'):
            assert not load_session(bad)

    def test_round_trip_still_works(self):
        s = Session({'user_id': 7})
        assert load_session(dump_session(s))['user_id'] == 7

    def test_csrf_non_ascii_token_rejected_not_raised(self):
        from mec_tpu.webapp.app import EmotionApp
        app = EmotionApp.__new__(EmotionApp)  # no engine/db needed
        app.testing = False
        req = types.SimpleNamespace(form={'csrf_token': 'é\x80'})
        sess = Session({'_csrf': 'abc123'})
        assert app._check_csrf(req, sess) is False


def test_batcher_full_bucket_drains_before_timeout():
    """A full largest bucket must dispatch immediately, not sit out the
    linger timeout."""
    from mec_tpu.serving.batcher import BatchQueue
    from concurrent.futures import ThreadPoolExecutor
    q = BatchQueue(lambda items: list(items), max_batch=4, timeout_s=5.0,
                   name='drain-test')
    try:
        t0 = time.perf_counter()
        with ThreadPoolExecutor(4) as pool:
            futs = [pool.submit(q.submit, i) for i in range(4)]
            results = [f.result(timeout=4.0) for f in futs]
        elapsed = time.perf_counter() - t0
        assert sorted(results) == [0, 1, 2, 3]
        assert elapsed < 3.0, f'full bucket waited the timeout ({elapsed:.1f}s)'
    finally:
        q.stop()


def test_batch_degraded_image_skips_redecodes(tmp_path, monkeypatch):
    """A coalesced batch row with an undecodable image degrades via the
    pieces already decoded — the audio is decoded exactly once and the
    bad image attempted exactly once."""
    from mec_tpu.ops import wav as wav_ops
    from mec_tpu.serving import engine as eng
    from mec_tpu.serving.synthetic_artifacts import write_synthetic_artifacts
    from PIL import Image

    d = str(tmp_path / 'models')
    write_synthetic_artifacts(d, tiny=True)
    engine = eng.EmotionEngine(models_dir=d)

    wav_path = str(tmp_path / 'a.wav')
    t = np.arange(22050 * 3) / 22050.0
    wav_ops.write_wav(wav_path, (0.2 * np.sin(2 * np.pi * 440 * t)
                                 ).astype(np.float32), 22050)
    img_path = str(tmp_path / 'i.png')
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (64, 64, 3), np.uint8)).save(img_path)
    bad_img = str(tmp_path / 'bad.png')
    with open(bad_img, 'wb') as f:
        f.write(b'not an image')

    calls = {'wav': 0, 'img': 0}
    real_wav = wav_ops.load_and_fix_length
    monkeypatch.setattr(
        wav_ops, 'load_and_fix_length',
        lambda *a, **k: (calls.__setitem__('wav', calls['wav'] + 1),
                         real_wav(*a, **k))[1])
    import mec_tpu.image.preprocess as prep
    real_img = prep.load_image_uint8
    monkeypatch.setattr(
        prep, 'load_image_uint8',
        lambda *a, **k: (calls.__setitem__('img', calls['img'] + 1),
                         real_img(*a, **k))[1])

    reqs = [{'audio_path': wav_path, 'text': 'happy day',
             'image_path': img_path},
            {'audio_path': wav_path, 'text': 'happy day',
             'image_path': bad_img}]
    out = engine.predict_multimodal_batch(reqs)

    # degraded row: real speech + text results, image fallback, weighted
    # fusion (no attention weights) — the single-request ladder semantics
    assert out[1]['image'].get('_fallback')
    assert 'attention_weights' not in out[1]['fusion']
    assert not out[1]['speech'].get('_fallback')  # audio decoded fine
    assert 'attention_weights' in out[0]['fusion']  # good row: fused path
    # decode economy: 2 audio decodes (one per request), 2 image attempts
    assert calls['wav'] == 2, calls
    assert calls['img'] == 2, calls


def test_fusion_trainer_even_batch_split_no_tracer_leak(tmp_path):
    """Reproduced crash: with the train split dividing evenly by
    batch_size, fit()'s lax.scan path traced a side-effecting step that
    leaked aw/dw tracers into on_epoch_end's np.asarray."""
    from mec_tpu.training import train_fusion
    # 200 samples -> 170/30 split... ensure evenly-dividing batch size
    best_vars, cfg, hist = train_fusion.train(
        num_samples=200, epochs=1, batch_size=43, models_dir=str(tmp_path),
        verbose=False)
    assert np.isfinite(hist['lr']).all(), hist['lr']   # no 'lr: nan'


def test_native_wordpiece_control_chars_match_python():
    """DEL (0x7f) strips like Python's Cc cleanup; an embedded NUL must
    not truncate the text (routed back to the Python encoder)."""
    import pytest as _pytest
    from mec_tpu.text.wordpiece import WordPieceTokenizer
    from mec_tpu.native import tokenizer as nat
    vocab = {t: i for i, t in enumerate(
        ['[PAD]', '[UNK]', '[CLS]', '[SEP]', 'ab', 'abc', 'hello',
         'world', '##c'])}
    tk = WordPieceTokenizer(vocab)
    ref_ids, ref_mask = tk.encode_batch(['ab\x7fc', 'a\x00hello world'], 16)
    if not nat.accelerate(tk):
        _pytest.skip('native tokenizer unavailable (no compiler)')
    ids, mask = tk.encode_batch(['ab\x7fc', 'a\x00hello world'], 16)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_array_equal(mask, ref_mask)
