"""Route tests through the WSGI app (mirrors reference tests/test_routes.py:
public pages :27-44, register/login/logout :47-86, auth redirect :92-94,
JSON statistics :109-116, 404 :143-145 — plus the predict and API predict
contracts the reference never tests)."""

import io
import json
import os

import numpy as np
import pytest
from werkzeug.test import Client

from mec_tpu.database import Database
from mec_tpu.webapp.app import create_app


@pytest.fixture()
def app(tmp_path):
    os.environ['UPLOAD_FOLDER'] = str(tmp_path / 'uploads')
    from mec_tpu.config import Config
    Config.UPLOAD_FOLDER = str(tmp_path / 'uploads')
    db = Database(str(tmp_path / 'web.db'))
    return create_app(db=db, testing=True)


@pytest.fixture()
def client(app):
    return Client(app)


@pytest.fixture()
def logged_in(client):
    client.post('/register', data={'username': 'tester',
                                   'email': 'tester@example.com',
                                   'password': 'password123'})
    return client


def _wav_bytes():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mec_tpu.ops import wav as wav_ops
    import tempfile
    path = tempfile.mktemp(suffix='.wav')
    wav_ops.write_wav(path, np.sin(np.arange(66150) / 20.0
                                   ).astype(np.float32) * 0.2, 22050)
    with open(path, 'rb') as f:
        return f.read()


def test_public_pages(client):
    for path in ('/', '/login', '/register'):
        assert client.get(path).status_code == 200


def test_security_headers(client):
    r = client.get('/')
    assert r.headers['X-Content-Type-Options'] == 'nosniff'
    assert r.headers['X-Frame-Options'] == 'DENY'


def test_404(client):
    assert client.get('/definitely-not-a-page').status_code == 404


def test_auth_redirect(client):
    r = client.get('/dashboard')
    assert r.status_code == 302
    assert '/login' in r.headers['Location']


def test_register_login_logout_flow(client):
    r = client.post('/register', data={'username': 'flow',
                                       'email': 'flow@example.com',
                                       'password': 'password123'})
    assert r.status_code == 302 and '/dashboard' in r.headers['Location']
    assert client.get('/dashboard').status_code == 200
    r = client.get('/logout')
    assert r.status_code == 302
    assert client.get('/dashboard').status_code == 302  # logged out
    # bad password
    r = client.post('/login', data={'username': 'flow',
                                    'password': 'wrong'})
    assert r.status_code == 200 and b'Invalid username' in r.data
    r = client.post('/login', data={'username': 'flow',
                                    'password': 'password123'})
    assert r.status_code == 302


def test_register_validation(client):
    r = client.post('/register', data={'username': 'x',
                                       'email': 'bad',
                                       'password': 'short'})
    assert r.status_code == 200  # re-rendered with flash, no user created


def test_predict_text_html(logged_in):
    r = logged_in.post('/predict/text',
                       data={'text_input': 'I am so happy today!'})
    assert r.status_code == 200
    assert b'happy' in r.data


def test_predict_speech_html(logged_in):
    r = logged_in.post('/predict/speech', data={
        'audio_file': (io.BytesIO(_wav_bytes()), 'clip.wav')})
    assert r.status_code == 200
    # history now has one speech row
    h = logged_in.get('/history')
    assert b'speech' in h.data


def test_api_register_login_profile(client):
    r = client.post('/api/register', json={'username': 'apiuser',
                                           'email': 'api@example.com',
                                           'password': 'password123'})
    assert r.status_code == 201 and r.json['username'] == 'apiuser'
    r = client.post('/api/logout')
    assert r.json['message'] == 'logged out'
    r = client.get('/api/user/profile')
    assert r.status_code == 401
    r = client.post('/api/login', json={'username': 'apiuser',
                                        'password': 'password123'})
    assert r.status_code == 200
    r = client.get('/api/user/profile')
    assert r.json['username'] == 'apiuser'


def test_api_predict_text_and_predictions(client):
    client.post('/api/register', json={'username': 'puser',
                                       'email': 'p1@example.com',
                                       'password': 'password123'})
    r = client.post('/api/predict/text', json={'text': 'this is scary'})
    assert r.status_code == 200
    body = r.json
    assert set(body) >= {'emotion', 'confidence', 'all_probabilities'}
    assert len(body['all_probabilities']) == 7
    preds = client.get('/api/predictions').json
    assert len(preds) == 1 and preds[0]['modality'] == 'text'
    pid = preds[0]['id']
    assert client.delete(f'/api/predictions/{pid}').json['message'] \
        == 'deleted'
    assert client.get('/api/predictions').json == []


def test_api_predict_multimodal_two_modalities(client):
    client.post('/api/register', json={'username': 'mmuser',
                                       'email': 'mm@example.com',
                                       'password': 'password123'})
    r = client.post('/api/predict/multimodal', data={
        'text': 'I am angry about this',
        'audio': (io.BytesIO(_wav_bytes()), 'clip.wav')})
    assert r.status_code == 200
    body = r.json
    assert 'text' in body and 'speech' in body and 'fusion' in body
    assert abs(sum(body['fusion']['all_probabilities']) - 1.0) < 1e-6


def test_api_statistics_and_csv_export(client):
    client.post('/api/register', json={'username': 'stuser',
                                       'email': 'st@example.com',
                                       'password': 'password123'})
    client.post('/api/predict/text', json={'text': 'wonderful happy day'})
    stats = client.get('/api/statistics').json
    assert any(s['count'] >= 1 for s in stats)
    csv_r = client.get('/history/export.csv')
    assert csv_r.status_code == 200
    assert csv_r.headers['Content-Type'].startswith('text/csv')
    lines = csv_r.data.decode().strip().splitlines()
    assert lines[0].startswith('date,modality,emotion')
    assert len(lines) == 2


def test_api_predict_speech_bad_file(client):
    r = client.post('/api/predict/speech', data={
        'audio': (io.BytesIO(b'nope'), 'evil.exe')})
    assert r.status_code == 400


def test_413_too_large(client):
    big = b'0' * (17 * 1024 * 1024)
    r = client.post('/api/predict/speech', data={
        'audio': (io.BytesIO(big), 'big.wav')})
    assert r.status_code == 413


def test_api_metrics(client):
    # login-gated: each metrics call costs server work, and the SSE
    # variant pins a thread — anonymous access is 401
    assert client.get('/api/metrics').status_code == 401
    client.post('/api/register', json={'username': 'metuser',
                                       'email': 'met@example.com',
                                       'password': 'password123'})
    client.get('/')
    r = client.get('/api/metrics')
    assert r.status_code == 200
    assert 'stages' in r.json


def test_api_metrics_stream(client):
    """SSE stream: login-gated, bounded frame count, data: framing,
    parseable JSON, concurrent-stream cap releases slots on close."""
    import json as _json
    assert client.get('/api/metrics/stream').status_code == 401
    client.post('/api/register', json={'username': 'sseuser',
                                       'email': 'sse@example.com',
                                       'password': 'password123'})
    client.get('/')
    r = client.get('/api/metrics/stream?ticks=2&interval=0.2')
    assert r.status_code == 200
    assert r.mimetype == 'text/event-stream'
    body = r.get_data(as_text=True)
    frames = [f for f in body.split('\n\n') if f.strip()]
    assert len(frames) == 2
    for f in frames:
        assert f.startswith('data: ')
        payload = _json.loads(f[len('data: '):])
        assert 'stages' in payload and 'ts' in payload
    # slot accounting: exhausting the cap returns 429; completed streams
    # release their slot so the next request succeeds again
    app = client.application
    while app._stream_slots.acquire(blocking=False):
        pass
    assert client.get(
        '/api/metrics/stream?ticks=1&interval=0.2').status_code == 429
    app._stream_slots.release()
    r2 = client.get('/api/metrics/stream?ticks=1&interval=0.2')
    assert r2.status_code == 200
    r2.get_data()
    r2.close()  # close callbacks fire on close, not on exhaustion
    assert app._stream_slots.acquire(blocking=False)
    app._stream_slots.release()


def test_rate_limiter_sliding_window(monkeypatch):
    """Pin the reference's Flask-Limiter semantics (reference
    app.py:63-75,130,156): N requests pass, N+1 inside the window is
    denied, and the window actually slides."""
    from mec_tpu.webapp import ratelimit
    now = [1000.0]
    monkeypatch.setattr(ratelimit.time, 'time', lambda: now[0])
    rl = ratelimit.RateLimiter(enabled=True)

    # login: 5 per 15 min
    assert all(rl.allow('login:1.2.3.4', ratelimit.LOGIN_RULES)
               for _ in range(5))
    assert not rl.allow('login:1.2.3.4', ratelimit.LOGIN_RULES)
    assert rl.allow('login:9.9.9.9', ratelimit.LOGIN_RULES)  # per-key
    now[0] += 900.1                        # window slides
    assert rl.allow('login:1.2.3.4', ratelimit.LOGIN_RULES)

    # multi-rule default: hourly cap trips before the daily cap
    for _ in range(50):
        assert rl.allow('d', ratelimit.DEFAULT_RULES)
    assert not rl.allow('d', ratelimit.DEFAULT_RULES)
    now[0] += 3600.1
    assert rl.allow('d', ratelimit.DEFAULT_RULES)

    rl.reset()
    assert rl.allow('login:1.2.3.4', ratelimit.LOGIN_RULES)

    assert ratelimit.RateLimiter(enabled=False).allow('x') is True


def test_register_rate_limited(tmp_path):
    """With limiting enabled, the 4th register attempt from one address
    is rejected (reference app.py:130: '3 per hour')."""
    db = Database(str(tmp_path / 'rl.db'))
    app = create_app(db=db, testing=True)
    app.limiter.enabled = True
    c = Client(app)
    for i in range(3):
        c.post('/register', data={'username': f'u{i}',
                                  'email': f'u{i}@example.com',
                                  'password': 'password123'})
        c.get('/logout')
    r = c.post('/register', data={'username': 'u4',
                                  'email': 'u4@example.com',
                                  'password': 'password123'})
    assert r.status_code == 429


def test_ratelimit_parse_rules():
    """Env-spec parser for deployment-tunable limits; malformed specs
    fall back to the reference rules rather than opening or closing
    the service."""
    from mec_tpu.webapp.ratelimit import parse_rules
    fb = ((1, 1.0),)
    assert parse_rules('200/86400,50/3600', fb) == \
        ((200, 86400.0), (50, 3600.0))
    assert parse_rules('', fb) == fb
    assert parse_rules('junk', fb) == fb
    assert parse_rules('0/10', fb) == fb
    assert parse_rules('5/-1', fb) == fb
    assert parse_rules('5/0.5', fb) == ((5, 0.5),)


def test_history_pagination(app, logged_in):
    """/history pages at 25 rows (new; the reference renders every row,
    reference app.py:365-396) and the nav links preserve filters."""
    uid = app.db.find_user('tester').id
    for i in range(30):
        app.db.save_prediction(uid, input_type='text',
                               predicted_emotion='happy',
                               confidence_score=0.9)
    page1 = logged_in.get('/history').text
    assert page1.count('emotion-happy') == 25
    assert 'Page 1 of 2' in page1 and '30 predictions' in page1
    page2 = logged_in.get('/history?page=2').text
    assert page2.count('emotion-happy') == 5
    # out-of-range and junk pages clamp instead of erroring
    assert logged_in.get('/history?page=99').text.count('emotion-happy') == 5
    assert logged_in.get('/history?page=x').status_code == 200
    # filters survive in the pagination links
    filtered = logged_in.get('/history?emotion=happy').text
    assert 'emotion=happy&page=2' in filtered.replace('&amp;', '&')
    # filtered count drives the page count
    assert 'Page 1 of 1' in logged_in.get('/history?emotion=sad').text \
        or 'No predictions match' in logged_in.get('/history?emotion=sad').text


def test_history_filters(logged_in):
    """/history?emotion=&modality= filter the rendered rows (reference
    app.py:365-398 exposes the same query params)."""
    logged_in.post('/api/predict/text', json={'text': 'i am so happy'})
    logged_in.post('/api/predict/text', json={'text': 'this is sad'})
    full = logged_in.get('/history').text
    happy_only = logged_in.get('/history?emotion=happy').text
    none = logged_in.get('/history?emotion=disgust').text
    assert full.count('<tr') >= happy_only.count('<tr') >= none.count('<tr')
    # the emotion-<label> td class marks data rows (the filter dropdown
    # also mentions every emotion, so match the class, not the word)
    assert 'emotion-happy' in happy_only
    assert 'emotion-' not in none
    modality = logged_in.get('/history?modality=text').text
    assert modality.count('<tr') == full.count('<tr')
    assert logged_in.get('/history?modality=image').text.count('<tr') \
        == none.count('<tr')


def test_concurrent_same_filename_uploads_do_not_collide(logged_in):
    """Two uploads named a.wav must be saved to distinct paths: a shared
    path gets truncated by one request while another batch decodes it
    (regression: concurrent multimodal requests 500'd), and user B's
    file would silently replace user A's."""
    import io as _io
    from mec_tpu.config import Config
    wav = _wav_bytes()
    for _ in range(2):
        r = logged_in.post('/api/predict/speech',
                           data={'audio': (_io.BytesIO(wav), 'a.wav')})
        assert r.status_code == 200
    saved = [f for f in os.listdir(Config.UPLOAD_FOLDER)
             if f.endswith('a.wav')]
    assert len(saved) == 2 and saved[0] != saved[1]


class TestSecurityHardening:
    """Review findings: login CSRF, open redirect, API validation bypass,
    app-wide default limits, sliding sessions, NULL prediction rows."""

    @pytest.fixture()
    def prod_app(self, tmp_path):
        from mec_tpu.config import Config
        Config.UPLOAD_FOLDER = str(tmp_path / 'up')
        db = Database(str(tmp_path / 'prod.db'))
        return create_app(db=db, testing=False)

    def test_csrf_required_even_without_session_token(self, prod_app):
        """None == None must not pass: a fresh session (no rendered form,
        no '_csrf') posting to /login is a cross-site request."""
        c = Client(prod_app)
        r = c.post('/login', data={'username': 'x', 'password': 'y'})
        assert r.status_code == 400  # CSRF rejected, not 'Invalid username'

    def test_csrf_token_from_rendered_form_passes(self, prod_app):
        import re
        c = Client(prod_app)
        page = c.get('/login').text
        token = re.search(r'name="csrf_token" value="([^"]+)"', page)
        assert token, 'login form must embed csrf_token'
        r = c.post('/login', data={'username': 'nobody', 'password': 'xyz',
                                   'csrf_token': token.group(1)})
        assert r.status_code == 200 and 'Invalid username' in r.text

    def test_open_redirect_backslash_rejected(self):
        from mec_tpu.utils.security import is_safe_redirect_url
        assert not is_safe_redirect_url('/\\evil.com')
        assert not is_safe_redirect_url('\\\\evil.com')
        assert not is_safe_redirect_url('/a\r\nSet-Cookie: x=y')
        assert is_safe_redirect_url('/dashboard')

    def test_api_register_enforces_validators(self, client):
        r = client.post('/api/register', json={
            'username': 'ok_name', 'email': 'bad-email',
            'password': 'password123'})
        assert r.status_code == 400 and 'email' in r.json['error'].lower()
        r = client.post('/api/register', json={
            'username': 'ok_name', 'email': 'ok@example.com',
            'password': 'a'})
        assert r.status_code == 400
        r = client.post('/api/register', json={
            'username': 'ok_name', 'email': 'ok@example.com',
            'password': 'password123'})
        assert r.status_code == 201

    def test_default_rate_limit_applies_app_wide(self, prod_app):
        c = Client(prod_app)
        codes = [c.get('/').status_code for _ in range(51)]
        assert codes[:50] == [200] * 50
        assert codes[50] == 429  # hourly default tripped (50/hour)

    def test_session_cookie_slides_on_read_requests(self, logged_in):
        # a pure-read request must re-issue the cookie so the 24 h expiry
        # slides with activity (SESSION_REFRESH_EACH_REQUEST)
        r = logged_in.get('/dashboard')
        assert r.status_code == 200
        assert any(h.lower() == 'set-cookie' for h, _ in r.headers)

    def test_empty_multimodal_records_no_row(self, logged_in):
        r = logged_in.post('/api/predict/multimodal', data={})
        assert r.status_code == 200 and r.json == {}
        assert logged_in.get('/api/predictions').json == []


def test_force_https_redirect(client, monkeypatch):
    """Production HTTPS enforcement (reference app.py:77-83 Talisman
    force_https): plain-HTTP requests 302 to https, X-Forwarded-Proto
    https from a TLS proxy passes through, HSTS header present."""
    from mec_tpu.config import Config
    monkeypatch.setattr(Config, 'FORCE_HTTPS', True)
    r = client.get('/login')
    assert r.status_code == 302
    assert r.headers['Location'].startswith('https://')
    assert r.headers['Location'].endswith('/login')
    assert 'Strict-Transport-Security' in r.headers
    r = client.get('/login', headers={'X-Forwarded-Proto': 'https'})
    assert r.status_code == 200
    monkeypatch.setattr(Config, 'FORCE_HTTPS', False)
    assert client.get('/login').status_code == 200


def test_overloaded_batcher_returns_503_with_retry_after(client, app):
    """Load shedding surfaces as HTTP 503 + Retry-After on API routes
    (and an error page on HTML routes) when the batcher's pending bound
    is hit, instead of unbounded queueing."""
    from mec_tpu.serving.batcher import BatchOverloaded

    def overloaded(item):
        raise BatchOverloaded('text: 256 requests queued')
    app.batcher.text.submit = overloaded

    r = client.post('/api/predict/text', json={'text': 'hello there'})
    assert r.status_code == 503
    assert r.headers['Retry-After'] == '1'
    assert 'overloaded' in r.json['error'].lower()


def test_predecode_skipped_for_partial_and_overloaded_requests(app,
                                                               tmp_path):
    """Request-thread predecode only runs for FULL tri-modal requests
    (the fused batch path consumes the arrays; partial requests would
    decode twice) and is skipped when the queue is about to shed (a
    503'd request must not burn the decode CPU the backlog needs)."""
    from mec_tpu.ops import wav as wav_ops
    wav_path = str(tmp_path / 'p.wav')
    wav_ops.write_wav(wav_path, np.zeros(22050, np.float32), 22050)
    from PIL import Image
    img_path = str(tmp_path / 'p.png')
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)

    full = app._multimodal_payload(wav_path, 'hello', img_path)
    assert full.get('wave') is not None and full.get('image') is not None

    partial = app._multimodal_payload(wav_path, None, img_path)
    assert 'wave' not in partial and 'image' not in partial

    q = app.batcher.multimodal
    old = q.max_pending
    q.max_pending = 1
    # the sentinel carries a REAL Future: the drain thread is live, and
    # if its wakeup fires in this window it dequeues the sentinel and
    # calls .done() on it — a None would kill the worker thread
    from concurrent.futures import Future
    sentinel = ('x', Future(), 0.0)
    q._pending.append(sentinel)
    try:
        assert q.overloaded()
        shed = app._multimodal_payload(wav_path, 'hello', img_path)
        assert 'wave' not in shed and 'image' not in shed
    finally:
        try:
            q._pending.remove(sentinel)
        except ValueError:
            pass  # a racing drain already consumed it
        q.max_pending = old

    # deep-but-not-shedding queue (> one full batch): predecode is also
    # skipped, so the pending list never accumulates decoded tensors
    orig = q.backlogged
    q.backlogged = lambda: True
    try:
        deep = app._multimodal_payload(wav_path, 'hello', img_path)
        assert 'wave' not in deep and 'image' not in deep
    finally:
        q.backlogged = orig


def test_shed_request_deletes_orphan_upload(client, app):
    """A load-shed upload request must not leave its just-saved file on
    disk: no prediction row references it, so under sustained overload
    disk would grow while the server only returns 503s."""
    from mec_tpu.config import Config
    from mec_tpu.serving.batcher import BatchOverloaded

    def overloaded(item):
        raise BatchOverloaded('speech: 256 requests queued')
    app.batcher.speech.submit = overloaded
    app.batcher.multimodal.submit = overloaded

    r = client.post('/api/predict/speech', data={
        'audio': (io.BytesIO(_wav_bytes()), 'clip.wav')})
    assert r.status_code == 503
    assert os.listdir(Config.UPLOAD_FOLDER) == []

    r = client.post('/api/predict/multimodal', data={
        'text': 'still overloaded',
        'audio': (io.BytesIO(_wav_bytes()), 'clip.wav')})
    assert r.status_code == 503
    assert os.listdir(Config.UPLOAD_FOLDER) == []
