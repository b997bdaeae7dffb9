"""Machinery smoke for examples/load_http.py (the concurrent-HTTP load
benchmark): a real socket server, concurrent closed-loop clients, the
batcher coalescing counters, and the JSON result shape — on the
fallback engine (no artifacts), so no device compile is paid. The real
measurement runs standalone on the TPU (see BASELINE.md)."""

import importlib.util
import json
import os
import threading

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        'mec_load_http', os.path.join(_ROOT, 'examples', 'load_http.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def served_app(tmp_path):
    from mec_tpu.config import Config
    from mec_tpu.database import Database
    from mec_tpu.webapp.app import create_app
    old_upload = Config.UPLOAD_FOLDER
    Config.UPLOAD_FOLDER = str(tmp_path / 'uploads')
    models = tmp_path / 'models'
    models.mkdir()
    app = create_app(db=Database(str(tmp_path / 'web.db')), testing=True,
                     models_dir=str(models))
    from werkzeug.serving import make_server
    server = make_server('127.0.0.1', 0, app, threaded=True)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        yield app, f'http://127.0.0.1:{server.server_port}'
    finally:
        server.shutdown()
        if app._batcher is not None:
            app._batcher.stop()
        Config.UPLOAD_FOLDER = old_upload


def test_text_level_coalesces_and_reports(served_app):
    app, base = served_app
    lh = _load_module()
    r = lh.run_level(f'{base}/api/predict/text',
                     json.dumps({'text': 'i am so happy today'}).encode(),
                     'application/json', 'emotion', concurrency=4, n=12,
                     batcher_queue=app.batcher.text)
    assert r['errors'] == 0 and r['shed'] == 0
    assert r['requests'] == 12
    assert r['throughput_rps'] > 0
    assert r['p50_ms'] is not None and r['p95_ms'] >= r['p50_ms']
    # 4 concurrent closed-loop clients against a 3 ms linger must form
    # at least one multi-item device batch
    assert r['avg_device_batch'] >= 1.0
    # phase breakdown from the StageTimer: queue wait + batch run
    assert 'text.queue_wait_ms' in r['phases_ms']
    assert 'text.run' in r['phases_ms']


def test_multimodal_multipart_level(served_app, tmp_path):
    app, base = served_app
    lh = _load_module()
    from mec_tpu.ops import wav as wav_ops
    wav_path = str(tmp_path / 'c.wav')
    wav_ops.write_wav(wav_path, 0.2 * np.sin(
        np.arange(22050) / 15.0).astype(np.float32), 22050)
    from PIL import Image
    img_path = str(tmp_path / 'c.jpg')
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
    body, ctype = lh._multipart(
        {'text': 'storms make me angry'},
        {'audio': ('c.wav', open(wav_path, 'rb').read(), 'audio/wav'),
         'image': ('c.jpg', open(img_path, 'rb').read(), 'image/jpeg')})
    r = lh.run_level(f'{base}/api/predict/multimodal', body, ctype,
                     'fusion', concurrency=2, n=6,
                     batcher_queue=app.batcher.multimodal)
    assert r['errors'] == 0 and r['shed'] == 0
    assert r['avg_device_batch'] >= 1.0
    assert 'multimodal.queue_wait_ms' in r['phases_ms']


def test_live_shed_level_counts_503s(served_app, tmp_path):
    """The shed level (pending bound below the client count) produces
    real 503s through the full HTTP path, counted separately from
    transport errors (ADVICE round 3)."""
    app, base = served_app
    lh = _load_module()
    queue = app.batcher.multimodal
    # no artifacts -> the fallback path is fast; stall the batch fn so
    # the queue actually backs up under 6 concurrent clients
    orig_fn = queue.fn
    import time as _time

    def slow_fn(items):
        _time.sleep(0.05)
        return orig_fn(items)
    queue.fn = slow_fn
    old_pending = queue.max_pending
    queue.max_pending = 1
    try:
        r = lh.run_level(f'{base}/api/predict/multimodal',
                         json.dumps({'text': 'angry storms'}).encode(),
                         'application/json', 'text', concurrency=6,
                         n=18, batcher_queue=queue)
    finally:
        queue.max_pending = old_pending
        queue.fn = orig_fn
    assert r['shed'] > 0          # live 503s observed
    assert r['errors'] == 0       # and none mislabeled as transport
    assert r['requests'] == 18
