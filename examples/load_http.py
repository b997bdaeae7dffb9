"""Concurrent HTTP load benchmark: webapp + micro-batcher + engine.

Drives the full production serving path — werkzeug threaded WSGI
server, routing/sessions/rate-limiter/DB recording, EngineBatcher
coalescing (serving/batcher.py), one fused device dispatch per formed
batch — with K closed-loop HTTP clients, on the real TPU. This is the
deployment the reference cannot express: its gunicorn config forks
2*CPU+1 workers that each run batch-1 inference on their own model
copies (reference gunicorn_config.py:12-19, app.py:551-578), so its
concurrent throughput is bounded by per-request model time; here
concurrency COALESCES into bigger device batches instead.

Per (route, concurrency) level prints one JSON line:
  {"route", "concurrency", "requests", "throughput_rps", "p50_ms",
   "p95_ms", "errors", "avg_device_batch"}
avg_device_batch is items/batches from the batcher's own counters over
the level — the measured coalescing factor.

Usage: python examples/load_http.py [--modality text|multimodal|both]
       [--levels 1,8,32] [--requests N] [--port 8899]

Note: this 1-core bench host runs clients, WSGI threads, and host
preprocessing on the same core, so absolute numbers are conservative;
the coalescing factor and the concurrency scaling shape are the point.
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault('MEC_COMPUTE_DTYPE', 'bfloat16')
# The reference's Flask-Limiter default (50/hour/endpoint/IP) would
# throttle any load test after one level; lift it for this process.
os.environ.setdefault('MEC_RATELIMIT_DEFAULT', '100000000/3600')
os.environ.setdefault('DATABASE_URL', 'sqlite:////tmp/mec_load_http.db')
os.environ.setdefault('UPLOAD_FOLDER', '/tmp/mec_load_http_uploads')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402,F401  (bench assets need numpy anyway)


def _multipart(fields, files):
    boundary = uuid.uuid4().hex
    buf = io.BytesIO()
    for k, v in fields.items():
        buf.write((f'--{boundary}\r\nContent-Disposition: form-data; '
                   f'name="{k}"\r\n\r\n{v}\r\n').encode())
    for k, (fname, data, ctype) in files.items():
        buf.write((f'--{boundary}\r\nContent-Disposition: form-data; '
                   f'name="{k}"; filename="{fname}"\r\n'
                   f'Content-Type: {ctype}\r\n\r\n').encode())
        buf.write(data)
        buf.write(b'\r\n')
    buf.write(f'--{boundary}--\r\n'.encode())
    return buf.getvalue(), f'multipart/form-data; boundary={boundary}'


def _post(url, body, content_type, want_key):
    """One HTTP POST; returns (ok, latency_ms)."""
    import urllib.request
    req = urllib.request.Request(
        url, data=body, headers={'Content-Type': content_type})
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
            ok = resp.status == 200 and want_key in payload
    except Exception:
        ok = False
    return ok, (time.perf_counter() - t0) * 1e3


def run_level(url, body, content_type, want_key, concurrency, n,
              batcher_queue):
    # warm this route once (bucket compile is prepaid by engine.warmup,
    # but the first request still builds sessions/DB state)
    _post(url, body, content_type, want_key)
    b0, i0 = batcher_queue.batches_run, batcher_queue.items_run
    results = []
    lock = threading.Lock()

    def one(_):
        r = _post(url, body, content_type, want_key)
        with lock:
            results.append(r)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(concurrency) as pool:
        list(pool.map(one, range(n)))
    wall = time.perf_counter() - t0
    lat = sorted(ms for ok, ms in results if ok)
    errors = sum(1 for ok, _ in results if not ok)
    batches = batcher_queue.batches_run - b0
    items = batcher_queue.items_run - i0
    return {
        'concurrency': concurrency,
        'requests': n,
        'throughput_rps': round(len(lat) / wall, 1),
        'p50_ms': round(lat[len(lat) // 2], 1) if lat else None,
        'p95_ms': round(lat[int(len(lat) * 0.95)], 1) if lat else None,
        'errors': errors,
        'avg_device_batch': round(items / batches, 1) if batches else None,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--modality', default='both',
                   choices=('text', 'multimodal', 'both'))
    p.add_argument('--levels', default='1,8,32')
    p.add_argument('--requests', type=int, default=96,
                   help='requests per concurrency level')
    p.add_argument('--port', type=int, default=8899)
    p.add_argument('--models-dir', default=None)
    args = p.parse_args(argv)
    levels = [int(x) for x in args.levels.split(',')]

    import bench
    from mec_tpu.config import Config
    from mec_tpu.webapp.app import create_app
    wav_path, img_path, text = bench.prepare_assets('/tmp/mec_bench_assets')
    models_dir = args.models_dir or bench.models_dir_or_synthetic()
    os.makedirs(Config.UPLOAD_FOLDER, exist_ok=True)

    app = create_app(models_dir=models_dir)
    app.engine.warmup(Config.BATCH_BUCKETS)

    from werkzeug.serving import make_server
    server = make_server('127.0.0.1', args.port, app, threaded=True)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f'http://127.0.0.1:{args.port}'

    routes = []
    if args.modality in ('text', 'both'):
        routes.append(('text', f'{base}/api/predict/text',
                       json.dumps({'text': text}).encode(),
                       'application/json', 'emotion', app.batcher.text))
    if args.modality in ('multimodal', 'both'):
        body, ctype = _multipart(
            {'text': text},
            {'audio': ('clip.wav', open(wav_path, 'rb').read(),
                       'audio/wav'),
             'image': ('face.jpg', open(img_path, 'rb').read(),
                       'image/jpeg')})
        routes.append(('multimodal', f'{base}/api/predict/multimodal',
                       body, ctype, 'fusion', app.batcher.multimodal))

    for name, url, body, ctype, want_key, queue in routes:
        for k in levels:
            r = run_level(url, body, ctype, want_key, k, args.requests,
                          queue)
            r['route'] = name
            print(json.dumps(r), flush=True)

    server.shutdown()
    app.batcher.stop()


if __name__ == '__main__':
    main()
