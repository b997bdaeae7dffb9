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
   "p95_ms", "shed", "errors", "avg_device_batch", "phases_ms"}
avg_device_batch is items/batches from the batcher's own counters over
the level — the measured coalescing factor. throughput_rps counts
SUCCESSFUL (200) responses only; "shed" counts live 503 load-shed
responses separately from transport "errors". phases_ms is the p50 of
each serving phase over the level from the process StageTimer: queue
wait (submit -> batch formation), batch run, and — tri-modal — the
decode/wire staging and the device dispatch+fetch inside the batch.

A final shed level (--shed / default with --modality both|multimodal)
re-runs the tri-modal route with the queue's pending bound temporarily
lowered below the client count, so the 503/Retry-After shed path is
observed LIVE through HTTP, not just unit-tested.

Usage: python examples/load_http.py [--modality text|multimodal|both]
       [--levels 1,8,32] [--requests N] [--port 8899] [--shed]

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
    """One HTTP POST; returns (outcome, latency_ms) with outcome one of
    'ok' (200 + expected key), 'shed' (503 load shed), 'error'
    (transport failure / unexpected status or payload)."""
    import urllib.error
    import urllib.request
    req = urllib.request.Request(
        url, data=body, headers={'Content-Type': content_type})
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
            out = ('ok' if resp.status == 200 and want_key in payload
                   else 'error')
    except urllib.error.HTTPError as e:
        out = 'shed' if e.code == 503 else 'error'
    except Exception:
        out = 'error'
    return out, (time.perf_counter() - t0) * 1e3


# StageTimer phase names surfaced per level (p50 over the level)
_PHASES = ('batcher.text.queue_wait_ms', 'batcher.text.run',
           'batcher.multimodal.queue_wait_ms', 'batcher.multimodal.run',
           'trimodal.decode_stage_ms', 'trimodal.dispatch_fetch')


def run_level(url, body, content_type, want_key, concurrency, n,
              batcher_queue):
    from mec_tpu.utils.profiling import timer
    # warm this route once (bucket compile is prepaid by engine.warmup,
    # but the first request still builds sessions/DB state)
    _post(url, body, content_type, want_key)
    b0, i0 = batcher_queue.batches_run, batcher_queue.items_run
    timer.reset()
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
    lat = sorted(ms for out, ms in results if out == 'ok')
    shed = sum(1 for out, _ in results if out == 'shed')
    errors = sum(1 for out, _ in results if out == 'error')
    batches = batcher_queue.batches_run - b0
    items = batcher_queue.items_run - i0
    phases = {k.split('.', 1)[1]: round(v['p50_ms'], 1)
              for k, v in timer.summary().items() if k in _PHASES}
    return {
        'concurrency': concurrency,
        'requests': n,
        # successful-request throughput: 200s / level wall clock (the
        # wall includes shed+error time, so this is what a client saw)
        'throughput_rps': round(len(lat) / wall, 1),
        'p50_ms': round(lat[len(lat) // 2], 1) if lat else None,
        'p95_ms': round(lat[int(len(lat) * 0.95)], 1) if lat else None,
        'shed': shed,
        'errors': errors,
        'avg_device_batch': round(items / batches, 1) if batches else None,
        'phases_ms': phases,
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
    p.add_argument('--shed', action='store_true', default=None,
                   help='run one extra tri-modal level with the pending '
                        'bound lowered below the client count so the '
                        'live 503 shed path is observed (default when '
                        'the multimodal route is benched)')
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

    # live shed level: drop the tri-modal queue's pending bound below
    # the client count so BatchOverloaded -> HTTP 503 + Retry-After
    # fires under real load (unit tests cover the mechanics; this
    # observes it through the full HTTP path)
    want_shed = args.shed or (args.shed is None
                              and args.modality in ('multimodal', 'both'))
    if want_shed:
        mm = next((r for r in routes if r[0] == 'multimodal'), None)
        if mm is not None:
            _, url, body, ctype, want_key, queue = mm
            k = max(levels)
            old_pending = queue.max_pending
            queue.max_pending = max(2, k // 8)
            try:
                r = run_level(url, body, ctype, want_key, k,
                              args.requests, queue)
            finally:
                queue.max_pending = old_pending
            r['route'] = 'multimodal[shed]'
            r['max_pending'] = max(2, k // 8)
            print(json.dumps(r), flush=True)

    server.shutdown()
    app.batcher.stop()


if __name__ == '__main__':
    main()
