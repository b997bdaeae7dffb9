"""Production server CLI.

`python -m mec_tpu.webapp.serve [--port 5000] [--warmup]`

One process owns the TPU; werkzeug's threaded WSGI server front-ends it
(replaces gunicorn's 2*CPU+1 forked sync workers, reference
gunicorn_config.py:12-19 — forking would duplicate device state, the
opposite of what a single-chip accelerator wants). --warmup compiles the
serving graphs for every batch bucket before accepting traffic.
"""

from __future__ import annotations

import argparse

from mec_tpu.config import Config
from mec_tpu.webapp.app import create_app


def main(argv=None):
    p = argparse.ArgumentParser(description='Serve the emotion classifier')
    p.add_argument('--host', default='0.0.0.0')
    p.add_argument('--port', type=int, default=5000)
    p.add_argument('--models-dir', default=None)
    p.add_argument('--warmup', action='store_true',
                   help='compile all batch buckets before serving')
    # deprecated no-op: werkzeug serves one thread per connection with no
    # pool-size knob; kept so launch scripts written for the old flag (or
    # for gunicorn-style CLIs) don't fail with an argparse error
    p.add_argument('--threads', type=int, default=None,
                   help=argparse.SUPPRESS)
    args = p.parse_args(argv)
    if args.threads is not None:
        print('warning: --threads is deprecated and ignored '
              '(thread-per-connection server)', flush=True)

    app = create_app(models_dir=args.models_dir)
    if args.warmup:
        print(f'Warming up buckets {Config.BATCH_BUCKETS}...')
        app.engine.warmup(Config.BATCH_BUCKETS)

    # werkzeug serves one thread per connection (there is no pool-size
    # knob); concurrency is absorbed by the micro-batcher, whose linger
    # coalesces simultaneous requests into one device dispatch
    # (serving/batcher.py). Under gunicorn use --threads (see
    # make_wsgi_app below) — still ONE worker process owning the chip.
    from werkzeug.serving import run_simple
    print(f'Serving on http://{args.host}:{args.port} '
          f'(thread-per-connection, 1 engine)')
    run_simple(args.host, args.port, app, threaded=True,
               processes=1, use_reloader=False)


def make_wsgi_app():
    """WSGI factory (parity with reference wsgi.py); e.g.
    `gunicorn 'mec_tpu.webapp.serve:make_wsgi_app()' --threads 8 -w 1`
    (ONE worker: the process owns the TPU)."""
    return create_app()


if __name__ == '__main__':
    main()
