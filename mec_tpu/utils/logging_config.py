"""Rotating-file logging (parity with reference logging_config.py:11-42:
logs/<name>.log, 10 MB x 10 backups, INFO, pathname:lineno format)."""

from __future__ import annotations

import logging
import os
import sys
from logging.handlers import RotatingFileHandler

from mec_tpu.config import Config

FORMAT = ('%(asctime)s %(levelname)s [%(pathname)s:%(lineno)d] '
          '%(message)s')

_aot_filter_installed = False


def silence_xla_aot_warnings() -> None:
    """Drop XLA:CPU's spurious per-cache-hit AOT feature-mismatch ERRORs.

    Reloading a persistent-compile-cache entry logs one ERROR line per
    executable (cpu_aot_loader.cc): the compile side records XLA's own
    +prefer-no-scatter / +prefer-no-gather *tuning* pseudo-features in
    the machine-feature list, and load-side host-feature detection never
    reports them — measured on this host with compile and reload on the
    SAME CPU, so every cache hit warns about a SIGILL that cannot happen.
    TF_CPP_MIN_LOG_LEVEL=3 does NOT reach this call site (absl raw
    logging), so the only host-side remedy is an fd-level line filter.
    Real cross-machine feature mismatches are already prevented by the
    CPU-fingerprinted cache directory (mec_tpu/__init__.py); this filter
    does not weaken that. Opt-in (demo/bench output cleanliness), never
    installed by library import.
    """
    global _aot_filter_installed
    if _aot_filter_installed:
        return
    _aot_filter_installed = True

    import atexit
    import threading

    real = os.dup(2)
    rd, wr = os.pipe()
    os.dup2(wr, 2)
    os.close(wr)

    def _pump() -> None:
        buf = b''
        while True:
            try:
                chunk = os.read(rd, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b'\n')
            for line in lines:
                if b'cpu_aot_loader' not in line:
                    os.write(real, line + b'\n')
        if buf and b'cpu_aot_loader' not in buf:
            os.write(real, buf)
        os.close(rd)

    pump = threading.Thread(target=_pump, daemon=True,
                            name='xla-aot-stderr-filter')
    pump.start()

    def _restore() -> None:
        try:
            sys.stderr.flush()
        except Exception:
            pass
        # dup2 closes the pipe's last write end (fd 2), so the pump sees
        # EOF, drains any tail, and exits; later writes go straight out.
        os.dup2(real, 2)
        pump.join(timeout=2.0)

    atexit.register(_restore)


def setup_logging(name: str = 'emotion_classifier',
                  log_dir: str | None = None,
                  level: int = logging.INFO) -> logging.Logger:
    log_dir = log_dir or Config.LOG_DIR
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger('mec_tpu')
    logger.setLevel(level)
    path = os.path.join(log_dir, f'{name}.log')
    if not any(isinstance(h, RotatingFileHandler)
               and getattr(h, 'baseFilename', '') == os.path.abspath(path)
               for h in logger.handlers):
        handler = RotatingFileHandler(path, maxBytes=10 * 1024 * 1024,
                                      backupCount=10)
        handler.setFormatter(logging.Formatter(FORMAT))
        logger.addHandler(handler)
    return logger
