"""On-demand g++ build + ctypes loading for the native components."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE: dict = {}


def _build_dir() -> str:
    d = os.environ.get('MEC_NATIVE_BUILD_DIR')
    if d:
        return d
    return os.path.join(tempfile.gettempdir(), 'mec_tpu_native')


# -ffp-contract=off: the wire codecs pin float32 numerics against their
# numpy references; FMA contraction would reassociate those expressions.
# -O3 for auto-vectorization of the featurizer's FFT/filter loops (IEEE
# semantics preserved — no -ffast-math). -fno-math-errno: libm calls
# (nearbyintf, sqrtf, ...) vectorize; nobody reads errno and IEEE results
# are unchanged. -march=native: the default x86-64 baseline is SSE2-only,
# which blocks all float vectorization (roundps needs SSE4.1); the build
# cache is per-machine so native is safe. Contraction stays off, so
# element float semantics are unchanged vs the numpy references.
_FLAGS = ['-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
          '-ffp-contract=off', '-fno-math-errno', '-pthread']


def _cpu_fingerprint() -> bytes:
    """ISA fingerprint folded into the .so cache key: -march=native
    binaries are machine-feature-specific, and a build cache shared
    across heterogeneous hosts (containers mounting the same /tmp) must
    not dlopen a binary built for another CPU's features (SIGILL — the
    same failure mode that forced disabling the persistent XLA:CPU
    compile cache in __graft_entry__.py)."""
    import platform
    parts = [platform.machine()]
    try:
        with open('/proc/cpuinfo', encoding='utf-8', errors='replace') as f:
            for line in f:
                # x86 'flags', arm64 'Features'
                if line.startswith(('flags', 'Features')):
                    parts.append(' '.join(sorted(
                        line.split(':', 1)[1].split())))
                    break
    except OSError:
        pass
    return '|'.join(parts).encode()


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile mec_tpu/native/<name>.cpp (if needed) and dlopen it.

    Returns None when no compiler is available — callers fall back to
    their pure-Python implementation.
    """
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_HERE, f'{name}.cpp')
        try:
            with open(src, 'rb') as f:
                # cache key covers the source, the flags, AND the host
                # CPU's feature set, so flag changes rebuild instead of
                # reusing a stale .so and heterogeneous hosts sharing a
                # build dir never load each other's -march=native code
                digest = hashlib.sha256(
                    f.read() + ' '.join(_FLAGS).encode()
                    + _cpu_fingerprint()
                ).hexdigest()[:16]
            out_dir = _build_dir()
            os.makedirs(out_dir, exist_ok=True)
            so_path = os.path.join(out_dir, f'lib{name}-{digest}.so')
            if not os.path.exists(so_path):
                tmp = so_path + f'.tmp{os.getpid()}'
                subprocess.run(
                    ['g++', *_FLAGS, src, '-o', tmp],
                    check=True, capture_output=True)
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            lib = None
        _CACHE[name] = lib
        return lib
