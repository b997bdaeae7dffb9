"""Two-process multi-host (DCN) bring-up test.

Spawns two REAL processes, each owning 4 virtual CPU devices, wires them
with mec_tpu.parallel.distributed.initialize_multi_host (gRPC
coordinator), and runs a global-mesh psum + a data-parallel sharded step
across the 8 global devices. This is the reference-has-nothing
capability from SURVEY.md §2.3 exercised end-to-end rather than only
via the in-process 8-device mesh the rest of the suite uses.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update('jax_platforms', 'cpu')

pid = int(sys.argv[1])
port = sys.argv[2]

from mec_tpu.parallel.distributed import initialize_multi_host
assert initialize_multi_host(coordinator_address=f'127.0.0.1:{port}',
                             num_processes=2, process_id=pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = Mesh(np.asarray(jax.devices()).reshape(8,), ('data',))

# global psum across both processes' devices
@jax.jit
def allsum(x):
    return jax.lax.psum(x, 'data')

f = jax.jit(jax.shard_map(allsum, mesh=mesh, in_specs=P('data'),
                          out_specs=P()))
with mesh:
    local = jnp.ones((4, 1), jnp.float32) * (pid + 1)
    arrs = [jax.device_put(local[i:i + 1], d)
            for i, d in enumerate(jax.local_devices())]
    x = jax.make_array_from_single_device_arrays(
        (8, 1), NamedSharding(mesh, P('data')), arrs)
    total = f(x)
    # devices 0-3 hold 1.0 (proc 0), 4-7 hold 2.0 (proc 1) -> sum 12;
    # the out_specs=P() result is fully replicated, so each process
    # reads it without a gather
    assert total.sharding.is_fully_replicated
    got = float(np.asarray(total).ravel()[0])
    assert got == 12.0, got

# data-parallel step: global batch sharded over all 8 devices
@jax.jit
def step(w, xb):
    return (xb @ w).sum()

w = jax.device_put(jnp.eye(3, dtype=jnp.float32),
                   NamedSharding(mesh, P()))
xb = jax.make_array_from_single_device_arrays(
    (8, 3), NamedSharding(mesh, P('data')),
    [jax.device_put(jnp.full((1, 3), float(pid + 1)), d)
     for d in jax.local_devices()])
out = step(w, xb)
assert out.sharding.is_fully_replicated
got = float(np.asarray(out))
assert got == 36.0, got  # 4*3*1 + 4*3*2

print('MULTIHOST_OK', pid)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _die_with_parent():
    """PR_SET_PDEATHSIG: the kernel SIGKILLs the worker if the pytest
    process dies first (SIGTERM/SIGKILL mid-run), so a killed suite
    cannot orphan gRPC-coordinated children (round-1 VERDICT item 9)."""
    try:
        import ctypes
        import signal
        libc = ctypes.CDLL('libc.so.6', use_errno=True)
        libc.prctl(1, signal.SIGKILL)  # 1 = PR_SET_PDEATHSIG
    except Exception:
        pass  # non-Linux: fall back to the finally-kill below


def test_two_process_dcn_psum(tmp_path):
    # hang protection comes from communicate(timeout=...) below, not a
    # pytest.mark.timeout — pytest-timeout is not installed here and the
    # mark was silently inert (round-1 VERDICT item 7)
    port = _free_port()
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env.pop('JAX_PLATFORMS', None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    procs = [subprocess.Popen(
        [sys.executable, '-c', _WORKER, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True, preexec_fn=_die_with_parent) for pid in (0, 1)]
    try:
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=150)
            except subprocess.TimeoutExpired:
                pytest.fail('multi-host worker hung')
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f'worker {pid} failed:\n{out}'
            assert f'MULTIHOST_OK {pid}' in out
    finally:
        for q in procs:
            if q.poll() is None:
                q.kill()
        for q in procs:
            try:
                q.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass
