"""Multi-host (DCN) bring-up.

Single-host multi-chip needs nothing: `make_mesh()` spans all local
devices. Across hosts, call `initialize_multi_host()` once per process
before any device use; afterwards `jax.devices()` is the global device
set and the same mesh/sharding code paths apply unchanged (SURVEY.md §5:
multi-host "must not be architecturally precluded").

Env-var driven (the TPU-VM convention): JAX picks coordinates up from the
TPU metadata automatically on Cloud TPU pods; explicit args/env cover
CPU/GPU-style clusters:

    MEC_COORDINATOR_ADDRESS  host:port of process 0
    MEC_NUM_PROCESSES        total process count
    MEC_PROCESS_ID           this process's rank
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multi_host(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> bool:
    """Call jax.distributed.initialize with arg/env/auto resolution.

    Returns True when a multi-process runtime was initialized, False when
    running single-process (no coordinator configured) — callers can use
    the same code path either way.
    """
    import jax

    coordinator_address = (coordinator_address
                           or os.environ.get('MEC_COORDINATOR_ADDRESS'))
    env_np = os.environ.get('MEC_NUM_PROCESSES')
    env_pid = os.environ.get('MEC_PROCESS_ID')
    num_processes = (num_processes if num_processes is not None
                     else int(env_np) if env_np else None)
    process_id = (process_id if process_id is not None
                  else int(env_pid) if env_pid else None)

    on_tpu_pod = bool(os.environ.get('TPU_WORKER_HOSTNAMES')
                      or os.environ.get('MEGASCALE_COORDINATOR_ADDRESS'))
    if not coordinator_address and not on_tpu_pod:
        return False

    kwargs = {}
    if coordinator_address:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)
    return True
