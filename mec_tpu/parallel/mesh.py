"""Mesh construction and batch sharding helpers.

One mesh, two named axes: ('data', 'model'). Defaults come from
Config.MESH_DATA / Config.MESH_MODEL; 'auto' spreads all visible devices
along the data axis. On a single chip the mesh is (1, 1) and every
sharding below degenerates to fully-addressable single-device placement,
so the serving and training code paths are identical from 1 chip to a pod
slice.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mec_tpu.config import Config

DATA_AXIS = 'data'
MODEL_AXIS = 'model'
PIPE_AXIS = 'pipe'


def local_mesh_shape(n_devices: Optional[int] = None
                     ) -> Tuple[int, int]:
    """Resolve (data, model) axis sizes from config + device count."""
    total = n_devices if n_devices is not None else jax.device_count()
    model = max(1, int(Config.MESH_MODEL))
    if model > total or total % model != 0:
        model = 1
    data_cfg = Config.MESH_DATA
    if data_cfg == 'auto':
        data = total // model
    else:
        data = max(1, int(data_cfg))
        if data * model > total:
            data = total // model
    return data, model


def make_mesh(data: Optional[int] = None, model: Optional[int] = None,
              devices=None, pipe: int = 1) -> Mesh:
    """Build the ('data', 'model'[, 'pipe']) mesh over visible devices.

    The 'pipe' axis (parallel/pipeline.py) is appended only when
    pipe > 1 so all existing two-axis PartitionSpecs stay valid."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None or model is None:
        d, m = local_mesh_shape(len(devs) // max(1, pipe))
        data = data if data is not None else d
        model = model if model is not None else m
    if pipe and pipe > 1:
        n = data * model * pipe
        grid = np.array(devs[:n]).reshape(data, model, pipe)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))
    n = data * model
    grid = np.array(devs[:n]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension along the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place every array in `tree` with its batch dim split on 'data'.

    Arrays whose leading dimension does not divide by the data-axis size
    are replicated instead (e.g. scalars, per-class weights).
    """
    data_size = mesh.shape[DATA_AXIS]
    batch = batch_sharding(mesh)
    repl = replicated(mesh)

    def place(x):
        arr = np.asarray(x) if not hasattr(x, 'shape') else x
        if arr.ndim >= 1 and arr.shape[0] % data_size == 0:
            return jax.device_put(x, batch)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, tree)
