"""Mid-training checkpoint/resume (orbax).

The reference keeps only best-model weights with no optimizer state and no
resume (SURVEY.md §5 "Checkpoint / resume"). Here a checkpoint is the full
TrainState (params, BatchNorm stats, optimizer state, step) plus the
epoch/history/best-metric/best-weights extras, written atomically via
orbax; serving artifacts remain the separate lightweight .mecp format
(mec_tpu.convert.store). RNG state needs no persistence: fit() derives
shuffle and dropout randomness per (seed, epoch, step), so a resumed
epoch k draws exactly what an uninterrupted run would have.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

try:  # orbax is the preferred backend; fall back to msgpack files.
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

_MAGIC = b'MECT\x01'


def save_train_state(path: str, state, extra: Optional[Dict[str, Any]] = None
                     ) -> None:
    """Write {step, params, batch_stats, opt_state, extra} to `path`."""
    # to_state_dict flattens optax namedtuple states into plain dicts
    payload = {
        'step': np.asarray(state.step),
        'params': serialization.to_state_dict(
            jax.tree.map(np.asarray, state.params)),
        'batch_stats': serialization.to_state_dict(
            jax.tree.map(np.asarray, state.batch_stats)),
        'opt_state': serialization.to_state_dict(
            jax.tree.map(np.asarray, state.opt_state)),
        'extra': extra or {},
    }
    if _HAS_ORBAX and os.path.splitext(path)[1] == '':
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), payload, force=True)
        return
    blob = serialization.msgpack_serialize(
        jax.tree.map(np.asarray, payload))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(_MAGIC)
        f.write(blob)
    os.replace(tmp, path)


def restore_train_state(path: str, state):
    """Restore a TrainState saved by save_train_state onto `state`'s
    structure (the optimizer transformation itself is rebuilt by the
    caller; only its numeric state is restored)."""
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(os.path.abspath(path))
    else:
        with open(path, 'rb') as f:
            blob = f.read()
        if not blob.startswith(_MAGIC):
            raise ValueError(f'{path} is not a mec_tpu train checkpoint')
        payload = serialization.msgpack_restore(blob[len(_MAGIC):])

    restored = state.replace(
        step=np.asarray(payload['step']),
        params=serialization.from_state_dict(state.params,
                                             payload['params']),
        batch_stats=serialization.from_state_dict(state.batch_stats,
                                                  payload['batch_stats']),
        opt_state=serialization.from_state_dict(state.opt_state,
                                                payload['opt_state']))
    return restored, payload.get('extra', {})
