"""Framework-native parameter persistence (msgpack via flax.serialization).

Artifacts are a single `.mecp` file holding {'params': ..., 'batch_stats':
..., 'meta': {...}}. Training checkpoints with optimizer state use orbax
(mec_tpu.training.checkpoint); these files are the *serving* format.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

MAGIC = b'MECP\x01'


def save_params(path: str, variables: Dict[str, Any],
                meta: Dict[str, Any] | None = None) -> None:
    variables = jax.tree.map(np.asarray, variables)
    payload = serialization.msgpack_serialize(
        {'variables': variables, 'meta': meta or {}})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # write-to-temp + atomic rename: .mecp files are live serving
    # artifacts that get re-saved in place (e.g. the engine persisting
    # int8 calibration scales into the meta) — a SIGKILL mid-write or
    # two processes racing must never leave a truncated artifact, and
    # _load_native_or does not fall back to re-converting when a
    # (corrupt) native file exists
    tmp = f'{path}.tmp.{os.getpid()}'
    try:
        with open(tmp, 'wb') as f:
            f.write(MAGIC)
            f.write(payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass


def load_params(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        blob = f.read()
    if not blob.startswith(MAGIC):
        raise ValueError(f'{path} is not a mec_tpu params file')
    restored = serialization.msgpack_restore(blob[len(MAGIC):])
    return restored


def native_path(reference_path: str) -> str:
    """models/speech_model.h5 -> models/speech_model.mecp etc."""
    base = os.path.splitext(reference_path)[0]
    return base + '.mecp'
