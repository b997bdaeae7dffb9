"""Vectorized XLA tree-ensemble (random-forest) inference.

The reference README advertises its fusion stage as a "Random Forest
ensemble over per-modality softmax outputs" (reference README.md:14,33),
though the shipped code trains an attention network instead
(reference model_training/train_fusion_model.py:262-362). This module
implements the advertised variant TPU-natively so both fusion backends
exist: a whole forest evaluates as ONE jittable level-synchronous walk —
every (sample, tree) pair advances one level per step of a bounded
fori_loop, so XLA sees `depth` dense (B, T) gather/select rounds instead
of per-tree recursion. No data-dependent control flow, no host loops.

Semantics match sklearn.ensemble.RandomForestClassifier.predict_proba
exactly: per-tree leaf class distributions (normalized counts) averaged
over trees. The converter (`from_sklearn`) turns a fitted sklearn forest
into the dense array layout; tests pin parity against real sklearn
(installed in this image — unlike librosa/torchvision, this oracle is
the upstream library itself).

Array layout (T trees padded to N nodes; node 0 is each tree's root):
  feature   (T, N) int32   split feature (0 at leaves/padding, unused)
  threshold (T, N) float32 go LEFT iff x[feature] <= threshold (sklearn)
  left      (T, N) int32   left-child node id;  leaves self-loop
  right     (T, N) int32   right-child node id; leaves self-loop
  proba     (T, N, C) float32 class distribution at every node

Leaves self-loop, so after `depth` iterations every walk has parked at
its leaf regardless of the tree's actual depth; `depth` is the max tree
depth and is a static trace constant.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames='depth')
def forest_apply(arrays: Dict[str, jnp.ndarray], x: jnp.ndarray,
                 depth: int) -> jnp.ndarray:
    """(B, F) features -> (B, C) class probabilities (mean over trees)."""
    feature = arrays['feature']
    threshold = arrays['threshold']
    left = arrays['left']
    right = arrays['right']
    T = feature.shape[0]
    B = x.shape[0]
    tree = jnp.arange(T)[None, :]  # (1, T) broadcast index

    def level(_, idx):
        # idx (B, T): current node of every (sample, tree) walk
        feat = feature[tree, idx]                      # (B, T)
        thr = threshold[tree, idx]                     # (B, T)
        xf = jnp.take_along_axis(x, feat, axis=1)      # (B, T)
        go_left = xf <= thr
        return jnp.where(go_left, left[tree, idx], right[tree, idx])

    idx = jax.lax.fori_loop(0, int(depth), level,
                            jnp.zeros((B, T), jnp.int32))
    leaf = arrays['proba'][tree, idx]                  # (B, T, C)
    return jnp.mean(leaf, axis=1)


def from_sklearn(rf) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Fitted sklearn RandomForestClassifier -> (arrays, meta).

    meta carries the static bits: 'depth' (trace constant), 'n_features',
    'n_classes', and the fitted class order ('classes').
    """
    trees = [est.tree_ for est in rf.estimators_]
    if not trees:
        raise ValueError('forest has no fitted trees')
    N = max(t.node_count for t in trees)
    T = len(trees)
    C = int(rf.n_classes_)
    feature = np.zeros((T, N), np.int32)
    threshold = np.zeros((T, N), np.float64)
    left = np.zeros((T, N), np.int32)
    right = np.zeros((T, N), np.int32)
    proba = np.zeros((T, N, C), np.float32)
    depth = 1
    for i, t in enumerate(trees):
        n = t.node_count
        is_leaf = t.children_left[:n] == -1
        feature[i, :n] = np.where(is_leaf, 0, t.feature[:n])
        threshold[i, :n] = np.where(is_leaf, 0.0, t.threshold[:n])
        # leaves (and padding, below) self-loop so deeper iterations hold
        nodes = np.arange(n)
        left[i, :n] = np.where(is_leaf, nodes, t.children_left[:n])
        right[i, :n] = np.where(is_leaf, nodes, t.children_right[:n])
        left[i, n:] = right[i, n:] = np.arange(n, N)
        counts = t.value[:n].reshape(n, C).astype(np.float64)
        # sklearn >=1.3 stores value as weighted fractions already
        # normalized per node; normalize defensively either way
        sums = counts.sum(axis=1, keepdims=True)
        proba[i, :n] = np.divide(counts, np.where(sums == 0, 1.0, sums)
                                 ).astype(np.float32)
        depth = max(depth, int(t.max_depth))
    # sklearn compares float32 inputs against float64 thresholds
    # (midpoints of adjacent float32 feature values). For float32 x,
    # `x <= t64` is equivalent to `x <= floor32(t64)` where floor32
    # rounds t64 DOWN to the nearest float32 — round-to-nearest could
    # land above t64 and flip a boundary decision the other way.
    t32 = threshold.astype(np.float32)
    above = t32.astype(np.float64) > threshold
    t32[above] = np.nextafter(t32[above], np.float32(-np.inf),
                              dtype=np.float32)
    arrays = {'feature': feature, 'threshold': t32,
              'left': left, 'right': right, 'proba': proba}
    meta = {'kind': 'random_forest', 'depth': int(depth),
            'n_features': int(rf.n_features_in_), 'n_classes': C,
            'classes': [int(c) for c in rf.classes_]}
    return arrays, meta
