"""Attention fusion must BEAT the best single modality — the one thing
the fusion model exists to do (round-2 VERDICT item 1).

The reference's core claim is fused ~91% vs per-modality 68-92%
(reference README.md:29-33); nothing previously tested that the rebuilt
fusion net actually earns its keep over just taking the most confident
single model.

Corpus design: each modality's per-class evidence is the true label's
one-hot at strength `delta` buried in iid unit Gaussian noise, drawn
INDEPENDENTLY per modality. The modality's probability vector is the
softmax of that noisy evidence and its feature vector is a fixed random
linear embedding of the same noisy evidence — so no single modality
carries more information than its own noisy channel (argmax of the
softmax IS the single-modality Bayes decision), and the only route above
the single-modality ceiling is combining the three independent channels.
At delta=1.4 the single-modality ceiling is ~55% while summing the three
log-probability channels (the product-of-experts oracle) supports ~85%.
"""

import numpy as np
import pytest

from mec_tpu.config import Config
from mec_tpu.training import metrics, train_fusion

DIMS = {'speech': 24, 'text': 32, 'image': 28}


def make_disagreeing_data(num_samples: int, seed: int = 7,
                          delta: float = 1.4):
    """Independently-noisy per-modality evidence for a shared label."""
    rng = np.random.RandomState(seed)
    C = Config.NUM_EMOTIONS
    labels = (np.arange(num_samples) % C).astype(np.int32)
    onehot = np.eye(C, dtype=np.float64)[labels]
    feats, preds = {}, {}
    for mod, d in DIMS.items():
        evidence = rng.randn(num_samples, C) + delta * onehot
        p = np.exp(evidence - evidence.max(axis=1, keepdims=True))
        preds[mod] = (p / p.sum(axis=1, keepdims=True)).astype(np.float32)
        embed = rng.randn(C, d) / np.sqrt(C)  # fixed per-modality basis
        feats[mod] = (evidence @ embed).astype(np.float32)
    return (feats['speech'], feats['text'], feats['image'],
            preds['speech'], preds['text'], preds['image'], labels)


def test_fusion_beats_best_single_modality(tmp_path):
    dataset = make_disagreeing_data(3500)
    s_f, t_f, i_f, s_p, t_p, i_p, labels = dataset

    # same deterministic split train_fusion.train() uses internally
    tr, va = metrics.train_test_split_stratified(
        len(labels), labels, 0.15, seed=42)

    # single-modality Bayes decisions on the held-out split
    singles = {
        'speech': float(np.mean(s_p[va].argmax(1) == labels[va])),
        'text': float(np.mean(t_p[va].argmax(1) == labels[va])),
        'image': float(np.mean(i_p[va].argmax(1) == labels[va])),
    }
    best_single = max(singles.values())
    # the corpus is calibrated so no modality alone is strong...
    assert best_single < 0.70, singles
    # ...but the product-of-experts oracle (sum of independent
    # log-probability channels) is — the headroom fusion must claim
    oracle = float(np.mean(
        (np.log(s_p[va]) + np.log(t_p[va]) + np.log(i_p[va])).argmax(1)
        == labels[va]))
    assert oracle > best_single + 0.15, (oracle, singles)

    _, _, hist = train_fusion.train(
        dataset=dataset, epochs=30, batch_size=64,
        models_dir=str(tmp_path), verbose=False)
    fused = max(hist['val_acc'])

    # the reference's claim, now as an assertion: attention fusion
    # strictly exceeds the best single modality, with a real margin
    assert fused > best_single + 0.08, (
        f'fusion {fused:.3f} vs best single {best_single:.3f} '
        f'({singles}, oracle {oracle:.3f})')
