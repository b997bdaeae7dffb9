"""Random-forest fusion trainer (the README-advertised fusion variant).

The reference README describes its fusion stage as a "Random Forest
ensemble over per-modality softmax outputs" (reference README.md:14,33)
although its shipped code trains the attention network
(reference model_training/train_fusion_model.py — see train_fusion.py).
This trainer provides the advertised variant: it fits a sklearn
RandomForestClassifier on the concatenated per-modality softmax vectors
(21 features for 7 emotions x 3 modalities) over the same synthetic
distribution the reference's fusion trainer uses
(reference train_fusion_model.py:457-519), then converts the fitted
forest into the dense array layout `models.forest.forest_apply`
evaluates as one jitted graph on TPU.

Artifacts:
  models/fusion_rf.pkl   fitted sklearn forest (joblib; the format a
                         reference-style deployment would hold)
  models/fusion_rf.mecp  native dense-array ensemble for serving

Serve it with MEC_FUSION_MODE=rf (Config.FUSION_MODE).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from mec_tpu.config import Config
from mec_tpu.convert import store
from mec_tpu.models import forest
from mec_tpu.training import metrics
from mec_tpu.training.train_fusion import (extract_real_features,
                                           generate_synthetic_data)


def softmax_features(s_p: np.ndarray, t_p: np.ndarray, i_p: np.ndarray
                     ) -> np.ndarray:
    """Concat the three per-modality softmax vectors -> (B, 21)."""
    return np.concatenate([s_p, t_p, i_p], axis=1).astype(np.float32)


def train(num_samples: int = 10000, n_estimators: int = 100,
          max_depth: Optional[int] = 12, models_dir: Optional[str] = None,
          seed: int = 42, dataset=None, verbose: bool = True):
    log = print if verbose else (lambda *_a, **_k: None)
    from sklearn.ensemble import RandomForestClassifier

    if dataset is None:
        log('Generating synthetic training data...')
        dataset = generate_synthetic_data(num_samples, seed)
    _s_f, _t_f, _i_f, s_p, t_p, i_p, labels = dataset
    x = softmax_features(s_p, t_p, i_p)

    tr, va = metrics.train_test_split_stratified(len(labels), labels,
                                                 0.15, seed=42)
    rf = RandomForestClassifier(n_estimators=n_estimators,
                                max_depth=max_depth, random_state=seed,
                                n_jobs=-1)
    rf.fit(x[tr], labels[tr])
    preds = rf.predict(x[va]).astype(np.int64)
    val_acc = metrics.accuracy(labels[va], preds)
    log(f'val accuracy: {val_acc:.4f} ({n_estimators} trees, '
        f'max_depth={max_depth})')
    log('\n' + metrics.classification_report(labels[va], preds,
                                             Config.EMOTIONS))
    from mec_tpu.training.common import record_metrics
    record_metrics('fusion_rf', val_acc, labels[va], preds)

    models_dir = models_dir or os.path.dirname(Config.FUSION_MODEL_PATH)
    os.makedirs(models_dir, exist_ok=True)
    pkl = os.path.join(models_dir, 'fusion_rf.pkl')
    import joblib
    joblib.dump(rf, pkl)
    arrays, meta = forest.from_sklearn(rf)
    meta['val_acc'] = float(val_acc)
    nat = os.path.join(models_dir, 'fusion_rf.mecp')
    store.save_params(nat, {'forest': arrays}, meta=meta)
    log(f'Saved {pkl} and {nat}')
    return rf, arrays, meta


def main(argv=None):
    p = argparse.ArgumentParser(
        description='Train the random-forest fusion variant')
    p.add_argument('--num-samples', type=int, default=10000)
    p.add_argument('--n-estimators', type=int, default=100)
    p.add_argument('--max-depth', type=int, default=12,
                   help='0 = unbounded (sklearn default)')
    p.add_argument('--models-dir', default=None)
    p.add_argument('--manifest', default=None,
                   help='CSV of audio_path,text,image_path,label rows: '
                        'train on real encoder softmax outputs instead '
                        'of synthetic data')
    args = p.parse_args(argv)
    dataset = (extract_real_features(args.manifest, args.models_dir)
               if args.manifest else None)
    train(args.num_samples, args.n_estimators,
          args.max_depth or None, args.models_dir, dataset=dataset)


if __name__ == '__main__':
    main()
