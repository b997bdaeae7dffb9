"""sklearn RandomForest -> native tree-ensemble converter.

The reference README's advertised fusion stage is a "Random Forest
ensemble over per-modality softmax outputs" (reference README.md:14,33).
A deployment that trained that variant holds a joblib/pickle
RandomForestClassifier; this converter turns it into the dense array
layout `mec_tpu.models.forest.forest_apply` evaluates on device, cached
as a `.mecp` like every other converted artifact.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from mec_tpu.models import forest


def convert_fusion_rf(pkl_path: str) -> Tuple[Dict[str, Any],
                                              Dict[str, Any]]:
    """fusion_rf.pkl (joblib or pickle) -> ({'forest': arrays}, meta)."""
    import joblib
    rf = joblib.load(pkl_path)
    if not hasattr(rf, 'estimators_'):
        raise ValueError(f'{pkl_path} is not a fitted sklearn forest')
    arrays, meta = forest.from_sklearn(rf)
    return {'forest': arrays}, meta
