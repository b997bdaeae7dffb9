"""One-shot converters from reference checkpoint formats to framework params.

The reference produces Keras .h5 (+ sklearn scaler .pkl), torch .pt
state-dicts, and HuggingFace save_pretrained directories
(SURVEY.md §2.2 artifacts column). Each converter maps those into the flax
param pytrees of mec_tpu.models and is covered by an activation-parity test
against the original framework run on the same weights.

Framework-native artifacts are written with
mec_tpu.convert.store.save_params / load_params (msgpack, one file per
model) and that is what the serving engine loads at startup.
"""

from mec_tpu.convert import store  # noqa: F401
