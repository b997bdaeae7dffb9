"""Flax model definitions for all model families in the framework.

Each model reproduces the operator graph of its reference counterpart
(citations in each module) so converted weights yield logit parity <=1e-4,
while the implementation is idiomatic JAX: pure functions, static shapes,
MXU-friendly matmuls, no Python control flow under jit.
"""

from mec_tpu.models.speech_dnn import SpeechDNN  # noqa: F401
from mec_tpu.models.fusion import MultiModalFusionModel  # noqa: F401
from mec_tpu.models.resnet import ImageEmotionModel  # noqa: F401
from mec_tpu.models.bert import BertForSequenceClassification  # noqa: F401
from mec_tpu.models.bilstm import BiLSTMTextModel  # noqa: F401
