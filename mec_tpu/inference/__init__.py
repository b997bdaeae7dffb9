"""Reference-compatible inference facades.

Public API parity with the reference `inference` package
(SpeechInference.predict(path), TextInference.predict(text),
ImageInference.predict(path), MultimodalFusion.predict_multimodal(a, t, i),
FastTextEmotionPredictor) — same signatures, same result contracts, same
fallback ladder. All classes are thin views over the process-wide
EmotionEngine, so constructing them per request (as reference app.py does)
costs nothing: params stay loaded and graphs stay compiled.
"""

from mec_tpu.inference.speech_inference import SpeechInference  # noqa: F401
from mec_tpu.inference.text_inference import TextInference, KEYWORD_MAP  # noqa: F401
from mec_tpu.inference.image_inference import ImageInference  # noqa: F401
from mec_tpu.inference.multimodal_fusion import MultimodalFusion  # noqa: F401
from mec_tpu.inference.text_lstm_inference import FastTextEmotionPredictor  # noqa: F401
