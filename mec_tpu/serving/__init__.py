"""The serving engine: one process owns the chip(s), params load once,
requests batch onto compiled graphs."""

from mec_tpu.serving.engine import EmotionEngine, get_engine  # noqa: F401
