"""Training loops (optax) for all five reference trainers.

Parity targets (SURVEY.md §2.2):
  * train_speech      — reference model_training/train_speech_model.py
  * train_text_bert   — reference model_training/train_text_model.py
  * train_text_lstm   — reference model_training/train_lstm_text_model.py
  * train_image       — reference model_training/train_image_model.py
  * train_fusion      — reference model_training/train_fusion_model.py

Differences by design (TPU-first):
  * no GPU gate — TPU (or CPU for tests) via JAX's default backend
  * dataset feature extraction is a batched jitted graph, not a per-file
    librosa loop (reference train_speech_model.py:113-160)
  * data parallelism over a jax.sharding.Mesh is a flag, not a rewrite
  * checkpoints carry optimizer state and support mid-training resume
    (the reference only keeps best-model weights, SURVEY.md §5)
  * artifacts are saved in the native .mecp serving format
"""
