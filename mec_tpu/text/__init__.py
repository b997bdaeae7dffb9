"""Text preprocessing: cleaning, BERT WordPiece, Keras-style tokenizer."""

from mec_tpu.text.cleaning import clean_text  # noqa: F401
from mec_tpu.text.wordpiece import WordPieceTokenizer  # noqa: F401
from mec_tpu.text.keras_tokenizer import KerasTokenizer  # noqa: F401
