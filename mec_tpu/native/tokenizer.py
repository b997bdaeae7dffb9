"""ctypes binding for the native WordPiece encoder.

NativeWordPiece wraps wordpiece.cpp; `accelerate()` upgrades a Python
WordPieceTokenizer (mec_tpu.text.wordpiece) so that ASCII-only batches
encode natively and everything else takes the Python reference path.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

from mec_tpu.native.build import load_library


class NativeWordPiece:
    def __init__(self, vocab: Dict[str, int], unk_id: int, cls_id: int,
                 sep_id: int, pad_id: int):
        self._lib = load_library('wordpiece')
        if self._lib is None:
            raise RuntimeError('native wordpiece unavailable')
        lib = self._lib
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32,
                                  ctypes.c_int32]
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]

        items = list(vocab.items())
        self._keepalive = [t.encode('utf-8') for t, _ in items]
        arr = (ctypes.c_char_p * len(items))(*self._keepalive)
        ids_arr = np.asarray([i for _, i in items], np.int32)
        self._handle = lib.wp_create(
            arr, ids_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(items), unk_id, cls_id, sep_id, pad_id)

    def __del__(self):
        lib = getattr(self, '_lib', None)
        handle = getattr(self, '_handle', None)
        if lib is not None and handle:
            lib.wp_destroy(handle)

    def encode_batch(self, texts: List[str], max_length: int = 128
                     ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        raw = [t.encode('utf-8') for t in texts]
        arr = (ctypes.c_char_p * n)(*raw)
        self._lib.wp_encode_batch(
            self._handle, arr, n, max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return ids, mask


def accelerate(tokenizer) -> bool:
    """Give a mec_tpu.text.wordpiece.WordPieceTokenizer a native fast
    path for ASCII batches. Returns True when the native library loaded.
    Only valid for lowercasing tokenizers (the only mode the C++ encoder
    implements)."""
    if not tokenizer.do_lower_case:
        return False
    try:
        native = NativeWordPiece(tokenizer.vocab, tokenizer.unk_id,
                                 tokenizer.cls_id, tokenizer.sep_id,
                                 tokenizer.pad_id)
    except RuntimeError:
        return False
    python_encode_batch = tokenizer.encode_batch

    def fast_encode_batch(texts, max_length: int = 128):
        if all(isinstance(t, str) and t.isascii() and '\x00' not in t
               for t in texts):
            # ASCII-only AND NUL-free: an embedded NUL would terminate
            # the C string and silently drop the rest of the text
            return native.encode_batch(list(texts), max_length)
        return python_encode_batch(texts, max_length)

    tokenizer.encode_batch = fast_encode_batch
    tokenizer._native = native  # keepalive
    return True
