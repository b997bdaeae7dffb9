"""Native C++ component tests: the WordPiece encoder must be
token-for-token identical to the Python reference implementation
(mec_tpu/text/wordpiece.py) on ASCII input, and accelerate() must route
non-ASCII batches back to Python."""

import numpy as np
import pytest

from mec_tpu.serving.synthetic_artifacts import make_vocab
from mec_tpu.text.wordpiece import WordPieceTokenizer

native_mod = pytest.importorskip('mec_tpu.native.tokenizer')


@pytest.fixture(scope='module')
def vocab():
    return make_vocab()


@pytest.fixture(scope='module')
def py_tok(vocab):
    return WordPieceTokenizer(vocab)


@pytest.fixture(scope='module')
def native(vocab, py_tok):
    try:
        return native_mod.NativeWordPiece(
            vocab, py_tok.unk_id, py_tok.cls_id, py_tok.sep_id,
            py_tok.pad_id)
    except RuntimeError:
        pytest.skip('g++ unavailable')


CORPUS = [
    'I am so happy today!',
    'this is terrible... truly AWFUL news',
    'what?! a total surprise',
    'punctuation,everywhere;yes:really(ok)[fine]{sure}',
    'a',
    '',
    'the quick brown fox jumps over the lazy dog ' * 10,  # truncation
    'unknownwordxyzq and the rest',
    '   leading and   trailing   spaces   ',
    'tabs\tand\nnewlines\rhandled',
    'digits 123 mixed42with letters',
]


def test_native_matches_python(native, py_tok):
    for max_len in (16, 32, 128):
        ids_n, mask_n = native.encode_batch(CORPUS, max_len)
        ids_p, mask_p = py_tok.encode_batch(CORPUS, max_len)
        np.testing.assert_array_equal(ids_n, ids_p)
        np.testing.assert_array_equal(mask_n, mask_p)


def test_accelerate_routes_ascii_and_unicode(vocab):
    tok = WordPieceTokenizer(vocab)
    ref_ids, ref_mask = tok.encode_batch(CORPUS, 32)
    if not native_mod.accelerate(tok):
        pytest.skip('g++ unavailable')
    ids, mask = tok.encode_batch(CORPUS, 32)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_array_equal(mask, ref_mask)
    # non-ASCII falls back to the Python path (still correct shapes)
    ids_u, mask_u = tok.encode_batch(['héllo wörld ünïcode'], 16)
    assert ids_u.shape == (1, 16) and mask_u[0, 0] == 1


def test_native_batch_threads(native, py_tok):
    texts = CORPUS * 5  # 55 texts -> threaded path
    ids_n, _ = native.encode_batch(texts, 24)
    ids_p, _ = py_tok.encode_batch(texts, 24)
    np.testing.assert_array_equal(ids_n, ids_p)
