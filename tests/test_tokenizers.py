"""Tokenizer parity: self-contained WordPiece vs transformers BertTokenizer
(on a local vocab file) and KerasTokenizer vs keras.preprocessing Tokenizer.
"""

import numpy as np
import pytest

from mec_tpu.text.cleaning import clean_text
from mec_tpu.text.keras_tokenizer import KerasTokenizer
from mec_tpu.text.wordpiece import WordPieceTokenizer

VOCAB = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]',
         'i', 'am', 'so', 'happy', 'sad', 'to', 'day', '##day', '##ly',
         'feel', 'un', '##happy', '##sad', 'the', 'cat', 'dog', '.', ',',
         '!', '?', 'was', 'not', 'very', 'really', 'ca', "'", 't', '##n',
         'naive', 'e']

TEXTS = [
    'I am SO happy today!',
    'unhappy, unsad?? weird words',
    "can't touch this",
    'naïve café',               # accents stripped
    'x' * 150,                   # longer than max_chars_per_word
    '',
    '   spaces\teverywhere\n ok ',
    'I am ' + 'very ' * 100 + 'happy',  # truncation
]


@pytest.fixture(scope='module')
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp('vocab') / 'vocab.txt'
    p.write_text('\n'.join(VOCAB))
    return str(p)


class TestWordPieceParity:
    def test_matches_hf(self, vocab_file):
        from transformers import BertTokenizer
        hf = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
        own = WordPieceTokenizer.from_vocab_file(vocab_file)
        for text in TEXTS:
            enc = hf(text, add_special_tokens=True, max_length=32,
                     padding='max_length', truncation=True)
            ids, mask = own.encode(text, max_length=32)
            assert ids.tolist() == enc['input_ids'], text
            assert mask.tolist() == enc['attention_mask'], text

    def test_cleaned_pipeline(self, vocab_file):
        # the reference tokenizes cleaned text in TextPreprocessor
        own = WordPieceTokenizer.from_vocab_file(vocab_file)
        ids, mask = own.encode(clean_text('I am happy!! http://x.co'), 16)
        assert ids[0] == own.cls_id
        assert mask.sum() == int((ids != own.pad_id).sum())


class TestKerasTokenizerParity:
    def test_matches_keras(self):
        from tensorflow import keras
        texts = ['I am so happy today', 'so so sad!', 'Angry; words... here',
                 'what a GREAT great day', 'unseen token zzz']
        kt = keras.preprocessing.text.Tokenizer(num_words=8,
                                                oov_token='<OOV>')
        kt.fit_on_texts(texts)
        own = KerasTokenizer(num_words=8)
        own.fit_on_texts(texts)
        assert own.word_index == kt.word_index
        want = kt.texts_to_sequences(texts + ['new words so happy'])
        got = own.texts_to_sequences(texts + ['new words so happy'])
        assert got == want

    def test_padding_matches_keras(self):
        from tensorflow import keras
        seqs = [[1, 2, 3], [4], list(range(1, 40))]
        want = keras.preprocessing.sequence.pad_sequences(
            seqs, maxlen=10, padding='post', truncating='post')
        got = KerasTokenizer.pad_sequences(seqs, maxlen=10)
        np.testing.assert_array_equal(got, want)

    def test_json_roundtrip(self, tmp_path):
        own = KerasTokenizer(num_words=100)
        own.fit_on_texts(['a b c', 'a b', 'a'])
        p = str(tmp_path / 'tok.json')
        own.to_json_file(p)
        back = KerasTokenizer.from_json_file(p)
        assert back.word_index == own.word_index
        assert back.texts_to_sequences(['a b z']) == \
            own.texts_to_sequences(['a b z'])


class TestCleaning:
    def test_reference_semantics(self):
        # reference preprocessing/text_preprocessing.py:28-33
        assert clean_text('Hello WORLD!') == 'hello world'
        assert clean_text('see http://foo.com/x now') == 'see  now'
        assert clean_text('nums 123 stripped') == 'nums  stripped'
        assert clean_text('  padded  ') == 'padded'
