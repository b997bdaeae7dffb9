"""Config contract tests.

Mirrors the reference's config invariants (reference
tests/test_preprocessing.py:162-185) and covers the dotenv loader
(reference app.py:40 calls python-dotenv's load_dotenv(); ours is a
stdlib reimplementation in mec_tpu/config.py).
"""

import os

from mec_tpu.config import Config, load_dotenv


def test_config_invariants():
    assert len(Config.EMOTIONS) == Config.NUM_EMOTIONS == 7
    assert Config.EMOTIONS == ['happy', 'sad', 'angry', 'fear', 'disgust',
                               'surprise', 'neutral']
    assert Config.SAMPLE_RATE == 22050
    assert Config.AUDIO_DURATION == 3
    assert Config.N_MFCC == 40
    assert Config.MAX_TEXT_LENGTH == 128
    assert Config.IMAGE_SIZE == (224, 224)
    assert Config.MAX_FILE_SIZE == 16 * 1024 * 1024
    assert 'wav' in Config.ALLOWED_AUDIO_EXTENSIONS
    assert {'png', 'jpg', 'jpeg'} <= Config.ALLOWED_IMAGE_EXTENSIONS
    # serving knobs are well-formed
    assert all(b > 0 for b in Config.BATCH_BUCKETS)
    assert list(Config.BATCH_BUCKETS) == sorted(Config.BATCH_BUCKETS)
    assert all(s > 0 for s in Config.SEQ_BUCKETS)


def test_load_dotenv(tmp_path, monkeypatch):
    env = tmp_path / '.env'
    env.write_text(
        '# comment\n'
        '\n'
        'MEC_DOTENV_TEST_A=bar\n'
        'MEC_DOTENV_TEST_B="quoted value"\n'
        'MEC_DOTENV_TEST_C=\n'
        'not a key value line\n'
        "MEC_DOTENV_TEST_D='single'\n")
    monkeypatch.setenv('MEC_DOTENV_TEST_B', 'preset')
    try:
        assert load_dotenv(str(env))
        assert os.environ['MEC_DOTENV_TEST_A'] == 'bar'
        # real environment wins (python-dotenv override=False semantics)
        assert os.environ['MEC_DOTENV_TEST_B'] == 'preset'
        assert os.environ['MEC_DOTENV_TEST_C'] == ''
        assert os.environ['MEC_DOTENV_TEST_D'] == 'single'
        assert 'not a key value line' not in os.environ
    finally:
        for k in ('MEC_DOTENV_TEST_A', 'MEC_DOTENV_TEST_C',
                  'MEC_DOTENV_TEST_D'):
            os.environ.pop(k, None)


def test_load_dotenv_missing_file(tmp_path):
    assert not load_dotenv(str(tmp_path / 'does-not-exist'))


def test_load_dotenv_comments_and_export(tmp_path):
    """python-dotenv semantics the first cut missed (ADVICE round 1):
    unquoted inline comments are stripped, 'export KEY=...' assigns KEY
    (not a key named 'export KEY'), quoted '#' is preserved."""
    env = tmp_path / '.env'
    env.write_text(
        'MEC_DOTENV_TEST_E=value # trailing comment\n'
        'export MEC_DOTENV_TEST_F=exported\n'
        'MEC_DOTENV_TEST_G="kept # inside quotes"\n'
        'MEC_DOTENV_TEST_H=no#comment-without-space\n')
    try:
        assert load_dotenv(str(env))
        assert os.environ['MEC_DOTENV_TEST_E'] == 'value'
        assert os.environ['MEC_DOTENV_TEST_F'] == 'exported'
        assert 'export MEC_DOTENV_TEST_F' not in os.environ
        assert os.environ['MEC_DOTENV_TEST_G'] == 'kept # inside quotes'
        assert os.environ['MEC_DOTENV_TEST_H'] == 'no#comment-without-space'
    finally:
        for k in ('MEC_DOTENV_TEST_E', 'MEC_DOTENV_TEST_F',
                  'MEC_DOTENV_TEST_G', 'MEC_DOTENV_TEST_H'):
            os.environ.pop(k, None)
