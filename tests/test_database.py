"""Database layer tests (mirrors reference tests/test_database.py:
user creation + password round trip :38-63, prediction save :69-110,
get_user_predictions :116-132 — plus statistics upsert and model metrics,
which the reference never tests)."""

import pytest

from mec_tpu.database import Database, check_password, hash_password


@pytest.fixture()
def db(tmp_path):
    return Database(str(tmp_path / 'test.db'))


def test_password_hash_roundtrip():
    h = hash_password('s3cret-pass')
    assert h.startswith('scrypt$')
    assert check_password('s3cret-pass', h)
    assert not check_password('wrong', h)
    assert not check_password('s3cret-pass', 'garbage')


def test_user_creation_and_lookup(db):
    u = db.create_user('alice', 'alice@example.com', 'password123')
    assert u.id == 1
    assert u.check_password('password123')
    assert not u.check_password('nope')
    assert db.find_user('alice').email == 'alice@example.com'
    assert db.find_user(email='alice@example.com').username == 'alice'
    assert db.find_user('bob') is None
    with pytest.raises(Exception):
        db.create_user('alice', 'other@example.com', 'x' * 8)


def test_prediction_save_and_query(db):
    u = db.create_user('bob', 'bob@example.com', 'password123')
    p = db.save_prediction(u.id, input_type='speech',
                           predicted_emotion='happy',
                           confidence_score=0.91,
                           speech_emotion='happy',
                           speech_confidence=0.91,
                           file_path='/tmp/x.wav')
    assert p.id and p.predicted_emotion == 'happy'
    db.save_prediction(u.id, input_type='text',
                       predicted_emotion='sad', confidence_score=0.5)
    preds = db.get_user_predictions(u.id)
    assert len(preds) == 2
    assert preds[0].input_type == 'text'  # newest first
    assert db.count_user_predictions(u.id) == 2
    assert db.get_user_predictions(u.id, emotion='happy')[0].id == p.id
    assert db.get_user_predictions(u.id, modality='text')[0].input_type \
        == 'text'
    dist = db.emotion_distribution(u.id)
    assert dist['happy'] == 1 and dist['sad'] == 1 and dist['angry'] == 0


def test_delete_prediction(db):
    u = db.create_user('carol', 'carol@example.com', 'password123')
    p = db.save_prediction(u.id, input_type='image',
                           predicted_emotion='fear', confidence_score=0.3)
    db.delete_prediction(p.id)
    assert db.get_prediction(p.id) is None
    assert db.count_user_predictions(u.id) == 0


def test_emotion_statistics_upsert(db):
    db.increment_emotion_stat('happy')
    db.increment_emotion_stat('happy')
    db.increment_emotion_stat('sad')
    db.increment_emotion_stat('')  # no-op
    stats = {s.emotion: s.count for s in db.get_emotion_statistics()}
    assert stats == {'happy': 2, 'sad': 1}


def test_model_metrics(db):
    db.record_model_metric('speech_dnn', accuracy=0.87, f1_score=0.86)
    ms = db.get_model_metrics('speech_dnn')
    assert len(ms) == 1 and abs(ms[0].accuracy - 0.87) < 1e-9
