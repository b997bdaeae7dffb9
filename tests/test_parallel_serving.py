"""Parallel-trained artifacts must round-trip into serving (round-2
VERDICT item 5): train a tiny BERT with each parallelism flag
(--experts / --mesh-pipe / --seq-parallel) on the 8-device virtual mesh,
save the artifact, load it through EmotionEngine, and assert the HTTP
/api/predict/text probabilities match the trainer's own eval-step logits.

Training capabilities that can't serve are orphans; the serving contract
is reference inference/text_inference.py:72-104 (load the fine-tuned
artifact, tokenize, softmax over 7 emotions).
"""

import io
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
from werkzeug.test import Client

from examples.end_to_end import make_bert_tokenizer, make_text_corpus
from mec_tpu.config import Config
from mec_tpu.convert.hf_bert import model_kwargs_from_config, read_config
from mec_tpu.models.bert import BertForSequenceClassification
from mec_tpu.training import train_text_bert

TINY = dict(hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64)


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _train_convert_serve(tmp_path, **train_flags):
    """Train tiny BERT with the given parallelism flags, then serve the
    saved artifact over HTTP and compare to the eval-step logits."""
    texts, labels = make_text_corpus(per_class=6)
    tok = make_bert_tokenizer(texts)
    models_dir = str(tmp_path / 'models')
    bert_dir = os.path.join(models_dir, 'bert_model')

    best_vars, hist = train_text_bert.train(
        csv_path=None, texts=texts, labels=labels, tokenizer=tok,
        epochs=2, batch_size=16, max_length=16, learning_rate=5e-4,
        model_kwargs=dict(TINY, vocab_size=len(tok.vocab)),
        models_dir=bert_dir, verbose=False, **train_flags)

    # the saved config must reconstruct the trained architecture exactly
    cfg = model_kwargs_from_config(read_config(bert_dir))
    assert cfg['hidden_size'] == TINY['hidden_size']
    model = BertForSequenceClassification(**cfg)

    probes = texts[::11][:5].tolist()
    ids, mask = tok.encode_batch(probes, Config.MAX_TEXT_LENGTH)
    logits, _cls = model.apply(best_vars, jnp.asarray(ids),
                               jnp.asarray(mask))
    expected = _softmax(np.asarray(logits, np.float64))

    from mec_tpu.database import get_db
    from mec_tpu.serving.engine import EmotionEngine
    from mec_tpu.webapp.app import create_app
    engine = EmotionEngine(models_dir=models_dir)
    assert engine.bert is not None and engine.bert_tokenizer is not None, \
        'engine failed to load the parallel-trained artifact'
    app = create_app(db=get_db(str(tmp_path / 'rt.db'), reload=True),
                     engine=engine, testing=True)
    client = Client(app)
    r = client.post('/api/register', json={
        'username': 'rtuser', 'email': 'rt@example.com',
        'password': 'password123'})
    assert r.status_code == 201

    for text, exp in zip(probes, expected):
        r = client.post('/api/predict/text', json={'text': text})
        assert r.status_code == 200
        body = r.json
        # a trained model served, not the keyword fallback ladder
        assert body.get('fallback') is not True, body
        np.testing.assert_allclose(
            np.asarray(body['all_probabilities']), exp, atol=2e-4,
            err_msg=f'served probabilities diverge from eval logits '
                    f'for {text!r} with flags {train_flags}')
    return hist


def test_moe_expert_parallel_artifact_serves(tmp_path):
    """--experts 2 with the expert bank sharded over 'model' (EP):
    config.json persists num_experts and the engine rebuilds the MoE
    encoder for serving."""
    _train_convert_serve(tmp_path, experts=2, mesh_data=2, mesh_model=2)
    cfg = read_config(os.path.join(str(tmp_path / 'models'), 'bert_model'))
    assert cfg['num_experts'] == 2


def test_pipeline_parallel_artifact_serves(tmp_path):
    """--mesh-pipe 2 (GPipe, one encoder layer per stage): the stacked
    per-stage params must save in canonical flax layout so the dense
    serving graph loads them."""
    _train_convert_serve(tmp_path, mesh_data=2, mesh_pipe=2,
                         microbatches=2)


def test_seq_parallel_artifact_serves(tmp_path):
    """--seq-parallel over TP=2: sequence-sharded training is a layout
    choice, not a semantics choice — the saved params serve dense."""
    _train_convert_serve(tmp_path, mesh_data=2, mesh_model=2,
                         seq_parallel=True)
