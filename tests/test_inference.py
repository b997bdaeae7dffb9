"""End-to-end inference facade tests.

Covers the reference's observable fallback behavior (the app runs with
deterministic predictions when no models exist, reference README.md:148 and
SURVEY.md §5) and, with real artifacts staged in a tmp models dir, the full
serving path: artifacts -> engine -> batched jitted graphs -> result
contracts, including tri-modal fusion in one dispatch.
"""

import os

import numpy as np
import pytest

import mec_tpu
from mec_tpu.config import Config
from mec_tpu.ops import wav


@pytest.fixture()
def fallback_engine(tmp_path, monkeypatch):
    """Engine with an empty models dir -> everything in fallback mode."""
    from mec_tpu.serving import engine as eng
    monkeypatch.setattr(eng, '_engine', None)
    e = eng.get_engine(models_dir=str(tmp_path / 'empty'), reload=True)
    yield e
    monkeypatch.setattr(eng, '_engine', None)


def _tone_wav(tmp_path, name='t.wav', rms_target=0.1, freq=250.0):
    sr = Config.SAMPLE_RATE
    t = np.arange(sr * 3) / sr
    y = (np.sqrt(2) * rms_target * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    p = str(tmp_path / name)
    wav.write_wav(p, y, sr)
    return p


class TestFallbackLadder:
    def test_speech_heuristic(self, fallback_engine, tmp_path):
        from mec_tpu.inference.speech_inference import SpeechInference
        si = SpeechInference()
        assert si.model is None
        # quiet low tone -> sad (rms<0.02, centroid<1500)
        r = si.predict(_tone_wav(tmp_path, 'quiet.wav', rms_target=0.01))
        assert r['emotion'] == 'sad'
        assert r['confidence'] == pytest.approx(0.9)
        assert len(r['all_probabilities']) == 7
        assert r['all_probabilities'][Config.EMOTIONS.index('sad')] == \
            pytest.approx(0.9)
        # loud bright tone -> angry (rms>0.06, centroid>2000)
        r = si.predict(_tone_wav(tmp_path, 'loud.wav', rms_target=0.2,
                                 freq=3000.0))
        assert r['emotion'] == 'angry'
        # in-between -> neutral
        r = si.predict(_tone_wav(tmp_path, 'mid.wav', rms_target=0.04))
        assert r['emotion'] == 'neutral'
        assert si.extract_features(_tone_wav(tmp_path, 'f.wav')) == (None, None)

    def test_text_keyword_heuristic(self, fallback_engine):
        from mec_tpu.inference.text_inference import TextInference
        ti = TextInference()
        assert ti.model is None
        assert ti.predict('I am so happy today')['emotion'] == 'happy'
        assert ti.predict('this is gross and nasty')['emotion'] == 'disgust'
        assert ti.predict('the sky is blue!')['emotion'] == 'sad'  # 'blue' kw
        r = ti.predict('nothing matches here')
        assert r['emotion'] == 'neutral'
        assert r['confidence'] == pytest.approx(0.9)
        # keyword must match as a whole word ("happiness" != "happy ")
        assert ti.predict('happiness')['emotion'] == 'neutral'

    def test_image_neutral_fallback(self, fallback_engine, tmp_path):
        from mec_tpu.inference.image_inference import ImageInference
        ii = ImageInference()
        assert ii.model is None
        r = ii.predict(str(tmp_path / 'nonexistent.jpg'))
        assert r['emotion'] == 'neutral'
        assert r['confidence'] == pytest.approx(0.9)

    def test_multimodal_weighted_average(self, fallback_engine, tmp_path):
        from mec_tpu.inference.multimodal_fusion import MultimodalFusion
        mf = MultimodalFusion()
        audio = _tone_wav(tmp_path, 'quiet.wav', rms_target=0.01)
        res = mf.predict_multimodal(audio_path=audio, text='I am happy now')
        assert set(res) == {'speech', 'text', 'fusion'}
        s = np.array(res['speech']['all_probabilities'])
        t = np.array(res['text']['all_probabilities'])
        want = 0.3 * s + 0.35 * t
        want = want / want.sum()
        np.testing.assert_allclose(res['fusion']['all_probabilities'], want,
                                   atol=1e-9)
        # single modality -> no fusion key (reference :262)
        res = mf.predict_multimodal(text='I am happy now')
        assert set(res) == {'text'}

    def test_lstm_fallback(self, fallback_engine):
        from mec_tpu.inference.text_lstm_inference import FastTextEmotionPredictor
        p = FastTextEmotionPredictor()
        r = p.predict('I am so happy')
        assert r['emotion'] == 'happy'
        assert 'inference_time_ms' in r


@pytest.fixture(scope='module')
def artifacts_dir(tmp_path_factory):
    """Stage reference-format artifacts for every model family."""
    import torch
    from tests.torch_oracles import OracleFusionModel, OracleImageEmotionModel
    d = tmp_path_factory.mktemp('models')

    # --- speech .h5 + scaler .pkl
    from tensorflow import keras
    layers = [keras.layers.Input(shape=(56,))]
    for width, drop in zip((512, 512, 256, 128, 64),
                           (0.4, 0.4, 0.3, 0.2, 0.1)):
        layers += [keras.layers.Dense(width),
                   keras.layers.BatchNormalization(),
                   keras.layers.Activation('relu'),
                   keras.layers.Dropout(drop)]
    layers.append(keras.layers.Dense(7, activation='softmax'))
    km = keras.Sequential(layers)
    km.save(str(d / 'speech_model.h5'))
    from sklearn.preprocessing import StandardScaler
    import joblib
    sc = StandardScaler().fit(np.random.RandomState(0).randn(50, 56) * 10 + 3)
    joblib.dump(sc, str(d / 'speech_scaler.pkl'))

    # --- BERT dir (small config) + vocab
    from transformers import BertConfig
    from transformers import BertForSequenceClassification as HFBert
    cfg = BertConfig(vocab_size=60, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=130, num_labels=7)
    torch.manual_seed(0)
    hf = HFBert(cfg).eval()
    hf.save_pretrained(str(d / 'bert_model'))
    words = ['[PAD]', '[UNK]', '[CLS]', '[SEP]', '[MASK]', 'i', 'am', 'so',
             'happy', 'sad', 'angry', 'today', 'the', 'a', 'feel', 'very',
             'this', 'is', 'great', 'bad', '##ly', '##ing', 'fear', 'wow']
    words += [f'w{i}' for i in range(60 - len(words))]
    with open(d / 'bert_model' / 'vocab.txt', 'w') as f:
        f.write('\n'.join(words))

    # --- LSTM .h5 + tokenizer json
    km2 = keras.Sequential([
        keras.layers.Input(shape=(128,)),
        keras.layers.Embedding(200, 16),
        keras.layers.SpatialDropout1D(0.3),
        keras.layers.Bidirectional(keras.layers.LSTM(8, return_sequences=True)),
        keras.layers.Bidirectional(keras.layers.LSTM(4)),
        keras.layers.Dense(10, activation='relu'),
        keras.layers.Dropout(0.5),
        keras.layers.Dense(5, activation='relu'),
        keras.layers.Dropout(0.3),
        keras.layers.Dense(7, activation='softmax'),
    ])
    km2.save(str(d / 'text_model.h5'))
    from mec_tpu.text.keras_tokenizer import KerasTokenizer
    tok = KerasTokenizer(num_words=200)
    tok.fit_on_texts(['i am so happy today', 'this is very sad',
                      'angry words here', 'what a great day'])
    tok.to_json_file(str(d / 'text_model_tokenizer.json'))

    # --- image .pt
    torch.manual_seed(1)
    img_oracle = OracleImageEmotionModel().eval()
    torch.save(img_oracle.state_dict(), str(d / 'image_model.pt'))

    # --- fusion .pt
    torch.manual_seed(2)
    fus = OracleFusionModel(td=32).eval()  # text_dim matches the small BERT
    torch.save({'model_state_dict': fus.state_dict(),
                'config': {'speech_dim': 64, 'text_dim': 32,
                           'image_dim': 512, 'num_classes': 7,
                           'hidden_dim': 256}}, str(d / 'fusion_model.pt'))
    return str(d)


@pytest.fixture(scope='module')
def live_engine(artifacts_dir):
    from mec_tpu.serving import engine as eng
    eng._engine = None
    e = eng.get_engine(models_dir=artifacts_dir, reload=True)
    yield e
    eng._engine = None


class TestLiveServing:
    def test_all_models_loaded(self, live_engine):
        assert live_engine.speech is not None
        assert live_engine.bert is not None
        assert live_engine.lstm is not None
        assert live_engine.image is not None
        assert live_engine.fusion is not None

    def test_speech_batching_equivalence(self, live_engine, tmp_path):
        paths = [_tone_wav(tmp_path, f's{i}.wav', rms_target=0.02 * (i + 1),
                           freq=200.0 + 150 * i) for i in range(3)]
        batched = live_engine.predict_speech_paths(paths)
        singles = [live_engine.predict_speech_paths([p])[0] for p in paths]
        for b, s in zip(batched, singles):
            np.testing.assert_allclose(b['all_probabilities'],
                                       s['all_probabilities'], atol=2e-5)
            assert abs(sum(b['all_probabilities']) - 1.0) < 1e-5

    def test_text_results(self, live_engine):
        rs = live_engine.predict_texts(['i am so happy today',
                                        'i feel very sad'])
        for r in rs:
            assert r['emotion'] in Config.EMOTIONS
            assert abs(sum(r['all_probabilities']) - 1.0) < 1e-5
            assert '_fallback' not in r

    def test_lstm_results(self, live_engine):
        r = live_engine.predict_texts_lstm(['i am so happy today'])[0]
        assert r['emotion'] in Config.EMOTIONS
        assert '_fallback' not in r

    def test_image_results(self, live_engine, tmp_path):
        from PIL import Image
        img = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (64, 48, 3), np.uint8))
        p = str(tmp_path / 'face.png')
        img.save(p)
        r = live_engine.predict_image_paths([p])[0]
        assert r['emotion'] in Config.EMOTIONS
        assert '_fallback' not in r

    def test_trimodal_single_dispatch_matches_pieces(self, live_engine,
                                                     tmp_path):
        from PIL import Image
        audio = _tone_wav(tmp_path, 'tri.wav', rms_target=0.05, freq=400)
        img_p = str(tmp_path / 'tri.png')
        Image.fromarray(np.random.RandomState(1).randint(
            0, 255, (80, 80, 3), np.uint8)).save(img_p)
        text = 'i am so happy today'

        res = live_engine.predict_multimodal(audio, text, img_p)
        assert set(res) == {'speech', 'text', 'image', 'fusion'}
        assert 'attention_weights' in res['fusion']
        assert 'decision_weights' in res['fusion']
        aw = res['fusion']['attention_weights']
        assert abs(aw['speech'] + aw['text'] + aw['image'] - 1.0) < 1e-5

        # the fused graph must agree with the piecewise path
        s = live_engine.predict_speech_paths([audio], want_features=True)[0]
        t = live_engine.predict_texts([text], want_features=True)[0]
        i = live_engine.predict_image_paths([img_p], want_features=True)[0]
        piecewise = live_engine.fuse_attention(
            s['_features'], t['_features'], i['_features'],
            s['all_probabilities'], t['all_probabilities'],
            i['all_probabilities'])
        np.testing.assert_allclose(res['fusion']['all_probabilities'],
                                   piecewise['all_probabilities'], atol=2e-5)
        np.testing.assert_allclose(res['speech']['all_probabilities'],
                                   s['all_probabilities'], atol=2e-5)

        # MEC_B1_STREAM variant: per-component async puts feed the SAME
        # jit graph — identical results, different upload scheduling
        prev = live_engine._b1_stream
        try:
            live_engine._b1_stream = not prev
            res2 = live_engine.predict_multimodal(audio, text, img_p)
        finally:
            live_engine._b1_stream = prev
        np.testing.assert_allclose(res2['fusion']['all_probabilities'],
                                   res['fusion']['all_probabilities'],
                                   atol=1e-6)

    def test_trimodal_batch(self, live_engine, tmp_path):
        from PIL import Image
        audio = _tone_wav(tmp_path, 'b.wav')
        img_p = str(tmp_path / 'b.png')
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_p)
        reqs = [
            {'audio_path': audio, 'text': 'so happy', 'image_path': img_p},
            {'text': 'i feel sad'},
            {'audio_path': audio, 'text': 'wow', 'image_path': img_p},
        ]
        out = live_engine.predict_multimodal_batch(reqs)
        assert len(out) == 3
        assert 'fusion' in out[0] and 'fusion' in out[2]
        assert set(out[1]) == {'text'}

    def test_trimodal_batch_predecoded_matches_paths(self, live_engine,
                                                     tmp_path):
        """Request-thread predecode (engine.predecode_multimodal, used
        by the webapp so batch formation never waits on host decode):
        pre-decoded wave/image arrays produce bit-identical results to
        the path-decoding batch path, and a failed predecode degrades
        exactly like a bad upload."""
        from PIL import Image
        audio = _tone_wav(tmp_path, 'pd.wav')
        img_p = str(tmp_path / 'pd.png')
        Image.fromarray(np.full((32, 32, 3), 96, np.uint8)).save(img_p)
        raw = {'audio_path': audio, 'text': 'what a happy surprise',
               'image_path': img_p}
        pre = live_engine.predecode_multimodal(raw)
        assert pre.get('wave') is not None
        assert pre.get('image') is not None
        assert pre['image'].shape == (*live_engine._image_size, 3)
        out_paths = live_engine.predict_multimodal_batch([raw, raw])
        out_pre = live_engine.predict_multimodal_batch([pre, pre])
        np.testing.assert_array_equal(
            out_pre[0]['fusion']['all_probabilities'],
            out_paths[0]['fusion']['all_probabilities'])
        np.testing.assert_array_equal(
            out_pre[1]['image']['all_probabilities'],
            out_paths[1]['image']['all_probabilities'])

        # failed predecode keeps only the path; the batch path
        # re-attempts and degrades that request down the ladder
        bad = str(tmp_path / 'bad.png')
        with open(bad, 'wb') as f:
            f.write(b'not an image')
        broken = live_engine.predecode_multimodal(
            dict(raw, image_path=bad))
        assert broken.get('image') is None
        out = live_engine.predict_multimodal_batch([broken])
        assert out[0]['image']['emotion'] == 'neutral'  # fallback ladder
        assert out[0]['image']['confidence'] == pytest.approx(0.9)

    def test_facade_extract_features_shapes(self, live_engine, tmp_path):
        from mec_tpu.inference.speech_inference import SpeechInference
        feat, pred = SpeechInference().extract_features(
            _tone_wav(tmp_path, 'x.wav'))
        assert feat.shape == (64,) and pred.shape == (7,)

    def test_bert_seq_bucket_exact(self, live_engine):
        """Slicing padded BERT inputs to a shorter bucket must not move
        the logits: padded keys' additive bias (dtype min) underflows
        their attention weight to exactly 0."""
        from mec_tpu.config import Config
        eng = live_engine
        ids, mask = eng.bert_tokenizer.encode_batch(
            ['i am so happy today', 'wow'], Config.MAX_TEXT_LENGTH)
        assert ids.shape[1] == Config.MAX_TEXT_LENGTH
        full = np.asarray(eng._bert_jit(eng.bert['variables'], ids, mask))
        s_ids, s_mask = eng._seq_slice(ids, mask)
        assert s_ids.shape[1] == min(Config.SEQ_BUCKETS)
        sliced = np.asarray(eng._bert_jit(eng.bert['variables'],
                                          s_ids, s_mask))
        np.testing.assert_allclose(sliced, full, atol=1e-6)


class TestWireServing:
    """Perf-mode wire compression (12-bit PCM audio + YUV 4:2:0 image) must
    not flip decisions vs the fp32 parity engine on the same artifacts."""

    @pytest.fixture()
    def bf16_engine(self, artifacts_dir):
        from mec_tpu.config import Config
        from mec_tpu.serving import engine as eng
        old = Config.COMPUTE_DTYPE
        Config.COMPUTE_DTYPE = 'bfloat16'
        assert Config.WIRE_COMPRESS  # default-on in perf mode
        try:
            yield eng.EmotionEngine(models_dir=artifacts_dir)
        finally:
            Config.COMPUTE_DTYPE = old

    def test_trimodal_wire_decisions_match_fp32(self, live_engine,
                                                bf16_engine, tmp_path):
        from PIL import Image
        audio = _tone_wav(tmp_path, 'wire.wav', rms_target=0.05, freq=330)
        img_p = str(tmp_path / 'wire.png')
        rng = np.random.RandomState(5)
        luma = rng.randint(40, 200, (96, 96, 1)).astype(np.uint8)
        Image.fromarray(np.repeat(luma, 3, axis=-1)).save(img_p)
        text = 'i am so happy today'

        ref = live_engine.predict_multimodal(audio, text, img_p)
        out = bf16_engine.predict_multimodal(audio, text, img_p)
        for mod in ('speech', 'text', 'image', 'fusion'):
            pa = np.asarray(ref[mod]['all_probabilities'])
            pb = np.asarray(out[mod]['all_probabilities'])
            np.testing.assert_allclose(pa, pb, atol=0.05)
            if ref[mod]['confidence'] > 0.6:
                assert ref[mod]['emotion'] == out[mod]['emotion'], mod

    @pytest.fixture()
    def host_audio_engine(self, artifacts_dir):
        """bf16 engine with host featurization forced on: the audio wire
        is the (B, 56) feature matrix (C++/numpy host frontend) instead
        of the packed waveform."""
        from mec_tpu.config import Config
        from mec_tpu.serving import engine as eng
        old_dtype = Config.COMPUTE_DTYPE
        old_ha = Config.HOST_AUDIO_FEATURES
        Config.COMPUTE_DTYPE = 'bfloat16'
        Config.HOST_AUDIO_FEATURES = '1'
        try:
            e = eng.EmotionEngine(models_dir=artifacts_dir)
            assert e._host_audio
            yield e
        finally:
            Config.COMPUTE_DTYPE = old_dtype
            Config.HOST_AUDIO_FEATURES = old_ha

    def test_host_audio_features_decisions_match_fp32(self, live_engine,
                                                      host_audio_engine,
                                                      tmp_path):
        """Tri-modal through the host-featurized audio wire must agree
        with the fp32 parity engine like the waveform wire does."""
        from PIL import Image
        audio = _tone_wav(tmp_path, 'ha.wav', rms_target=0.05, freq=330)
        img_p = str(tmp_path / 'ha.png')
        rng = np.random.RandomState(5)
        luma = rng.randint(40, 200, (96, 96, 1)).astype(np.uint8)
        Image.fromarray(np.repeat(luma, 3, axis=-1)).save(img_p)
        text = 'i am so happy today'

        ref = live_engine.predict_multimodal(audio, text, img_p)
        out = host_audio_engine.predict_multimodal(audio, text, img_p)
        for mod in ('speech', 'text', 'image', 'fusion'):
            pa = np.asarray(ref[mod]['all_probabilities'])
            pb = np.asarray(out[mod]['all_probabilities'])
            np.testing.assert_allclose(pa, pb, atol=0.05)
            if ref[mod]['confidence'] > 0.6:
                assert ref[mod]['emotion'] == out[mod]['emotion'], mod
        # speech batching through the feature wire stays consistent
        batch = host_audio_engine.predict_speech_paths([audio] * 3)
        np.testing.assert_allclose(
            np.asarray(batch[0]['all_probabilities']),
            np.asarray(out['speech']['all_probabilities']), atol=1e-3)

    def test_image_wire_vs_raw_same_engine(self, bf16_engine):
        """YUV wire path vs raw path, same bf16 weights: only the codec
        differs, so probabilities must be close on any input."""
        from mec_tpu.config import Config
        imgs = np.random.RandomState(7).randint(
            0, 256, (2, 224, 224, 3), dtype=np.uint8)
        wired = bf16_engine.predict_images(imgs)
        old = Config.WIRE_COMPRESS
        Config.WIRE_COMPRESS = False
        try:
            raw = bf16_engine.predict_images(imgs)
        finally:
            Config.WIRE_COMPRESS = old
        for a, b in zip(wired, raw):
            np.testing.assert_allclose(
                np.asarray(a['all_probabilities']),
                np.asarray(b['all_probabilities']), atol=0.06)


class TestBatchDecodeIsolation:
    def test_one_bad_upload_degrades_only_itself(self, live_engine,
                                                 tmp_path):
        """A coalesced tri-modal batch with one undecodable audio and one
        undecodable image must not fail the whole batch: the bad requests
        take the fallback ladder, the good one still fuses with
        attention (regression: an AudioDecodeError in the batch path
        500'd every request sharing the dispatch)."""
        from PIL import Image
        audio = _tone_wav(tmp_path, 'good.wav')
        img_p = str(tmp_path / 'good.png')
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_p)
        bad_wav = str(tmp_path / 'bad.wav')
        with open(bad_wav, 'wb') as f:
            f.write(b'definitely not RIFF')
        bad_img = str(tmp_path / 'bad.png')
        with open(bad_img, 'wb') as f:
            f.write(b'not a png either')

        reqs = [
            {'audio_path': audio, 'text': 'so happy', 'image_path': img_p},
            {'audio_path': bad_wav, 'text': 'so happy',
             'image_path': img_p},
            {'audio_path': audio, 'text': 'so happy',
             'image_path': bad_img},
        ]
        out = live_engine.predict_multimodal_batch(reqs)
        assert len(out) == 3
        # good request: full attention fusion
        assert 'attention_weights' in out[0]['fusion']
        # bad-audio request: speech fell back, fusion still present
        assert out[1]['speech'].get('_fallback')
        assert 'fusion' in out[1]
        # bad-image request: image fell back to neutral
        assert out[2]['image'].get('_fallback')
        assert 'fusion' in out[2]
