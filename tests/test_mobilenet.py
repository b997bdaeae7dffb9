"""MobileNetV2 image variant: flax-vs-torch-oracle parity, converter,
trainer, and serving integration.

The reference README advertises "MobileNetV2 transfer learning"
(reference README.md:13) though its code ships ResNet50; this is the
advertised variant. The torch oracle mirrors torchvision's mobilenet_v2
module/state-dict layout (same caveat as the ResNet oracle —
torchvision itself is not installed; see BASELINE.md).
"""

import numpy as np
import pytest
import torch

from mec_tpu.convert.torch_pt import convert_image_pt
from mec_tpu.models.mobilenet import MobileNetV2EmotionModel


@pytest.fixture(scope='module')
def oracle_and_flax():
    from tests.torch_oracles import OracleMobileNetEmotionModel
    torch.manual_seed(0)
    om = OracleMobileNetEmotionModel().eval()
    # randomize BN stats so parity actually exercises them
    for m in om.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in om.state_dict().items()}
    variables = convert_image_pt(sd)
    return om, variables


class TestMobileNetParity:
    def test_logits_match_torch_oracle(self, oracle_and_flax):
        om, variables = oracle_and_flax
        x = np.random.RandomState(0).randn(4, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            ref = om(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        model = MobileNetV2EmotionModel()
        logits, feat = model.apply(variables, x)
        np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-4)
        assert feat.shape == (4, 512)

    def test_head_feature_matches_oracle(self, oracle_and_flax):
        om, variables = oracle_and_flax
        x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            t = om.base.features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            pooled = t.mean([2, 3])
            ref_feat = torch.relu(om.base.classifier[1](pooled)).numpy()
        model = MobileNetV2EmotionModel()
        _logits, feat = model.apply(variables, x)
        np.testing.assert_allclose(np.asarray(feat), ref_feat, atol=1e-4)

    def test_residual_and_stride_structure(self, oracle_and_flax):
        # 64px input: strides 2,2,2,2,2 -> 2x2 final map; any structural
        # mismatch (residual wiring, stride placement) breaks parity at
        # a second input size
        om, variables = oracle_and_flax
        x = np.random.RandomState(2).randn(2, 96, 96, 3).astype(np.float32)
        with torch.no_grad():
            ref = om(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        logits, _ = MobileNetV2EmotionModel().apply(variables, x)
        np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-4)


def test_trainer_mobilenet_two_phase(tmp_path):
    from mec_tpu.training import train_image
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (24, 48, 48, 3), np.uint8)
    labels = (np.arange(24) % 7).astype(np.int32)
    best_vars, hist = train_image.train(
        data_root='', img_size=48, batch_size=8, epochs=2,
        phase1_epochs=1, models_dir=str(tmp_path), imgs=imgs,
        labels=labels, augment=False, verbose=False, arch='mobilenet_v2')
    assert 'conv_stem' in best_vars['params']
    out = tmp_path / 'image_model.mecp'
    assert out.exists()
    from mec_tpu.convert import store
    loaded = store.load_params(str(out))
    assert loaded['meta']['arch'] == 'mobilenet_v2'


def test_engine_serves_mobilenet(tmp_path, oracle_and_flax):
    """Engine auto-detects the MobileNetV2 layout and serves the image
    path + fused tri-modal graph with it (512-dim head feature keeps
    fusion unchanged)."""
    import joblib
    import torch as _torch
    from mec_tpu.serving import engine as eng
    from mec_tpu.serving.synthetic_artifacts import write_synthetic_artifacts
    om, variables = oracle_and_flax
    d = str(tmp_path / 'models')
    write_synthetic_artifacts(d, tiny=True)
    # overwrite the image artifact with the reference-format .pt
    import os
    os.remove(os.path.join(d, 'image_model.mecp'))
    _torch.save(om.state_dict(), os.path.join(d, 'image_model.pt'))

    engine = eng.EmotionEngine(models_dir=d)
    assert 'conv_stem' in engine.image['variables']['params']
    img = np.random.RandomState(3).randint(0, 255, (2, 224, 224, 3),
                                           np.uint8)
    out = engine.predict_images(img)
    assert len(out) == 2
    probs = np.asarray(out[0]['all_probabilities'])
    assert probs.shape == (7,) and abs(probs.sum() - 1) < 1e-4

    # oracle cross-check through the full serving path (fp32 parity mode)
    from mec_tpu.image.preprocess import IMAGENET_MEAN, IMAGENET_STD
    x = img.astype(np.float32) / 255.0
    x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    with _torch.no_grad():
        ref = _torch.softmax(om(_torch.from_numpy(
            x.transpose(0, 3, 1, 2))), dim=-1).numpy()
    np.testing.assert_allclose(
        np.asarray([r['all_probabilities'] for r in out]), ref, atol=1e-4)


def test_engine_serves_artifact_declared_48px(tmp_path):
    """A MobileNetV2 trained at FER2013's native 48x48 declares img_size
    in its .mecp meta; the engine's whole image path (decode, wire,
    warmup shapes, fused graph) follows the artifact's resolution."""
    import numpy as np
    from PIL import Image
    from mec_tpu.serving import engine as eng
    from mec_tpu.serving.synthetic_artifacts import write_synthetic_artifacts
    from mec_tpu.training import train_image

    d = str(tmp_path / 'models')
    write_synthetic_artifacts(d, tiny=True)
    rng = np.random.RandomState(0)
    train_image.train(
        data_root='', img_size=48, batch_size=8, epochs=1, phase1_epochs=1,
        models_dir=d, imgs=rng.randint(0, 255, (16, 48, 48, 3), np.uint8),
        labels=(np.arange(16) % 7).astype(np.int32), augment=False,
        verbose=False, arch='mobilenet_v2')

    engine = eng.EmotionEngine(models_dir=d)
    assert engine._image_size == (48, 48)
    img_path = str(tmp_path / 'face.png')
    Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8)
                    ).save(img_path)  # arbitrary input size, resized to 48
    out = engine.predict_image_paths([img_path, img_path])
    assert len(out) == 2
    probs = np.asarray(out[0]['all_probabilities'])
    assert probs.shape == (7,) and abs(probs.sum() - 1) < 1e-4

    # tri-modal fused graph compiles and serves at the 48-px shape
    from mec_tpu.ops import wav as wav_ops
    wav_path = str(tmp_path / 'a.wav')
    t = np.arange(22050 * 3) / 22050.0
    wav_ops.write_wav(wav_path, (0.2 * np.sin(2 * np.pi * 440 * t)
                                 ).astype(np.float32), 22050)
    res = engine.predict_multimodal(wav_path, 'feeling great', img_path)
    assert 'fusion' in res and 'image' in res
