"""Dataset organizer tests (the reference ships organize_datasets.py with
no tests; SURVEY.md §4)."""

import pytest
from pathlib import Path

from mec_tpu.datasets import organize


def test_tess_organizer(tmp_path):
    tess = tmp_path / 'TESS Toronto emotional speech set data'
    for folder, n in (('OAF_angry', 2), ('YAF_pleasant_surprise', 1),
                      ('OAF_Sad', 1), ('weird_folder', 1)):
        d = tess / folder
        d.mkdir(parents=True)
        for i in range(n):
            (d / f'clip{i}.wav').write_bytes(b'RIFF')
    count = organize.organize_speech_tess(tmp_path)
    assert count == 4  # weird_folder skipped
    assert len(list((tmp_path / 'speech' / 'angry').glob('*.wav'))) == 2
    assert len(list((tmp_path / 'speech' / 'surprise').glob('*.wav'))) == 1
    assert len(list((tmp_path / 'speech' / 'sad').glob('*.wav'))) == 1
    # idempotent
    assert organize.organize_speech_tess(tmp_path) == 0


def test_fer2013_organizer(tmp_path):
    fer = tmp_path / 'FER2013'
    for split in ('train', 'test'):
        for emotion in ('happy', 'unknown_emotion'):
            d = fer / split / emotion
            d.mkdir(parents=True)
            (d / 'img1.jpg').write_bytes(b'\xff\xd8')
            (d / 'notes.txt').write_text('skip me')
    count = organize.organize_images_fer2013(tmp_path)
    assert count == 2  # train_img1.jpg + test_img1.jpg, unknown skipped
    files = sorted(p.name for p in
                   (tmp_path / 'images' / 'happy').glob('*'))
    assert files == ['test_img1.jpg', 'train_img1.jpg']


def test_text_organizer(tmp_path):
    src = tmp_path / 'emotion_dataset'
    src.mkdir(parents=True)
    (src / 'train.txt').write_text(
        'i am thrilled;joy\nlovely;love\nterrible news;sadness\n'
        'broken line no separator\nodd;unknownlabel\n')
    (src / 'val.txt').write_text('what a shock;surprise\n')
    n = organize.organize_text_emotion(tmp_path)
    assert n == 4
    csv_text = (tmp_path / 'text' / 'emotion_dataset.csv').read_text()
    assert 'i am thrilled,happy' in csv_text
    assert 'lovely,happy' in csv_text
    assert 'terrible news,sad' in csv_text
    assert 'what a shock,surprise' in csv_text


def test_download_degrades_without_kaggle(monkeypatch, tmp_path):
    from mec_tpu.datasets import download
    monkeypatch.setattr(download.shutil, 'which', lambda _x: None)
    assert download.download_dataset(dest=str(tmp_path)) is False


def test_convert_cli(tmp_path):
    """python -m mec_tpu.convert turns a reference .pt into .mecp."""
    import torch

    from mec_tpu.convert.__main__ import convert_all
    from mec_tpu.convert import store
    from tests.torch_oracles import OracleFusionModel

    torch.manual_seed(0)
    oracle = OracleFusionModel().eval()
    torch.save({'model_state_dict': oracle.state_dict(),
                'config': {'speech_dim': 64, 'text_dim': 768,
                           'image_dim': 512, 'num_classes': 7,
                           'hidden_dim': 256}},
               tmp_path / 'fusion_model.pt')
    n = convert_all(str(tmp_path))
    assert n == 1
    loaded = store.load_params(str(tmp_path / 'fusion_model.mecp'))
    assert loaded['meta']['config']['speech_dim'] == 64


def test_image_preprocessing_public_api(tmp_path):
    """Reference preprocessing API: detect_face + preprocess_image shapes
    (reference tests/test_preprocessing.py:119-159). Works with or without
    an OpenCV build that has the Haar cascade module."""
    cv2 = pytest.importorskip('cv2')
    import numpy as np
    from mec_tpu.preprocessing.image_preprocessing import (detect_face,
                                                           preprocess_image)
    p = str(tmp_path / 'img.jpg')
    cv2.imwrite(p, np.random.RandomState(0).randint(
        0, 255, (120, 160, 3), np.uint8))
    face = detect_face(p)
    assert face is not None and face.ndim == 3
    out = preprocess_image(p)
    assert out.shape == (1, 224, 224, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert detect_face(str(tmp_path / 'missing.jpg')) is None
