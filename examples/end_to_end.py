"""End-to-end walkthrough: generate data -> train -> serve -> predict.

    python examples/end_to_end.py [--workdir /tmp/mec_demo]

Generates a small synthetic-but-learnable emotion corpus (tonal wav clips
whose spectral signature encodes the class, labeled sentences, colored
face-placeholder images), trains the speech DNN + Bi-LSTM + fusion models
with the real CLIs' code paths, then serves predictions through the
engine — demonstrating the full train->artifact->serve loop without any
external dataset.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from mec_tpu.config import Config  # noqa: E402
from mec_tpu.ops import wav  # noqa: E402

EMOTION_TONES = {e: 180 + 90 * i for i, e in enumerate(Config.EMOTIONS)}
EMOTION_PHRASES = {
    'happy': 'what a wonderful day i feel great',
    'sad': 'terrible news i feel so down',
    'angry': 'this makes me furious and mad',
    'fear': 'i am scared and anxious about it',
    'disgust': 'that is gross and revolting',
    'surprise': 'wow i did not expect that at all',
    'neutral': 'the meeting is at three in the afternoon',
}


def make_speech_corpus(root: str, per_class: int = 12) -> str:
    """Tonal clips: each emotion gets a distinct fundamental frequency, so
    the MFCC frontend + DNN genuinely have signal to learn."""
    rng = np.random.RandomState(0)
    t = np.arange(Config.AUDIO_SAMPLES) / Config.SAMPLE_RATE
    for emotion, f0 in EMOTION_TONES.items():
        d = os.path.join(root, emotion)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            f = f0 * (1 + rng.uniform(-0.03, 0.03))
            y = (0.4 * np.sin(2 * np.pi * f * t)
                 + 0.15 * np.sin(2 * np.pi * 2 * f * t)
                 + 0.02 * rng.randn(len(t))).astype(np.float32)
            wav.write_wav(os.path.join(d, f'{i}.wav'), y,
                          Config.SAMPLE_RATE)
    return root


def make_text_corpus(per_class: int = 20):
    rng = np.random.RandomState(1)
    fillers = ['really', 'honestly', 'you know', 'well', 'today', 'again']
    texts, labels = [], []
    for idx, (emotion, phrase) in enumerate(EMOTION_PHRASES.items()):
        for _ in range(per_class):
            words = phrase.split()
            pos = rng.randint(0, len(words) + 1)
            words.insert(pos, fillers[rng.randint(len(fillers))])
            texts.append(' '.join(words))
            labels.append(idx)
    return np.array(texts, dtype=object), np.array(labels, np.int32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', default='/tmp/mec_demo')
    p.add_argument('--epochs', type=int, default=8)
    p.add_argument('--cpu', action='store_true',
                   help='force the CPU backend (tiny demo models; useful '
                        'when the TPU link is slow or busy)')
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    models_dir = os.path.join(args.workdir, 'models')

    print('== 1. speech: corpus -> features -> DNN ==')
    speech_root = make_speech_corpus(os.path.join(args.workdir, 'speech'))
    from mec_tpu.training import train_speech
    _, _, hist = train_speech.train(
        data_root=speech_root, epochs=args.epochs, batch_size=16,
        models_dir=models_dir, verbose=False)
    print(f'   speech val_acc: {max(hist["val_acc"]):.2f}')

    print('== 2. text: Bi-LSTM ==')
    texts, labels = make_text_corpus()
    from mec_tpu.training import train_text_lstm
    _, _, hist = train_text_lstm.train(
        csv_path=None, texts=texts, labels=labels, epochs=args.epochs,
        batch_size=16, max_length=24, models_dir=models_dir, verbose=False)
    print(f'   lstm val_acc: {max(hist["val_acc"]):.2f}')

    print('== 3. fusion (synthetic features) ==')
    from mec_tpu.training import train_fusion
    _, _, hist = train_fusion.train(num_samples=700, epochs=5,
                                    batch_size=64, models_dir=models_dir,
                                    verbose=False)
    print(f'   fusion val_acc: {max(hist["val_acc"]):.2f}')

    print('== 4. serve the artifacts ==')
    from mec_tpu.serving.engine import EmotionEngine
    engine = EmotionEngine(models_dir=models_dir)
    clip = os.path.join(speech_root, 'angry', '0.wav')
    r = engine.predict_speech_paths([clip])[0]
    print(f"   speech('angry/0.wav') -> {r['emotion']} "
          f"({r['confidence']:.2f})")
    r = engine.predict_texts_lstm(['this makes me furious and mad'])[0]
    print(f"   lstm('furious...') -> {r['emotion']} "
          f"({r['confidence']:.2f})")
    results = engine.predict_multimodal(
        audio_path=clip, text='this makes me furious and mad')
    print(f"   multimodal fusion -> {results['fusion']['emotion']} "
          f"({results['fusion']['confidence']:.2f})")
    print('done.')


if __name__ == '__main__':
    main()
