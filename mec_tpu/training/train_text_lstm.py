"""Bi-LSTM text trainer (the fast text variant).

Parity with reference model_training/train_lstm_text_model.py: tolerant
CSV/TXT loading with joy/love→happy folding (:35-93), Keras-style
tokenizer vocab 10k + OOV (:148-152), the Embedding(128)→SpatialDropout→
BiLSTM(128 seq)→BiLSTM(64)→Dense128→Dense64→softmax architecture
(:96-122), Adam 1e-3 + sparse CE, 64/16/20 train/val/test split
(:158-163), EarlyStopping/ReduceLROnPlateau/best-checkpoint (:184-188).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mec_tpu.config import Config
from mec_tpu.convert import store
from mec_tpu.models.bilstm import BiLSTMTextModel
from mec_tpu.parallel.mesh import make_mesh
from mec_tpu.text.keras_tokenizer import KerasTokenizer
from mec_tpu.training import common, data, metrics


def make_steps(model: BiLSTMTextModel):
    @jax.jit
    def train_step(state: common.TrainState, batch, dropout_rng):
        def loss_fn(params):
            probs, _pen = model.apply(
                {'params': params}, batch['ids'], train=True,
                rngs={'dropout': dropout_rng})
            logp = jnp.log(jnp.clip(probs, 1e-12, 1.0))
            onehot = jax.nn.one_hot(batch['label'], probs.shape[-1])
            return -(onehot * logp).sum(axis=-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    @jax.jit
    def eval_step(variables, batch):
        probs, _pen = model.apply({'params': variables['params']},
                                  batch['ids'])
        return jnp.log(jnp.clip(probs, 1e-12, 1.0))

    return train_step, eval_step


def train(csv_path: str, epochs: int = 10, batch_size: int = 32,
          vocab_size: int = 10000, max_length: Optional[int] = None,
          models_dir: Optional[str] = None, mesh_data: int = 0,
          seed: int = 42, texts=None, labels=None, verbose: bool = True):
    log = print if verbose else (lambda *_a, **_k: None)
    max_length = max_length or Config.MAX_TEXT_LENGTH
    if texts is None:
        texts, labels = data.load_text_dataset(csv_path, fold_labels=True,
                                               verbose=verbose)
    if len(texts) == 0:
        raise SystemExit('No training data found')
    labels = np.asarray(labels)

    tokenizer = KerasTokenizer(num_words=vocab_size, oov_token='<OOV>')
    tokenizer.fit_on_texts(list(texts))
    ids = tokenizer.encode_batch(list(texts), maxlen=max_length)

    # 64/16/20: first split off 20% test, then 20%-of-remainder val
    tr_all, te = metrics.train_test_split_stratified(len(ids), labels,
                                                     0.20, seed=42)
    tr, va_rel = metrics.train_test_split_stratified(
        len(tr_all), labels[tr_all], 0.20, seed=42)
    tr_idx, va_idx = tr_all[tr], tr_all[va_rel]
    log(f'Split: train {len(tr_idx)} / val {len(va_idx)} / test {len(te)}')

    model = BiLSTMTextModel(vocab_size=vocab_size)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, max_length), jnp.int32))
    tx = common.adam_with_clip(1e-3, clipnorm=1.0)
    state = common.TrainState.create({'params': variables['params']}, tx)
    train_step, eval_step = make_steps(model)
    mesh = make_mesh(data=mesh_data) if mesh_data > 1 else None

    state, best_vars, history = common.fit(
        state,
        {'ids': ids[tr_idx], 'label': labels[tr_idx]},
        {'ids': ids[va_idx], 'label': labels[va_idx]},
        train_step, eval_step,
        epochs=epochs, batch_size=batch_size, seed=seed,
        monitor='val_acc', patience=5,
        reduce_lr_factor=0.5, reduce_lr_patience=3, mesh=mesh, log_fn=log)

    # test-set report
    test_batch, n = common.pad_batch(
        {'ids': ids[te], 'label': labels[te]}, max(len(te), 1))
    logits = np.asarray(eval_step(best_vars, test_batch))[:n]
    preds = logits.argmax(axis=-1)
    log('\nTest set report:')
    log(metrics.classification_report(labels[te], preds, Config.EMOTIONS))
    common.record_metrics('lstm_text', max(history['val_acc']),
                          labels[te], preds)

    models_dir = models_dir or os.path.dirname(Config.TEXT_MODEL_PATH)
    os.makedirs(models_dir, exist_ok=True)
    out = os.path.join(models_dir, 'text_model.mecp')
    store.save_params(out, best_vars,
                      meta={'val_acc': float(max(history['val_acc']))})
    tokenizer.to_json_file(os.path.join(models_dir,
                                        'text_model_tokenizer.json'))
    log(f'Saved {out} (+ tokenizer json)')
    return best_vars, tokenizer, history


def main(argv=None):
    p = argparse.ArgumentParser(description='Train the Bi-LSTM text model')
    p.add_argument('--csv', required=True)
    p.add_argument('--epochs', type=int, default=10)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--vocab-size', type=int, default=10000)
    p.add_argument('--max-length', type=int, default=Config.MAX_TEXT_LENGTH)
    p.add_argument('--models-dir', default=None)
    p.add_argument('--mesh-data', type=int, default=0)
    args = p.parse_args(argv)
    train(args.csv, args.epochs, args.batch_size, args.vocab_size,
          args.max_length, args.models_dir, args.mesh_data)


if __name__ == '__main__':
    main()
