"""Speech emotion DNN trainer.

Parity with reference model_training/train_speech_model.py: same
architecture (SpeechDNN), 85/15 stratified split (:187-190), standardize
(:196-198), 3x Gaussian-noise augmentation sigma 0.05/0.1 (:201-210),
Adam 1e-3 clipnorm 1.0 + categorical cross-entropy + L2(1e-4) on Dense
kernels (:97-103), EarlyStopping(val_acc, patience 25) +
ReduceLROnPlateau(0.5, patience 10) + best checkpointing (:218-238).

TPU-first differences: batched jitted feature extraction for the dataset
(one device dispatch per 256 clips), no GPU gate, optional multi-chip
data parallelism (--mesh-data).
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
from mec_tpu.models.speech_dnn import SpeechDNN
from mec_tpu.parallel.mesh import make_mesh
from mec_tpu.training import common, data, metrics

L2 = 1e-4  # Keras kernel_regularizer=l2(1e-4), reference :60-90


def l2_penalty(params) -> jnp.ndarray:
    total = jnp.zeros((), jnp.float32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, 'key', '') for k in path]
        if keys and keys[-1] == 'kernel':
            total = total + (leaf.astype(jnp.float32) ** 2).sum()
    return L2 * total


def make_steps(model: SpeechDNN):
    @jax.jit
    def train_step(state: common.TrainState, batch, dropout_rng):
        def loss_fn(params):
            (p, _), mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch['x'], train=True, mutable=['batch_stats'],
                rngs={'dropout': dropout_rng})
            logp = jnp.log(jnp.clip(p, 1e-12, 1.0))
            ce = -(batch['label'] * logp).sum(axis=-1).mean()
            return ce + l2_penalty(params), mutated['batch_stats']

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss

    @jax.jit
    def eval_step(variables, batch):
        probs, _ = model.apply(variables, batch['x'])
        return jnp.log(jnp.clip(probs, 1e-12, 1.0))  # logits-like for CE

    return train_step, eval_step


def train(data_root: str = 'datasets/speech', pattern: str = '**/*.wav',
          label_from: str = 'parent', epochs: int = 200,
          batch_size: int = 64, augment: bool = True,
          models_dir: Optional[str] = None, mesh_data: int = 0,
          seed: int = 42, X: Optional[np.ndarray] = None,
          y: Optional[np.ndarray] = None, verbose: bool = True,
          checkpoint_path: Optional[str] = None, resume: bool = False):
    log = print if verbose else (lambda *_a, **_k: None)
    if X is None:
        X, y = data.load_speech_dataset(data_root, pattern, label_from,
                                        verbose=verbose)
    if len(X) == 0:
        raise SystemExit('No training data found')

    tr, va = metrics.train_test_split_stratified(len(X), y, 0.15, seed=42)
    X_train, X_val = X[tr], X[va]
    y_train, y_val = y[tr], y[va]

    mean = X_train.mean(axis=0)
    scale = X_train.std(axis=0)
    scale = np.where(scale > 0, scale, 1.0)
    X_train = ((X_train - mean) / scale).astype(np.float32)
    X_val = ((X_val - mean) / scale).astype(np.float32)

    if augment:
        rng = np.random.RandomState(seed)
        X_train = np.vstack([
            X_train,
            X_train + rng.normal(0, 0.05, X_train.shape),
            X_train + rng.normal(0, 0.10, X_train.shape),
        ]).astype(np.float32)
        y_train = np.concatenate([y_train] * 3)
        log(f'Augmented training set: {len(X_train)} samples')

    onehot = np.eye(Config.NUM_EMOTIONS, dtype=np.float32)
    model = SpeechDNN()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, X.shape[1]), jnp.float32))
    tx = common.adam_with_clip(1e-3, clipnorm=1.0)
    state = common.TrainState.create(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, tx)

    train_step, eval_step = make_steps(model)
    mesh = make_mesh(data=mesh_data) if mesh_data > 1 else None

    state, best_vars, history = common.fit(
        state,
        {'x': X_train, 'label': onehot[y_train]},
        {'x': X_val, 'label': onehot[y_val]},
        train_step, eval_step,
        epochs=epochs, batch_size=batch_size, seed=seed,
        monitor='val_acc', patience=25,
        reduce_lr_factor=0.5, reduce_lr_patience=10, min_lr=1e-6,
        mesh=mesh, log_fn=log,
        checkpoint_path=checkpoint_path, resume=resume)

    # evaluation report on the best weights
    logits = np.asarray(eval_step(best_vars,
                                  {'x': X_val, 'label': onehot[y_val]}))
    preds = logits.argmax(axis=-1)
    log('\n' + metrics.classification_report(y_val, preds, Config.EMOTIONS))
    common.record_metrics('speech_dnn', max(history['val_acc']),
                          y_val, preds)

    models_dir = models_dir or os.path.dirname(Config.SPEECH_MODEL_PATH)
    os.makedirs(models_dir, exist_ok=True)
    out = os.path.join(models_dir, 'speech_model.mecp')
    store.save_params(out, best_vars,
                      meta={'val_acc': float(max(history['val_acc']))})
    np.savez(os.path.join(models_dir, 'speech_scaler.npz'),
             mean=mean.astype(np.float32), scale=scale.astype(np.float32))
    log(f'Saved {out} (+ scaler npz)')
    return best_vars, (mean, scale), history


def main(argv=None):
    p = argparse.ArgumentParser(description='Train the speech emotion DNN')
    p.add_argument('--data-root', default='datasets/speech')
    p.add_argument('--pattern', default='**/*.wav')
    p.add_argument('--label-from', default='parent',
                   choices=['parent', 'name'])
    p.add_argument('--epochs', type=int, default=200)
    p.add_argument('--batch-size', type=int, default=64)
    p.add_argument('--no-augment', action='store_true')
    p.add_argument('--models-dir', default=None)
    p.add_argument('--mesh-data', type=int, default=0,
                   help='data-parallel mesh size (0/1 = single device)')
    p.add_argument('--checkpoint', default=None,
                   help='path for per-epoch full-TrainState checkpoints')
    p.add_argument('--resume', action='store_true',
                   help='resume from --checkpoint')
    args = p.parse_args(argv)
    train(args.data_root, args.pattern, args.label_from, args.epochs,
          args.batch_size, not args.no_augment, args.models_dir,
          args.mesh_data, checkpoint_path=args.checkpoint,
          resume=args.resume)


if __name__ == '__main__':
    main()
