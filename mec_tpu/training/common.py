"""Shared training machinery: train state, fit loop, callbacks.

Host-side control (early stopping, LR plateau reduction, best-checkpoint
selection) mirrors the Keras callbacks the reference relies on
(reference model_training/train_speech_model.py:218-238); device-side work
is one jitted train step whose batch is sharded along the mesh 'data'
axis, so multi-chip data parallelism is placement, not new code.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from mec_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    """Minimal mutable-by-replacement train state (params + BN stats)."""
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt)

    @classmethod
    def create(cls, variables: Dict[str, Any],
               tx: optax.GradientTransformation) -> 'TrainState':
        params = variables['params']
        batch_stats = variables.get('batch_stats', FrozenDict({}))
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)

    @property
    def variables(self) -> Dict[str, Any]:
        v = {'params': self.params}
        bs = self.batch_stats
        has = (len(bs) > 0) if hasattr(bs, '__len__') else bs is not None
        if has:
            v['batch_stats'] = bs
        return v


def adam_with_clip(lr: float, clipnorm: float = 1.0
                   ) -> optax.GradientTransformation:
    """Adam + global-norm clip, LR exposed for plateau reduction
    (reference Keras `Adam(1e-3, clipnorm=1.0)`, train_speech_model.py:97)."""
    return optax.chain(
        optax.clip_by_global_norm(clipnorm),
        optax.inject_hyperparams(optax.adam)(learning_rate=lr))


def adamw_with_clip(lr, weight_decay: float = 0.01, clipnorm: float = 1.0,
                    ) -> optax.GradientTransformation:
    """AdamW + clip; `lr` may be a float or an optax schedule."""
    return optax.chain(
        optax.clip_by_global_norm(clipnorm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay))


def optimizer_total_steps(n_rows: int, batch_size: int, epochs: int,
                          grad_accum: int = 1) -> int:
    """Number of optimizer updates fit() will perform over a run — the
    right horizon for LR schedules (optax schedules count UPDATES, and
    optax.MultiSteps only advances the inner schedule on real updates).

    Micro-steps are ceil-counted: fit() trains the ragged tail batch
    too (true-shape on single device, padded under a mesh). The
    division by grad_accum happens once over the whole run because
    MultiSteps accumulation windows span epoch boundaries; flooring
    per-epoch would undercount by up to (grad_accum-1) updates/epoch
    and leave the schedule at 0 while real updates still arrive.
    """
    micro_per_epoch = max(1, -(-int(n_rows) // int(batch_size)))
    return max(1, (micro_per_epoch * int(epochs)) // max(1, int(grad_accum)))


def _inner_opt_state(opt_state):
    """Descend through optax.MultiSteps wrappers (gradient accumulation)
    to the underlying chain state."""
    while hasattr(opt_state, 'inner_opt_state'):
        opt_state = opt_state.inner_opt_state
    return opt_state


def get_lr(state: TrainState) -> float:
    """Current injected learning rate (for logging / plateau logic)."""
    for sub in _inner_opt_state(state.opt_state):
        if hasattr(sub, 'hyperparams') and 'learning_rate' in sub.hyperparams:
            return float(sub.hyperparams['learning_rate'])
    return float('nan')


def set_lr(state: TrainState, lr: float) -> TrainState:
    def fix(opt_state):
        if hasattr(opt_state, 'inner_opt_state'):
            return opt_state._replace(
                inner_opt_state=fix(opt_state.inner_opt_state))
        new_opt = []
        for sub in opt_state:
            if (hasattr(sub, 'hyperparams')
                    and 'learning_rate' in sub.hyperparams):
                hp = dict(sub.hyperparams)
                hp['learning_rate'] = jnp.asarray(lr, jnp.float32)
                sub = sub._replace(hyperparams=hp)
            new_opt.append(sub)
        return tuple(new_opt)

    return state.replace(opt_state=fix(state.opt_state))


def softmax_cross_entropy(logits: jnp.ndarray, onehot: jnp.ndarray
                          ) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(onehot * logp).sum(axis=-1).mean()


def iterate_batches(data: Dict[str, np.ndarray], batch_size: int,
                    rng: np.random.RandomState, shuffle: bool = True,
                    drop_remainder: bool = False
                    ) -> Iterator[Dict[str, np.ndarray]]:
    n = len(next(iter(data.values())))
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    stop = n - (n % batch_size) if drop_remainder else n
    for s in range(0, stop, batch_size):
        sel = idx[s:s + batch_size]
        yield {k: v[sel] for k, v in data.items()}


def pad_batch(batch: Dict[str, np.ndarray], batch_size: int
              ) -> Tuple[Dict[str, np.ndarray], int]:
    """Pad a ragged tail batch up to `batch_size` (static shapes: one
    compile per batch size, XLA requirement)."""
    n = len(next(iter(batch.values())))
    if n == batch_size:
        return batch, n
    pad = batch_size - n
    return ({k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
             for k, v in batch.items()}, n)


def record_metrics(model_name: str, val_acc: float,
                   y_true=None, y_pred=None) -> None:
    """Best-effort accuracy/F1 logging into the model_metrics table
    (the reference defines the table but never writes it,
    reference database/db_operations.py:75-84)."""
    try:
        from mec_tpu.database import get_db
        from mec_tpu.training import metrics as m
        f1 = precision = recall = None
        if y_true is not None and y_pred is not None and len(y_true):
            import numpy as _np
            pr = m.precision_recall_f1(_np.asarray(y_true),
                                       _np.asarray(y_pred),
                                       int(max(_np.max(y_true), 6)) + 1)
            precision = float(pr['precision'].mean())
            recall = float(pr['recall'].mean())
            f1 = float(pr['f1'].mean())
        get_db().record_model_metric(model_name, accuracy=float(val_acc),
                                     precision_score=precision,
                                     recall_score=recall, f1_score=f1)
    except Exception:
        pass


def fit(state: TrainState,
        train_data: Dict[str, np.ndarray],
        val_data: Dict[str, np.ndarray],
        train_step: Callable,
        eval_step: Callable,
        *,
        epochs: int,
        batch_size: int,
        seed: int = 0,
        monitor: str = 'val_acc',
        patience: Optional[int] = None,
        min_delta: float = 0.0,
        reduce_lr_factor: Optional[float] = None,
        reduce_lr_patience: int = 10,
        min_lr: float = 1e-6,
        mesh=None,
        log_fn: Callable[[str], None] = print,
        on_epoch_end: Optional[Callable] = None,
        checkpoint_path: Optional[str] = None,
        resume: bool = False,
        epoch_transform: Optional[Callable] = None,
        ) -> Tuple[TrainState, Any, Dict[str, list]]:
    """Generic epoch loop with early stopping + LR-on-plateau.

    checkpoint_path enables per-epoch full-TrainState checkpointing (the
    reference only keeps best weights, SURVEY.md §5); resume=True restores
    the state/epoch/history/BEST WEIGHTS from it and continues mid-run.
    Shuffle and dropout randomness are derived per (seed, epoch, step),
    so a resumed run continues the same stream an uninterrupted run
    would have used rather than replaying epoch 0's.

    epoch_transform(epoch, train_data) -> train_data lets a trainer
    re-randomize augmentation each epoch (torchvision-style transforms).

    train_step(state, batch, dropout_rng) -> (state, loss)
    eval_step(variables, batch) -> logits (or probs)

    Returns (final_state, best_variables, history).
    """
    base_key = jax.random.PRNGKey(seed)
    history: Dict[str, list] = {'loss': [], 'val_loss': [], 'val_acc': [],
                                'lr': []}
    best_metric = -np.inf
    best_vars = jax.tree.map(np.asarray, state.variables)
    best_epoch = -1
    plateau_wait = 0
    stop_wait = 0
    start_epoch = 0

    if checkpoint_path and resume:
        import os as _os

        from mec_tpu.training import checkpoint as _ckpt
        if _os.path.exists(checkpoint_path):
            state, extra = _ckpt.restore_train_state(checkpoint_path, state)
            start_epoch = int(extra.get('epoch', -1)) + 1
            history = {k: list(v) for k, v in
                       extra.get('history', history).items()}
            best_metric = float(extra.get('best_metric', best_metric))
            # without this, a resumed run whose later epochs never beat
            # best_metric would return (and the trainer would SAVE) the
            # fresh random-init variables captured above
            if extra.get('best_vars') is not None:
                best_vars = extra['best_vars']
            # callback state too: without these a resumed run resets the
            # early-stop/plateau clocks and trains up to `patience` extra
            # non-improving epochs an uninterrupted run would not
            best_epoch = int(extra.get('best_epoch', best_epoch))
            plateau_wait = int(extra.get('plateau_wait', 0))
            stop_wait = int(extra.get('stop_wait', 0))
            log_fn(f'Resumed from {checkpoint_path} at epoch {start_epoch}')

    batch_shard = batch_sharding(mesh) if mesh is not None else None
    repl = replicated(mesh) if mesh is not None else None
    if mesh is not None:
        state = jax.device_put(state, repl)

    # Donate the state pytree into every step: XLA writes the new
    # params/opt-state into the old buffers instead of double-buffering
    # them (saves ~(params + Adam m + v) of peak HBM — ~1.25 GB for
    # BERT-base fp32). fit() owns the state from here on: the caller's
    # pre-fit state/variables references are invalidated by the first
    # step (trainers only use the returned state / best_vars).
    train_step = jax.jit(train_step, donate_argnums=(0,))

    # One-dispatch epochs (single device): stack the epoch's full
    # batches and lax.scan the train step over them, so the whole inner
    # loop is ONE device dispatch instead of steps_per_epoch dispatches.
    # Per-step dispatch round trips dominate training wall-clock on a
    # remote-attached chip (fusion trainer measured 274 ms/step wall for
    # a ~1 ms device step through the tunnel). Batch order and the
    # per-(epoch, step) dropout key stream are IDENTICAL to the loop
    # path, so the numerics match (pinned by
    # tests/test_training.py::test_fit_scan_matches_loop); the ragged
    # tail batch still runs as its own true-shape step. Datasets larger
    # than MEC_TRAIN_SCAN_MB (the stacked copy lives in HBM alongside
    # the model) fall back to the per-step loop.
    scan_limit = float(os.environ.get('MEC_TRAIN_SCAN_MB', '256')) * 1e6
    epoch_scan = None
    epoch_gather = None
    dataset_dev = None   # device-resident dataset (fixed-data trainers)
    val_scan = None
    val_stacked_dev = None
    val_ns = None

    def run_epoch_scanned(state, stacked, ep_key, steps):
        nonlocal epoch_scan
        if epoch_scan is None:
            # donate only the state (argnum 0) — the stacked batches are
            # reused across iterations
            @partial(jax.jit, donate_argnums=(0,))
            def _run(state, stacked, ep_key, steps):
                def body(carry, xs):
                    batch, step = xs
                    sub = jax.random.fold_in(ep_key, step)
                    return train_step(carry, batch, sub)
                return jax.lax.scan(body, state, (stacked, steps))
            epoch_scan = _run
        return epoch_scan(state, stacked, ep_key, steps)

    def run_epoch_gathered(state, data_dev, idxs, ep_key, steps):
        # dataset stays in HBM; the per-epoch upload is just the
        # (n_full, batch_size) shuffled row indices
        nonlocal epoch_gather
        if epoch_gather is None:
            # donate only the state — data_dev stays resident in HBM
            # across epochs
            @partial(jax.jit, donate_argnums=(0,))
            def _run(state, data_dev, idxs, ep_key, steps):
                def body(carry, xs):
                    sel, step = xs
                    batch = {k: jnp.take(v, sel, axis=0)
                             for k, v in data_dev.items()}
                    sub = jax.random.fold_in(ep_key, step)
                    return train_step(carry, batch, sub)
                return jax.lax.scan(body, state, (idxs, steps))
            epoch_gather = _run
        return epoch_gather(state, data_dev, idxs, ep_key, steps)

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        # per-(seed, epoch) shuffle rng + per-(epoch, step) dropout keys:
        # resumable (epoch k is identical whether or not the run was
        # interrupted before it)
        ep_rng = np.random.RandomState((seed * 1000003 + epoch) % 2**32)
        ep_key = jax.random.fold_in(base_key, epoch)
        ep_data = (epoch_transform(epoch, train_data)
                   if epoch_transform is not None else train_data)
        n_rows = len(next(iter(ep_data.values())))
        data_bytes = sum(v.nbytes for v in ep_data.values())
        use_scan = (batch_shard is None and data_bytes <= scan_limit
                    and n_rows >= 2 * batch_size)
        if use_scan and epoch_transform is None:
            # fixed dataset: keep it device-resident across epochs and
            # ship only the shuffled indices (replicating
            # iterate_batches' order exactly)
            if dataset_dev is None:
                dataset_dev = jax.device_put(train_data)
            idx = np.arange(n_rows)
            ep_rng.shuffle(idx)
            n_full = n_rows // batch_size
            idxs = idx[:n_full * batch_size].astype(np.int32).reshape(
                n_full, batch_size)
            state, scan_losses = run_epoch_gathered(
                state, dataset_dev, idxs, ep_key,
                np.arange(n_full, dtype=np.int32))
            losses.append(scan_losses)
            tail_sel = idx[n_full * batch_size:]
            if tail_sel.size:
                batch = {k: v[tail_sel] for k, v in ep_data.items()}
                sub = jax.random.fold_in(ep_key, n_full)
                state, loss = train_step(state, batch, sub)
                losses.append(loss)
        elif use_scan:
            batches = list(iterate_batches(ep_data, batch_size, ep_rng))
            n_full = len(batches)
            if len(next(iter(batches[-1].values()))) < batch_size:
                n_full -= 1
            stacked = {k: np.stack([b[k] for b in batches[:n_full]])
                       for k in batches[0]}
            state, scan_losses = run_epoch_scanned(
                state, jax.device_put(stacked), ep_key,
                np.arange(n_full, dtype=np.int32))
            losses.append(scan_losses)
            # true-shape ragged tail (one extra compile), same step index
            # the loop path would have used
            for toff, batch in enumerate(batches[n_full:]):
                sub = jax.random.fold_in(ep_key, n_full + toff)
                state, loss = train_step(state, batch, sub)
                losses.append(loss)
        else:
            for step, batch in enumerate(
                    iterate_batches(ep_data, batch_size, ep_rng)):
                if batch_shard is not None:
                    # mesh sharding needs the static bucket shape; the
                    # padded duplicate rows slightly overweight the tail
                    # batch
                    batch, _n = pad_batch(batch, batch_size)
                    batch = jax.device_put(batch, batch_shard)
                # single-device: train the true ragged tail (one extra
                # compile) — padding would duplicate rows into the loss
                # mean and the BatchNorm batch statistics
                sub = jax.random.fold_in(ep_key, step)
                state, loss = train_step(state, batch, sub)
                losses.append(loss)
        train_loss = float(np.mean(np.concatenate(
            [np.asarray(l).reshape(-1) for l in losses]))) \
            if losses else 0.0

        # validation: under the scan path the fixed, padded val batches
        # are stacked once, kept on device, and evaluated as ONE scanned
        # dispatch per epoch (one fetch of all logits) instead of a
        # round trip per batch
        if use_scan and len(next(iter(val_data.values()))) > 0:
            if val_stacked_dev is None:
                vbatches, val_ns = [], []
                for batch in iterate_batches(val_data, batch_size, ep_rng,
                                             shuffle=False):
                    padded, n = pad_batch(batch, batch_size)
                    vbatches.append(padded)
                    val_ns.append(n)
                val_stacked_dev = jax.device_put(
                    {k: np.stack([b[k] for b in vbatches])
                     for k in vbatches[0]})

                @jax.jit
                def _val_run(variables, stacked):
                    return jax.lax.scan(
                        lambda c, b: (c, eval_step(variables, b)),
                        0, stacked)[1]
                val_scan = _val_run
            all_logits = np.asarray(val_scan(state.variables,
                                             val_stacked_dev))
            val_batches_iter = [
                (all_logits[i][:val_ns[i]],
                 np.asarray(vb['label'][:val_ns[i]]))
                for i, vb in enumerate(iterate_batches(
                    val_data, batch_size, ep_rng, shuffle=False))]
        else:
            val_batches_iter = None
        val_losses, val_hits, val_count = [], 0, 0
        for item in (val_batches_iter if val_batches_iter is not None
                     else iterate_batches(val_data, batch_size, ep_rng,
                                          shuffle=False)):
            if val_batches_iter is not None:
                logits, labels = item
                n = len(labels)
            else:
                batch = item
                padded, n = pad_batch(batch, batch_size)
                if batch_shard is not None:
                    padded = jax.device_put(padded, batch_shard)
                logits = eval_step(state.variables, padded)
                logits = np.asarray(logits)[:n]
                labels = np.asarray(batch['label'][:n])
            if labels.ndim > 1:
                labels = labels.argmax(axis=-1)
            logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
            val_losses.append(float(
                -jnp.take_along_axis(logp, jnp.asarray(labels)[:, None],
                                     axis=-1).sum()))
            val_hits += int((logits.argmax(axis=-1) == labels).sum())
            val_count += n
        val_loss = (sum(val_losses) / max(val_count, 1))
        val_acc = val_hits / max(val_count, 1)

        lr_now = get_lr(state)
        history['loss'].append(train_loss)
        history['val_loss'].append(val_loss)
        history['val_acc'].append(val_acc)
        history['lr'].append(lr_now)
        log_fn(f'Epoch {epoch + 1}/{epochs} - {time.time() - t0:.1f}s - '
               f'loss: {train_loss:.4f} - val_loss: {val_loss:.4f} - '
               f'val_acc: {val_acc:.4f} - lr: {lr_now:.2e}')

        metric = val_acc if monitor == 'val_acc' else -val_loss
        stopped = False
        if metric > best_metric + min_delta:
            best_metric = metric
            best_vars = jax.tree.map(np.asarray, state.variables)
            best_epoch = epoch
            plateau_wait = 0
            stop_wait = 0
        else:
            plateau_wait += 1
            stop_wait += 1
            if (reduce_lr_factor is not None
                    and plateau_wait >= reduce_lr_patience):
                new_lr = max(lr_now * reduce_lr_factor, min_lr)
                if new_lr < lr_now:
                    log_fn(f'ReduceLROnPlateau: lr {lr_now:.2e} '
                           f'-> {new_lr:.2e}')
                    state = set_lr(state, new_lr)
                plateau_wait = 0
            stopped = (patience is not None and stop_wait >= patience)

        # checkpoint BEFORE honoring early stop, so the stopping epoch's
        # state (incl. the callback counters) is resumable
        if checkpoint_path:
            from mec_tpu.training import checkpoint as _ckpt
            _ckpt.save_train_state(
                checkpoint_path, state,
                extra={'epoch': epoch, 'history': history,
                       'best_metric': float(best_metric),
                       'best_vars': best_vars,
                       'best_epoch': best_epoch,
                       'plateau_wait': plateau_wait,
                       'stop_wait': stop_wait})

        if on_epoch_end is not None:
            on_epoch_end(epoch, state, history)

        if stopped:
            log_fn(f'Early stopping at epoch {epoch + 1} '
                   f'(best epoch {best_epoch + 1})')
            break

    return state, best_vars, history
