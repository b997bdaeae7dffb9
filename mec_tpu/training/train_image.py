"""Facial-emotion image trainer (2-phase fine-tune).

Default architecture is the reference code's ResNet50; --arch mobilenet_v2
trains the README-advertised MobileNetV2 variant (models/mobilenet.py)
with the same schedule and head.

Parity with reference model_training/train_image_model.py: ImageFolder
layout + flip/rotate/color-jitter augmentation (:135-148), 85/15 split
seed 42 (:155-160), phase 1 trains the custom head at 10x LR with the
backbone frozen (≤10 epochs, :179-219), phase 2 unfreezes everything at
the base LR (:221-253), AdamW wd 0.01, cosine annealing, early stop
patience 5, best-val checkpoint.

TPU-first: images stay uint8 until the device (4x less host->HBM
bandwidth), normalization + forward are one jitted graph, backbone
freezing is an optax.multi_transform partition (no parameter copies), and
batches shard along the mesh 'data' axis.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mec_tpu.config import Config
from mec_tpu.convert import store
from mec_tpu.image.preprocess import IMAGENET_MEAN, IMAGENET_STD
from mec_tpu.models.resnet import ImageEmotionModel
from mec_tpu.parallel.mesh import make_mesh
from mec_tpu.training import common, data, metrics

def _label_of(path: tuple) -> str:
    """'head' for the custom fc1/fc2 head, 'backbone' for ResNet50."""
    return 'head' if any(str(getattr(k, 'key', k)).startswith('fc')
                         for k in path) else 'backbone'


def make_tx(lr, head_lr, freeze_backbone: bool, weight_decay: float = 0.01):
    """Two-group optimizer: head at head_lr, backbone at lr (or frozen)."""
    backbone_tx = (optax.set_to_zero() if freeze_backbone
                   else optax.adamw(lr, weight_decay=weight_decay))
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {'head': optax.adamw(head_lr, weight_decay=weight_decay),
             'backbone': backbone_tx},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda p, _: _label_of(p), params)))


def make_steps(model: ImageEmotionModel):
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def norm(img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        return (x - mean) / std

    @jax.jit
    def train_step(state: common.TrainState, batch, dropout_rng):
        def loss_fn(params):
            (logits, _feat), mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                norm(batch['img']), train=True, mutable=['batch_stats'],
                rngs={'dropout': dropout_rng})
            onehot = jax.nn.one_hot(batch['label'], logits.shape[-1])
            return (common.softmax_cross_entropy(logits, onehot),
                    mutated['batch_stats'])

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss

    @jax.jit
    def eval_step(variables, batch):
        logits, _feat = model.apply(variables, norm(batch['img']))
        return logits

    return train_step, eval_step


def train(data_root: str, img_size: int = 224, batch_size: int = 32,
          epochs: int = 30, learning_rate: float = 1e-4,
          phase1_epochs: int = 10, models_dir: Optional[str] = None,
          mesh_data: int = 0, seed: int = 42, augment: bool = True,
          imgs: Optional[np.ndarray] = None,
          labels: Optional[np.ndarray] = None, verbose: bool = True,
          bf16: bool = False, arch: str = 'resnet50',
          grad_accum: int = 1, remat: bool = False):
    log = print if verbose else (lambda *_a, **_k: None)
    if img_size % 2:
        raise SystemExit(f'--img-size {img_size} must be even: serving '
                         'ships YUV 4:2:0 images (2x2 chroma subsampling)')
    if imgs is None:
        paths, labels = data.list_image_dataset(data_root, verbose=verbose)
        if not paths:
            raise SystemExit('No training data found')
        imgs = data.load_images_uint8(paths, img_size, verbose=verbose)

    tr, va = metrics.train_test_split_stratified(len(imgs), labels,
                                                 0.15, seed=42)
    train_data = {'img': imgs[tr], 'label': labels[tr]}
    val_data = {'img': imgs[va], 'label': labels[va]}

    # torchvision-style augmentation: a FRESH random draw each epoch from
    # the originals (reference train_image_model.py:135-148 applies the
    # transforms on the fly per epoch; a single fixed draw would train
    # 30 epochs on one static set and never on the clean images)
    epoch_transform = None
    if augment:
        def epoch_transform(epoch, d):
            ep_rng = np.random.RandomState((seed * 9176 + epoch) % 2**32)
            return {'img': data.augment_images_uint8(d['img'], ep_rng),
                    'label': d['label']}
    log(f'Training set: {len(tr)}  validation set: {len(va)}')

    if remat:
        # activation rematerialization (jax.checkpoint per block): the
        # backward recomputes block activations instead of holding all
        # of them in HBM — combine with --grad-accum for large
        # effective batches at high resolution
        log('rematerialization: block activations recomputed in the '
            'backward pass (jax.checkpoint)')
    if arch == 'mobilenet_v2':
        # the README-advertised variant (reference README.md:13); ~13x
        # fewer FLOPs/image than ResNet50 — the fast image path
        from mec_tpu.models.mobilenet import MobileNetV2EmotionModel
        model = MobileNetV2EmotionModel(
            dtype=jnp.bfloat16 if bf16 else jnp.float32, remat=remat)
    elif arch == 'resnet50':
        model = ImageEmotionModel(dtype=jnp.bfloat16 if bf16 else jnp.float32,
                                  remat=remat)
    else:
        raise SystemExit(f'unknown --arch {arch}')
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, img_size, img_size, 3),
                                     jnp.float32))
    mesh = make_mesh(data=mesh_data) if mesh_data > 1 else None
    train_step, eval_step = make_steps(model)

    grad_accum = max(1, int(grad_accum))
    if grad_accum > 1:
        # gradient accumulation: K micro-batches average into one AdamW
        # update — an effective batch of batch_size*K without the
        # activation memory (ResNet50 activations dominate HBM here)
        log(f'gradient accumulation: {grad_accum} micro-batches of '
            f'{batch_size} per optimizer update (effective batch '
            f'{batch_size * grad_accum})')

    def accum(tx):
        return (optax.MultiSteps(tx, every_k_schedule=grad_accum)
                if grad_accum > 1 else tx)

    # Phase 1: frozen backbone, head at 10x LR (reference :179-219)
    log('\nPhase 1: training classifier head (backbone frozen)')
    tx1 = accum(make_tx(learning_rate, learning_rate * 10,
                        freeze_backbone=True))
    state = common.TrainState.create(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, tx1)
    state, best_vars, hist1 = common.fit(
        state, train_data, val_data, train_step, eval_step,
        epochs=min(phase1_epochs, epochs), batch_size=batch_size,
        seed=seed, monitor='val_acc', patience=5, mesh=mesh, log_fn=log,
        epoch_transform=epoch_transform)

    # Phase 2: full fine-tune at base LR with cosine annealing (:221-253)
    remaining = max(epochs - phase1_epochs, 0)
    hist2 = {'val_acc': [0.0]}
    if remaining:
        log('\nPhase 2: fine-tuning all layers')
        # the cosine schedule counts OPTIMIZER updates (ceil-counted
        # micro-steps incl. the ragged tail, / grad_accum across the
        # whole phase — see common.optimizer_total_steps)
        steps = common.optimizer_total_steps(len(tr), batch_size,
                                             remaining, grad_accum)
        sched = optax.cosine_decay_schedule(learning_rate, steps)
        # adamw_with_clip injects hyperparams so get_lr logs the live
        # cosine rate instead of 'lr: nan'
        tx2 = accum(common.adamw_with_clip(sched, weight_decay=0.01))
        state = common.TrainState.create(
            {'params': best_vars['params'],
             'batch_stats': best_vars['batch_stats']}, tx2)
        state, best_vars2, hist2 = common.fit(
            state, train_data, val_data, train_step, eval_step,
            epochs=remaining, batch_size=batch_size, seed=seed + 1,
            monitor='val_acc', patience=5, mesh=mesh, log_fn=log,
            epoch_transform=epoch_transform)
        if max(hist2['val_acc']) >= max(hist1['val_acc']):
            best_vars = best_vars2

    padded, n = common.pad_batch(val_data, len(va))
    logits = np.asarray(eval_step(best_vars, padded))[:n]
    preds = logits.argmax(axis=-1)
    log('\n' + metrics.classification_report(labels[va], preds,
                                             Config.EMOTIONS))
    best_acc = max(max(hist1['val_acc']), max(hist2['val_acc']))
    common.record_metrics(f'image_{arch}', best_acc, labels[va], preds)

    models_dir = models_dir or os.path.dirname(Config.IMAGE_MODEL_PATH)
    os.makedirs(models_dir, exist_ok=True)
    out = os.path.join(models_dir, 'image_model.mecp')
    # img_size in the meta routes the SERVING image path (decode, wire,
    # graphs) to the trained resolution — e.g. FER2013-native 48 px
    store.save_params(out, best_vars,
                      meta={'val_acc': float(best_acc), 'arch': arch,
                            'img_size': int(img_size)})
    log(f'Saved {out}')
    return best_vars, {'phase1': hist1, 'phase2': hist2}


def main(argv=None):
    p = argparse.ArgumentParser(description='Train the facial ResNet50')
    p.add_argument('--data-root', required=True)
    p.add_argument('--img-size', type=int, default=224)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--epochs', type=int, default=30)
    p.add_argument('--learning-rate', type=float, default=1e-4)
    p.add_argument('--phase1-epochs', type=int, default=10)
    p.add_argument('--models-dir', default=None)
    p.add_argument('--mesh-data', type=int, default=0)
    p.add_argument('--bf16', action='store_true',
                   help='bfloat16 compute (params stay float32): 3.7x '
                        'step rate on the v5e (13.9 vs 51 ms at batch 32)')
    p.add_argument('--grad-accum', type=int, default=1,
                   help='accumulate gradients over K micro-batches '
                        'before each optimizer update (optax.MultiSteps;'
                        ' effective batch = batch-size * K)')
    p.add_argument('--remat', action='store_true',
                   help='rematerialize block activations in the '
                        'backward pass (jax.checkpoint): O(1)-blocks '
                        'activation memory for ~33%% recompute')
    p.add_argument('--arch', default='resnet50',
                   choices=('resnet50', 'mobilenet_v2'),
                   help='resnet50 = the reference code; mobilenet_v2 = '
                        'the README-advertised fast variant')
    args = p.parse_args(argv)
    train(args.data_root, args.img_size, args.batch_size, args.epochs,
          args.learning_rate, args.phase1_epochs, args.models_dir,
          args.mesh_data, bf16=args.bf16, arch=args.arch,
          grad_accum=args.grad_accum, remat=args.remat)


if __name__ == '__main__':
    main()
