"""ResNet50 image emotion model.

Flax reimplementation of the torchvision ResNet50 v1 graph with the
reference's custom head (reference inference/image_inference.py:48-92,
model_training/train_image_model.py:48-67):

    base: conv7x7/2 -> BN -> ReLU -> maxpool3/2 -> [3,4,6,3] bottlenecks
    head: Dropout(0.5) -> Linear(2048,512) -> ReLU -> Dropout(0.3)
          -> Linear(512, 7)

TPU-first choices: NHWC layout (the native TPU conv layout; the torch->flax
converter transposes OIHW->HWIO), fused BN at inference via flax BatchNorm
running stats, batched jitted forward. The forward returns both logits and
the 512-dim post-ReLU head feature so fusion feature extraction shares the
single forward pass (the reference runs the backbone twice,
reference image_inference.py:131-146).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4, stride on the 3x3 conv)."""
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    # serve with BN pre-folded into conv kernels+biases
    # (ops/fold.fold_conv_bn); inference-only
    fold_bn: bool = False
    # serve the folded convs as int8 (s8 x s8 -> s32 on the MXU at
    # ~1.7x the bf16 rate; ops/quant.py). Implies fold_bn;
    # inference-only. quant_mode: 'dynamic' (per-example scales) or
    # 'static' (calibrated act_scale params) — see models/qconv.py.
    quant: bool = False
    quant_mode: str = 'dynamic'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # `train` is positional (not keyword-only) so nn.remat's
        # static_argnums can reach it
        if self.quant:
            from mec_tpu.models.qconv import QuantConv
            conv = partial(QuantConv, dtype=self.dtype,
                           mode=self.quant_mode)
        else:
            conv = partial(nn.Conv, use_bias=self.fold_bn, dtype=self.dtype)
        if self.fold_bn:
            def bn(name):
                return lambda h: h
        else:
            bn = partial(nn.BatchNorm, use_running_average=not train,
                         momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        identity = x
        out = conv(self.features, (1, 1), name='conv1')(x)
        out = bn(name='bn1')(out)
        out = nn.relu(out)
        out = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                   padding=((1, 1), (1, 1)), name='conv2')(out)
        out = bn(name='bn2')(out)
        out = nn.relu(out)
        out = conv(self.features * 4, (1, 1), name='conv3')(out)
        out = bn(name='bn3')(out)
        if self.downsample:
            identity = conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            name='downsample_conv')(x)
            identity = bn(name='downsample_bn')(identity)
        return nn.relu(out + identity)


class ImageEmotionModel(nn.Module):
    num_classes: int = 7
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32
    # Rematerialization (jax.checkpoint per bottleneck block): the
    # backward recomputes block activations instead of holding all 16
    # of them in HBM — the standard large-batch/high-res training lever.
    # Param/batch_stats structure is unchanged (converters key on
    # layer{s}_{b} names); train-time only in effect.
    remat: bool = False
    # Inference-only: expects ops/fold.fold_conv_bn-transformed params
    # (convs carry biases, no BatchNorm collections). bf16 serving mode
    # uses this — BN elementwise traffic is off the image hot path.
    fold_bn: bool = False
    # Inference-only, requires fold_bn: bottleneck convs run as
    # dynamically-quantized int8 (ops/quant.quantize_image_params
    # params; models/qconv.QuantConv). The stem conv and head Dense
    # layers stay in compute_dtype (3 input channels pad 125/128 of an
    # MXU tile / negligible FLOPs). quant_mode as in Bottleneck.
    quant: bool = False
    quant_mode: str = 'dynamic'

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, 224, 224, 3) normalized NHWC.

        Returns (logits (B, 7), head_features (B, 512)).
        """
        if self.fold_bn and train:
            raise ValueError('fold_bn is inference-only')
        if self.quant and not self.fold_bn:
            raise ValueError('quant requires fold_bn (BN-folded params)')
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=self.fold_bn, dtype=self.dtype, name='conv1')(x)
        if not self.fold_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # static_argnums=(2,) marks the `train` bool static for
        # jax.checkpoint (in the lifted core_fn, arg 0 is the module
        # scope and arg 1 is x)
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = block_cls(features, stride=stride,
                              downsample=(block == 0), dtype=self.dtype,
                              fold_bn=self.fold_bn, quant=self.quant,
                              quant_mode=self.quant_mode,
                              name=f'layer{stage + 1}_{block}')(x, train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        # custom head (reference image_inference.py:59-65); dropouts are
        # identity at inference
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(512, dtype=self.dtype, name='fc1')(x)
        feat = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(feat)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name='fc2')(x)
        return logits.astype(jnp.float32), feat.astype(jnp.float32)
