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
from jax import lax


def _stem_conv_s2d(x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray | None, dtype) -> jnp.ndarray:
    """The 7x7/2 stem conv as a 2x2 space-to-depth + 4x4/1 conv.

    Exact algebraic rewrite (same MACs, regrouped): the standard stem
    contracts only 3 input channels — 3/128 of an MXU lane tile — and
    chain-measured ~0.6-0.7 ms of the 1.0 ms stem+pool at batch 64
    (examples/profile_image_stages.py). Space-to-depth packs 2x2x3=12
    input channels, 4x better lane use, same bytes.

    Derivation: y[p,q] = sum_{i,j=0..6} W[i,j] x[2p+i-3, 2q+j-3].
    Front-pad the kernel to 8 taps (W'[0]=0, W'[i]=W[i-1]) so the
    window [2p-4, 2p+3] aligns to 2-blocks [p-2, p+1]; with
    X2[m] = (x[2m], x[2m+1]) channel-stacked this is a 4x4 stride-1
    conv with pad (2,1). Requires even H, W (caller guards)."""
    B, H, W, C = x.shape
    k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, O)
    O = kernel.shape[-1]
    v = k.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5) \
         .reshape(4, 4, 4 * C, O)
    x2 = x.reshape(B, H // 2, 2, W // 2, 2, C) \
          .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
    dn = lax.conv_dimension_numbers(x2.shape, v.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))
    y = lax.conv_general_dilated(
        x2.astype(dtype), v.astype(dtype), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class _StemS2D(nn.Module):
    """Drop-in stem conv via _stem_conv_s2d: declares the exact
    ``kernel``/``bias`` params of the folded ``nn.Conv`` stem (the
    artifact tree loads unchanged)."""
    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,))
        return _stem_conv_s2d(x, kernel, bias, self.dtype)


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
    # Inference-only, requires fold_bn: run the stem conv via the
    # space-to-depth rewrite (_stem_conv_s2d; exact same math, 4x MXU
    # lane use). Param tree unchanged — the (7,7,3,64) kernel is
    # transformed inside the graph (37k floats, free at trace time).
    stem_s2d: bool = False

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
        if self.stem_s2d and self.fold_bn \
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # same param names/shapes as the nn.Conv branch, so the
            # folded artifact tree loads unchanged
            x = _StemS2D(dtype=self.dtype, name='conv1')(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)),
                        use_bias=self.fold_bn, dtype=self.dtype,
                        name='conv1')(x)
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
