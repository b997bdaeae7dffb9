"""MobileNetV2 image emotion model (the README-advertised image variant).

The reference README describes its image stage as "CNN with MobileNetV2
transfer learning trained on FER2013" (reference README.md:13,299,
README mermaid graph: "Image Model .pt — MobileNetV2") although the
shipped code builds a ResNet50 (reference inference/image_inference.py:48-92).
Both variants exist here: this is a Flax build of the torchvision
MobileNetV2 graph (width 1.0) with the same custom-head pattern the
reference wraps around its ResNet50 — Dropout(.5) -> Linear(1280,512)
-> ReLU -> Dropout(.3) -> Linear(512,7) — so the 512-dim head feature
plugs into the fusion model unchanged (fusion image_dim=512).

TPU-first notes: NHWC layout; depthwise convolutions lower to VPU
elementwise lanes (feature_group_count=C), the 1x1 expand/project convs
are plain MXU matmuls; at ~0.6 GFLOP/image (vs ResNet50's ~8.2) this is
the fast image path, the image-side analogue of the Bi-LSTM text
variant. Converter: mec_tpu.convert.torch_pt (auto-detected from the
state-dict layout); oracle: tests/torch_oracles.py.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision mobilenet_v2 inverted-residual settings (t, c, n, s)
INVERTED_RESIDUAL_CFG: Sequence[Tuple[int, int, int, int]] = (
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


class InvertedResidual(nn.Module):
    """expand(1x1) -> depthwise(3x3, stride) -> project(1x1, linear)."""
    in_ch: int
    out_ch: int
    stride: int
    expand: int
    dtype: jnp.dtype = jnp.float32
    # serve with BN pre-folded into conv kernels+biases
    # (ops/fold.fold_conv_bn); inference-only
    fold_bn: bool = False
    # serve the folded 1x1 expand/project convs as int8 (s8 x s8 -> s32
    # on the MXU; ops/quant.py). The depthwise 3x3 stays in
    # compute_dtype — feature_group_count=C lowers to VPU elementwise
    # lanes, where int8 buys no rate and adds quantize traffic. Implies
    # fold_bn; inference-only. quant_mode as in resnet.Bottleneck.
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
        # depthwise is never quantized (see `quant` above)
        dwconv = partial(nn.Conv, use_bias=self.fold_bn, dtype=self.dtype)
        if self.fold_bn:
            def bn(name):
                return lambda h: h
        else:
            bn = partial(nn.BatchNorm, use_running_average=not train,
                         momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        hidden = self.in_ch * self.expand
        out = x
        if self.expand != 1:
            out = conv(hidden, (1, 1), name='expand_conv')(out)
            out = jax.nn.relu6(bn(name='expand_bn')(out))
        out = dwconv(hidden, (3, 3), strides=(self.stride, self.stride),
                     padding=((1, 1), (1, 1)), feature_group_count=hidden,
                     name='dw_conv')(out)
        out = jax.nn.relu6(bn(name='dw_bn')(out))
        out = conv(self.out_ch, (1, 1), name='project_conv')(out)
        out = bn(name='project_bn')(out)
        if self.stride == 1 and self.in_ch == self.out_ch:
            out = out + x
        return out


class MobileNetV2EmotionModel(nn.Module):
    num_classes: int = 7
    dtype: jnp.dtype = jnp.float32
    # jax.checkpoint per inverted-residual block (see resnet.py)
    remat: bool = False
    # Inference-only: expects ops/fold.fold_conv_bn-transformed params
    # (convs carry biases, no BatchNorm collections); see resnet.py
    fold_bn: bool = False
    # Inference-only, requires fold_bn: the 1x1 expand/project convs and
    # conv_head run as int8 (they carry ~2/3 of the ~0.6 GFLOP and are
    # plain MXU matmuls). conv_stem (3 input channels pad 125/128 of an
    # MXU tile), the depthwise 3x3 stacks (VPU-bound), and the head
    # Dense layers stay in compute_dtype. quant_mode as in resnet.py.
    quant: bool = False
    quant_mode: str = 'dynamic'

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, H, W, 3) ImageNet-normalized NHWC (any H, W >= 32).

        Returns (logits (B, 7), head_features (B, 512)).
        """
        if self.fold_bn and train:
            raise ValueError('fold_bn is inference-only')
        if self.quant and not self.fold_bn:
            raise ValueError('quant requires fold_bn (BN-folded params)')
        conv = partial(nn.Conv, use_bias=self.fold_bn, dtype=self.dtype)
        if self.quant:
            from mec_tpu.models.qconv import QuantConv
            qconv = partial(QuantConv, dtype=self.dtype,
                            mode=self.quant_mode)
        else:
            qconv = conv
        if self.fold_bn:
            def bn(name):
                return lambda h: h
        else:
            bn = partial(nn.BatchNorm, use_running_average=not train,
                         momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                 name='conv_stem')(x)
        x = jax.nn.relu6(bn(name='bn_stem')(x))
        block_cls = (nn.remat(InvertedResidual, static_argnums=(2,))
                     if self.remat else InvertedResidual)
        idx, in_ch = 1, 32
        for t, c, n, s in INVERTED_RESIDUAL_CFG:
            for i in range(n):
                x = block_cls(in_ch, c, s if i == 0 else 1, t,
                              dtype=self.dtype, fold_bn=self.fold_bn,
                              quant=self.quant, quant_mode=self.quant_mode,
                              name=f'block_{idx}')(x, train)
                in_ch = c
                idx += 1
        x = qconv(1280, (1, 1), name='conv_head')(x)
        x = jax.nn.relu6(bn(name='bn_head')(x))
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 1280)
        # custom head, same pattern as the reference's ResNet wrapper
        # (reference image_inference.py:59-65); identity at inference
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(512, dtype=self.dtype, name='fc1')(x)
        feat = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(feat)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name='fc2')(x)
        return logits.astype(jnp.float32), feat.astype(jnp.float32)
