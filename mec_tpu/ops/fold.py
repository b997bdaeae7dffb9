"""Conv+BatchNorm folding for the serving image path.

At inference BatchNorm is an affine per-channel transform of the conv
output (reference eval-mode semantics, reference
inference/image_inference.py:48-92):

    y = gamma * (conv(x) - mean) / sqrt(var + eps) + beta
      = conv'(x) + b'     with  K' = K * s,  b' = beta - mean * s,
                                s  = gamma / sqrt(var + eps)

so in bf16 serving mode the engine folds every (conv, bn) pair into the
conv kernel + a bias at artifact load — the image-path analogue of the
speech DNN's Dense+BN fold (ops/pallas_kernels.fold_batchnorm) — and
serves the model with ``fold_bn=True`` (BatchNorm layers elided). This
removes all BN elementwise traffic from every image forward; fp32
parity mode keeps live batch_stats so logits match the reference math
exactly.

Pairing is by the models' naming convention: a conv param named
``*conv*`` folds with the sibling whose name is ``name.replace('conv',
'bn')`` — covering ResNet50 (conv1/bn1..., downsample_conv/
downsample_bn; models/resnet.py) and MobileNetV2 (conv_stem/bn_stem,
expand/dw/project pairs, conv_head/bn_head; models/mobilenet.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

BN_EPS = 1e-5  # both image models (torchvision BatchNorm2d default)


def _fold_node(params_node: Dict, stats_node: Dict) -> Tuple[Dict, int]:
    """Fold one module-level dict; recurses into submodules."""
    out = {}
    n_folded = 0
    bn_names = set()
    for name in params_node:
        if 'conv' in name and name.replace('conv', 'bn') in params_node:
            bn_names.add(name.replace('conv', 'bn'))
    for name, val in params_node.items():
        if name in bn_names:
            continue  # consumed by its conv
        bn_name = name.replace('conv', 'bn')
        if 'conv' in name and bn_name in bn_names:
            extra = set(val) - {'kernel', 'bias'}
            if extra:  # a key the fold would silently drop -> refuse,
                # the engine falls back to live batch_stats
                raise ValueError(f'fold_conv_bn: conv {name!r} has '
                                 f'unexpected params {sorted(extra)}')
            K = np.asarray(val['kernel'], np.float32)
            bn_p, bn_s = params_node[bn_name], stats_node[bn_name]
            s = (np.asarray(bn_p['scale'], np.float32)
                 / np.sqrt(np.asarray(bn_s['var'], np.float32) + BN_EPS))
            # y = (conv(x) + b0 - mean) * s + beta: a conv's own bias
            # (use_bias convs in converted artifacts) folds as (b0-mean)*s
            b0 = (np.asarray(val['bias'], np.float32)
                  if 'bias' in val else 0.0)
            out[name] = {
                # HWIO: output channel last for both plain and depthwise
                'kernel': K * s,
                'bias': (np.asarray(bn_p['bias'], np.float32)
                         + (b0 - np.asarray(bn_s['mean'], np.float32)) * s),
            }
            n_folded += 1
        elif isinstance(val, dict) and 'kernel' not in val \
                and 'embedding' not in val:
            sub, n = _fold_node(val, stats_node.get(name, {}))
            out[name] = sub
            n_folded += n
        else:
            out[name] = val
    return out, n_folded


def fold_conv_bn(variables: Dict) -> Dict:
    """{'params', 'batch_stats'} -> {'params'} with every (conv, bn)
    pair folded; raises if nothing folded (wrong tree) or if any
    batch_stats entry was left unconsumed (a bn the fold missed would
    silently change the graph)."""
    params = variables['params']
    stats = variables.get('batch_stats', {})
    folded, n = _fold_node(params, stats)
    if n == 0:
        raise ValueError('fold_conv_bn: no (conv, bn) pairs found')
    import jax
    n_stats = len(jax.tree_util.tree_leaves(stats))
    # every bn contributes mean+var
    if n_stats != 2 * n:
        raise ValueError(f'fold_conv_bn: folded {n} pairs but batch_stats '
                         f'has {n_stats} leaves (expected {2 * n})')
    return {'params': folded}
