"""Int8 post-training quantization for the serving image path.

The v5e MXU runs s8 x s8 -> s32 contractions at 2x the bf16 rate (394
int8 TOPS vs 197 bf16 TFLOP/s; measured 1.6-1.7x on ResNet50-shaped
3x3 convs *including* the requantization elementwise,
examples/probe_int8.py). The image stage dominates the fused tri-modal
serving step and is MXU-bound at batch >= 32 (BASELINE.md), so int8 is
the compute-reduction lever batching alone could not provide.

Scheme (standard PTQ, chosen for batch-invariance and zero calibration
data):

- **Weights**: symmetric per-output-channel int8, quantized once at
  artifact load from the BN-folded conv kernels (ops/fold.fold_conv_bn
  runs first; quantization consumes its ``{'kernel', 'bias'}`` pairs).
  ``kernel_q = round(K / s_c)`` with ``s_c = max|K[..., c]| / 127``.
- **Activations**: symmetric per-example int8, computed on device at
  each conv (max-abs over H, W, C). Per-EXAMPLE — not per-batch — so a
  request's logits do not depend on what else shares its serving
  bucket (the batch-of-N == N x batch-of-1 contract,
  tests/test_quant.py).
- **Dequant**: the s32 conv output is scaled by the rank-1 outer
  product ``s_x[b] * s_c[c]`` and the folded bias is added — an
  elementwise epilogue XLA fuses into the conv output write.

Kept in higher precision (negligible FLOPs, disproportionate error
risk): the stem conv (3 input channels pad 125/128 of an MXU tile —
int8 buys nothing) and the head Dense layers. The fp32 parity mode
never quantizes (reference eval-mode semantics exactly, reference
inference/image_inference.py:48-92).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# top-level modules never quantized: the stem conv (ResNet50 'conv1' /
# MobileNetV2 'conv_stem' — 3 input channels pad 125/128 of an MXU
# tile) and the classifier head. Nested bottleneck convs
# (layer*_*/conv1 etc.) are matched by the recursion, not these names.
_SKIP_TOP = ('conv1', 'conv_stem', 'fc1', 'fc2')


def quantize_conv(node: Dict) -> Dict:
    """One biased kernel node ``{'kernel': f32 [..., c], 'bias': f32[c]}``
    -> ``{'kernel_q': s8, 'kernel_scale': f32[c], 'bias': f32[c]}``.
    Works for HWIO convs and (in, out) dense kernels alike (the scale is
    per output channel = per last axis)."""
    K = np.asarray(node['kernel'], np.float32)
    s = np.abs(K).reshape(-1, K.shape[-1]).max(axis=0) / 127.0
    s = np.maximum(s, 1e-12)  # all-zero channel: quantizes to zeros
    kq = np.clip(np.round(K / s), -127, 127).astype(np.int8)
    return {'kernel_q': kq, 'kernel_scale': s.astype(np.float32),
            'bias': np.asarray(node['bias'], np.float32)}


def _is_folded_conv(name: str, val) -> bool:
    if not ('conv' in name and isinstance(val, dict) and 'kernel' in val
            and 'bias' in val and np.ndim(val['kernel']) == 4):
        return False
    # depthwise convs (HWIO in-per-group == 1, e.g. MobileNetV2
    # block_*/dw_conv) stay in compute_dtype: feature_group_count=C
    # lowers to VPU elementwise lanes where int8 has no rate advantage
    return np.shape(val['kernel'])[-2] != 1


def _quantize_node(node: Dict, top: bool) -> Dict:
    out = {}
    for name, val in node.items():
        if top and name in _SKIP_TOP:
            out[name] = val
        elif _is_folded_conv(name, val):
            out[name] = quantize_conv(val)
        elif isinstance(val, dict) and 'kernel' not in val \
                and 'embedding' not in val:
            out[name] = _quantize_node(val, top=False)
        else:
            out[name] = val
    return out


def quantize_image_params(variables: Dict) -> Dict:
    """BN-folded ``{'params': ...}`` -> int8-quantized params tree.

    Raises if the tree carries live batch_stats (fold first) or if no
    conv was quantized (wrong tree)."""
    if variables.get('batch_stats'):
        raise ValueError('quantize_image_params expects a BN-folded tree '
                         '(run ops/fold.fold_conv_bn first)')
    params = _quantize_node(variables['params'], top=True)
    import jax
    n_q = sum(1 for p in jax.tree_util.tree_leaves_with_path(params)
              if p[0][-1].key == 'kernel_q')
    if n_q == 0:
        raise ValueError('quantize_image_params: no folded convs found')
    return {'params': params}


# The six per-layer encoder matmuls carry ~97% of a bert-base forward's
# FLOPs; embeddings, LayerNorms, the attention score/context matmuls
# (small, softmax-sensitive), the pooler, and the classifier stay in
# compute_dtype. MoE layers ('moe' replaces intermediate/output,
# models/moe.py) keep their expert banks unquantized — only their
# attention matmuls quantize.
_BERT_ATTN_DENSE = ('query', 'key', 'value')
_BERT_LAYER_DENSE = ('attention_output', 'intermediate', 'output')


def quantize_bert_params(variables: Dict) -> Dict:
    """BERT params -> encoder Dense layers quantized to int8
    (models/qconv.QuantDense consumes them; per-token dynamic
    activation scales keep serve == eval per request)."""
    params = dict(variables['params'])
    n_q = 0
    for lname, lval in params.items():
        if not lname.startswith('layer_'):
            continue
        new = {}
        for name, val in lval.items():
            if name in _BERT_LAYER_DENSE and 'kernel' in val:
                new[name] = quantize_conv(val)
                n_q += 1
            elif name == 'attention_self':
                new[name] = {
                    k: (quantize_conv(v) if k in _BERT_ATTN_DENSE else v)
                    for k, v in val.items()}
                n_q += len(_BERT_ATTN_DENSE)
            else:
                new[name] = val
        params[lname] = new
    if n_q == 0:
        raise ValueError('quantize_bert_params: no encoder layers found')
    return dict(variables, params=params)


# incremented by every calibrate_static_scales run (each one compiles a
# dynamic-mode graph — ~minutes through the axon tunnel on a fresh
# compile cache); tests assert it stays flat when scales come from the
# artifact cache (extract/insert_static_scales)
CALIBRATION_RUNS = 0


def calibrate_static_scales(model_dynamic, variables, apply_args,
                            margin: float = 1.25) -> Dict:
    """Static-PTQ calibration: one forward of the DYNAMIC-mode model on
    representative inputs (each QuantConv/QuantDense sows its observed
    activation max-abs), then every quantized layer gets a scalar
    ``act_scale`` param = ``margin * amax / 127``. The static-mode model
    (quant_mode='static') consumes the returned tree; activations beyond
    margin saturate at +-127. margin trades clipping risk against
    resolution — 1.25 keeps full int8 resolution for anything within
    25% of the calibration range."""
    import jax

    global CALIBRATION_RUNS
    CALIBRATION_RUNS += 1

    @jax.jit
    def _run(v, *a):
        return model_dynamic.apply(v, *a, mutable=['intermediates'])

    _, state = _run(variables, *apply_args)
    inter = jax.device_get(state['intermediates'])

    def insert(pnode, inode):
        new = {}
        for k, v in pnode.items():
            iv = inode.get(k, {}) if isinstance(inode, dict) else {}
            if isinstance(v, dict) and 'kernel_q' in v:
                amax = iv.get('act_amax')
                if amax is None:
                    raise ValueError(f'no calibration trace for {k}')
                a = max(float(np.max(np.asarray(t))) for t in amax)
                new[k] = dict(v, act_scale=np.float32(
                    max(a * margin, 1e-8) / 127.0))
            elif isinstance(v, dict):
                new[k] = insert(v, iv)
            else:
                new[k] = v
        return new

    return dict(variables, params=insert(variables['params'], inter))


def extract_static_scales(calibrated: Dict) -> Dict[str, float]:
    """Calibrated params tree -> flat ``{'a/b/c': act_scale}`` dict —
    the tiny artifact-cacheable product of calibrate_static_scales (the
    expensive part is its dynamic-mode compile, ~minutes through the
    tunnel on a fresh compile cache; serving/engine.py persists these
    into the .mecp meta so later engine builds skip it entirely)."""
    out: Dict[str, float] = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict) and 'act_scale' in v:
                out[prefix + k] = float(np.asarray(v['act_scale']))
            elif isinstance(v, dict):
                walk(v, prefix + k + '/')
    walk(calibrated['params'], '')
    if not out:
        raise ValueError('no act_scale params found (not a static-'
                         'calibrated tree)')
    return out


def insert_static_scales(variables: Dict, scales: Dict[str, float]) -> Dict:
    """Inverse of extract_static_scales: place cached ``act_scale``
    scalars next to every quantized (``kernel_q``) node of an
    int8-quantized params tree. Raises if any quantized layer has no
    cached scale (layer-set drift => the cache is stale; recalibrate)."""
    missing = []

    def walk(node, prefix):
        new = {}
        for k, v in node.items():
            if isinstance(v, dict) and 'kernel_q' in v:
                s = scales.get(prefix + k)
                if s is None:
                    missing.append(prefix + k)
                    new[k] = v
                else:
                    new[k] = dict(v, act_scale=np.float32(s))
            elif isinstance(v, dict):
                new[k] = walk(v, prefix + k + '/')
            else:
                new[k] = v
        return new

    params = walk(variables['params'], '')
    if missing:
        raise ValueError(f'cached scales missing for {missing[:3]}'
                         f'{"..." if len(missing) > 3 else ""}')
    return dict(variables, params=params)
