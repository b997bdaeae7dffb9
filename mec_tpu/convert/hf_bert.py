"""HuggingFace BERT save_pretrained dir -> flax params for
mec_tpu.models.bert.BertForSequenceClassification.

The reference saves its fine-tuned model with save_pretrained
(reference model_training/train_text_model.py:217-223) and loads it with
BertForSequenceClassification.from_pretrained
(reference inference/text_inference.py:40-43). This converter reads the
torch weights (pytorch_model.bin or model.safetensors) plus config.json.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np


def _read_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    st_path = os.path.join(model_dir, 'model.safetensors')
    bin_path = os.path.join(model_dir, 'pytorch_model.bin')
    if os.path.exists(st_path):
        from safetensors import safe_open
        sd = {}
        with safe_open(st_path, framework='np') as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    import torch
    obj = torch.load(bin_path, map_location='cpu', weights_only=False)
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def read_config(model_dir: str) -> Dict[str, Any]:
    with open(os.path.join(model_dir, 'config.json')) as f:
        return json.load(f)


def model_kwargs_from_config(cfg: Dict[str, Any]) -> Dict[str, int]:
    return dict(
        vocab_size=cfg.get('vocab_size', 30522),
        hidden_size=cfg.get('hidden_size', 768),
        num_layers=cfg.get('num_hidden_layers', 12),
        num_heads=cfg.get('num_attention_heads', 12),
        intermediate_size=cfg.get('intermediate_size', 3072),
        max_position=cfg.get('max_position_embeddings', 512),
        type_vocab_size=cfg.get('type_vocab_size', 2),
        num_classes=cfg.get('num_labels',
                            len(cfg.get('id2label', {})) or 7),
        # MoE extension (models/moe.py): absent/0 in every HF config,
        # present when the artifact was trained with --experts
        **({'num_experts': cfg['num_experts'],
            'moe_capacity_factor': cfg.get('moe_capacity_factor', 1.25)}
           if cfg.get('num_experts') else {}),
    )


def convert_bert_dir(model_dir: str) -> Dict[str, Any]:
    sd = _read_state_dict(model_dir)

    def g(key):
        # BertForSequenceClassification exports prefix encoder keys with
        # "bert."; bare BertModel exports do not — accept both
        if key in sd:
            return np.asarray(sd[key])
        if key.startswith('bert.') and key[5:] in sd:
            return np.asarray(sd[key[5:]])
        return np.asarray(sd[key])  # raise the original KeyError

    def lin(prefix):
        return {'kernel': g(f'{prefix}.weight').T, 'bias': g(f'{prefix}.bias')}

    def ln(prefix):
        return {'scale': g(f'{prefix}.weight'), 'bias': g(f'{prefix}.bias')}

    cfg = read_config(model_dir) if os.path.exists(
        os.path.join(model_dir, 'config.json')) else {}
    n_layers = cfg.get('num_hidden_layers', 12)

    params: Dict[str, Any] = {
        'word_embeddings': {'embedding': g('bert.embeddings.word_embeddings.weight')},
        'position_embeddings': {'embedding': g('bert.embeddings.position_embeddings.weight')},
        'token_type_embeddings': {'embedding': g('bert.embeddings.token_type_embeddings.weight')},
        'embeddings_norm': ln('bert.embeddings.LayerNorm'),
        'pooler': lin('bert.pooler.dense'),
        'classifier': lin('classifier'),
    }
    for i in range(n_layers):
        t = f'bert.encoder.layer.{i}'
        params[f'layer_{i}'] = {
            'attention_self': {
                'query': lin(f'{t}.attention.self.query'),
                'key': lin(f'{t}.attention.self.key'),
                'value': lin(f'{t}.attention.self.value'),
            },
            'attention_output': lin(f'{t}.attention.output.dense'),
            'attention_norm': ln(f'{t}.attention.output.LayerNorm'),
            'intermediate': lin(f'{t}.intermediate.dense'),
            'output': lin(f'{t}.output.dense'),
            'output_norm': ln(f'{t}.output.LayerNorm'),
        }
    return {'params': params}
