"""Parameter partition rules (tensor parallelism).

Megatron-style sharding for the BERT encoder — the only model here large
enough to warrant TP (110M params; the reference serves it single-GPU,
reference inference/text_inference.py:37):

  * q/k/v projection kernels: column-split (heads) on 'model'
  * attention output kernel: row-split on 'model'  (psum'd by GSPMD)
  * FFN intermediate kernel: column-split on 'model'
  * FFN output kernel: row-split on 'model'        (psum'd by GSPMD)
  * embeddings / LayerNorms / classifier: replicated

The rules are expressed as path-suffix patterns over the flax param tree,
so they apply to any depth (layer_0..layer_11) without enumerating layers.
With mesh model-axis size 1 everything degenerates to replication.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mec_tpu.parallel.mesh import MODEL_AXIS

# (path-substring requirements, leaf-name, PartitionSpec) — first match wins.
# Paths are '/'-joined flax param tree keys, e.g.
# 'params/layer_3/attention_self_query/kernel'.
BertRules = Sequence[Tuple[Tuple[str, ...], str, P]]


def bert_partition_rules() -> BertRules:
    col = P(None, MODEL_AXIS)   # (in, out) kernel, split output dim
    row = P(MODEL_AXIS, None)   # (in, out) kernel, split input dim
    return (
        (('attention_self', 'query'), 'kernel', col),
        (('attention_self', 'key'), 'kernel', col),
        (('attention_self', 'value'), 'kernel', col),
        (('attention_self', 'query'), 'bias', P(MODEL_AXIS)),
        (('attention_self', 'key'), 'bias', P(MODEL_AXIS)),
        (('attention_self', 'value'), 'bias', P(MODEL_AXIS)),
        (('attention_output',), 'kernel', row),
        (('intermediate',), 'kernel', col),
        (('intermediate',), 'bias', P(MODEL_AXIS)),
        (('layer_', 'output'), 'kernel', row),
        # MoE expert bank (models/moe.py): EXPERT parallelism — the
        # leading expert dim shards over 'model'; the router stays
        # replicated (it's (H, E), every rank routes every token)
        (('moe',), 'wi', P(MODEL_AXIS, None, None)),
        (('moe',), 'wo', P(MODEL_AXIS, None, None)),
        (('moe',), 'bi', P(MODEL_AXIS, None)),
        (('moe',), 'bo', P(MODEL_AXIS, None)),
    )


def partition_spec_for(path: Tuple[str, ...], rules: BertRules) -> P:
    joined = '/'.join(path)
    leaf = path[-1]
    for substrings, leaf_name, spec in rules:
        if leaf == leaf_name and all(s in joined for s in substrings):
            return spec
    return P()


def _tree_paths_map(fn, tree: Any) -> Any:
    """tree_map that also passes the string path tuple to fn."""
    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves, treedef = flat

    def path_str(kp):
        out = []
        for k in kp:
            if hasattr(k, 'key'):
                out.append(str(k.key))
            elif hasattr(k, 'idx'):
                out.append(str(k.idx))
            else:
                out.append(str(k))
        return tuple(out)

    new_leaves = [fn(path_str(kp), leaf) for kp, leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def shard_variables(mesh: Mesh, variables: Dict[str, Any],
                    rules: BertRules | None = None) -> Dict[str, Any]:
    """Place a variables pytree on the mesh per the partition rules.

    Shapes that don't divide evenly by the model-axis size fall back to
    replication (checked per-leaf, so a 7-class classifier head never
    blocks sharding the 3072-wide FFN).
    """
    model_size = mesh.shape[MODEL_AXIS]
    rules = rules if rules is not None else bert_partition_rules()

    def place(path, leaf):
        spec = partition_spec_for(path, rules)
        if spec != P() and hasattr(leaf, 'shape'):
            ok = True
            for dim, name in zip(leaf.shape, tuple(spec)):
                if name == MODEL_AXIS and dim % model_size != 0:
                    ok = False
            if not ok:
                spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return _tree_paths_map(place, variables)
