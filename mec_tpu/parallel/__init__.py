"""Device-mesh parallelism layer.

The reference has no distributed anything (SURVEY.md §2.3 — gunicorn forks
share-nothing Flask workers, reference gunicorn_config.py:16-18). The
TPU-native replacement is a single process owning the chip(s) and a
`jax.sharding.Mesh`; scaling out is a config change, not a rewrite:

  * axis 'data'  — batch data parallelism (requests / training batches)
  * axis 'model' — tensor parallelism for the BERT encoder (Megatron-style
    column/row-split FFN + per-head attention splits); a no-op at size 1
  * axis 'pipe'  — GPipe pipeline parallelism for the BERT encoder
    (parallel/pipeline.py: shard_map + ppermute microbatch schedule)

GSPMD inserts the ICI collectives for 'data'/'model'; the pipeline's
stage-to-stage sends are explicit ppermutes. Nothing here speaks
NCCL/MPI. Sequence parallelism and expert parallelism are deliberately
absent: the longest sequence is 128 tokens (attention is ~3% of BERT
step time at that length) and no model in the inventory is MoE.
"""

from mec_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    local_mesh_shape,
)
from mec_tpu.parallel.distributed import initialize_multi_host
from mec_tpu.parallel.partition import (
    bert_partition_rules,
    partition_spec_for,
    shard_variables,
)
from mec_tpu.parallel.pipeline import (
    bert_pipeline_forward,
    pipeline_encoder,
    stack_layer_params,
    unstack_layer_params,
)

__all__ = [
    'make_mesh', 'batch_sharding', 'replicated', 'shard_batch',
    'local_mesh_shape', 'bert_partition_rules', 'partition_spec_for',
    'shard_variables', 'initialize_multi_host', 'bert_pipeline_forward',
    'pipeline_encoder', 'stack_layer_params', 'unstack_layer_params',
]
