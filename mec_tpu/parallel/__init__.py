"""Device-mesh parallelism layer.

The reference has no distributed anything (SURVEY.md §2.3 — gunicorn forks
share-nothing Flask workers, reference gunicorn_config.py:16-18). The
TPU-native replacement is a single process owning the chip(s) and a
`jax.sharding.Mesh`; scaling out is a config change, not a rewrite:

  * axis 'data'  — batch data parallelism (requests / training batches)
  * axis 'model' — tensor parallelism for the BERT encoder (Megatron-style
    column/row-split FFN + per-head attention splits); a no-op at size 1

GSPMD inserts the ICI collectives; nothing here speaks NCCL/MPI.
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

__all__ = [
    'make_mesh', 'batch_sharding', 'replicated', 'shard_batch',
    'local_mesh_shape', 'bert_partition_rules', 'partition_spec_for',
    'shard_variables', 'initialize_multi_host',
]
