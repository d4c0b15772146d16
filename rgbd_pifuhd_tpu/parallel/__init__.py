"""Parallelism over the TPU device mesh (SURVEY.md section 2.4).

The reference has NO working multi-device path (its nn.DataParallel branch
is never enabled, net_util.py:38-43); this layer is new, TPU-native design:

- mesh.py        — jax.sharding.Mesh construction and sharding helpers
- evaluator.py   — grid-query point-axis sharding (the framework's
  "sequence parallelism": the 512^3 lattice's flattened point dimension is
  the scale-out axis, SURVEY.md sections 2.4/5)
- distributed.py — multi-HOST runtime (jax.distributed + per-process batch
  assembly): the 'data' axis spans DCN across hosts, ICI within
- Data parallelism for training lives in train/trainers.py via sharding
  annotations on the jitted train step (XLA inserts the psum over ICI).

Tensor/pipeline/expert parallelism are intentionally absent: the models are
MB-scale (no TP benefit), the coarse->fine stage split is latency-bound per
subject (no PP benefit), and there is no MoE (no EP) — documented for the
parity audit.
"""

from .mesh import make_device_mesh, replicate, shard_batch
from .evaluator import shard_arg_axis, shard_points_query
from .distributed import (
    initialize_distributed,
    is_primary,
    shard_host_batch,
)
