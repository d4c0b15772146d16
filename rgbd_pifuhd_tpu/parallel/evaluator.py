"""Sharded grid-query evaluation — the framework's sequence parallelism.

The reference streams the 512^3 lattice through host-side 5k-point chunks
(/root/reference/mesh_util.py:98-114); the scale-out axis of this workload
is the flattened query-point dimension.  Here a query function
``(points [M, 3], *args) -> occ [M]`` is wrapped with ``shard_map`` so each
device evaluates M/n_devices points against replicated model state; results
are all-gathered back along the same axis (out_specs), riding ICI.

Composes directly with recon.grid's evaluators: pass the wrapped function
as their ``query_fn`` and every phase (coarse lattice + refinement chunks)
is automatically sharded.

Note: when the per-point MLP uses GroupNorm over the point axis (the
reference's mlp_norm='group' quirk — normalization couples points within a
chunk, MLP.py:37-41), sharding changes the normalization population per
device, exactly as the reference's own chunking does between its 5k-point
batches.  Numerically stable in practice; exact-match tests use
mlp_norm='none'.
"""

from __future__ import annotations

from typing import Callable

from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def shard_arg_axis(fn: Callable, mesh: Mesh, arg_index: int, dim: int = 0,
                   axis: str = "data") -> Callable:
    """Wrap ``fn`` to shard ONE positional argument's dimension ``dim``
    over ``mesh``, replicating everything else; the output is gathered
    along the same axis position.

    This is the one primitive behind all point-axis parallelism here:
    ``shard_points_query`` is ``shard_arg_axis(q, mesh, 0)``; the
    Reconstructor's vertex-coloring passes shard their [K, chunk, 3]
    quantized-vertex tensors with ``dim=1`` (the chunk axis), keeping the
    ``lax.map`` over K groups intact per shard.  Requires the sharded
    dimension's size % mesh.shape[axis] == 0 (all chunk sizes here are
    powers of two).
    """
    spec = P(*([None] * dim + [axis]))

    def wrapped(*args):
        in_specs = tuple(spec if i == arg_index else P()
                         for i in range(len(args)))
        f = shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=spec,
                      check_vma=False)
        return f(*args)

    return wrapped


def shard_points_query(query_fn: Callable, mesh: Mesh,
                       axis: str = "data") -> Callable:
    """Wrap ``query_fn`` to shard its leading point axis over ``mesh``.

    The wrapped function requires M % mesh.shape[axis] == 0 (grid.py's
    chunk sizes are powers of two, so any power-of-two device count works).
    """
    return shard_arg_axis(query_fn, mesh, 0, dim=0, axis=axis)
