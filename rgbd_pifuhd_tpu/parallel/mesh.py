"""Device-mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(shape: Sequence[int] = (-1,),
                     axis_names: Sequence[str] = ("data",),
                     devices=None) -> Mesh:
    """Build a Mesh; -1 in ``shape`` absorbs all remaining devices.

    Default: a 1D ('data',) mesh over every visible device.  On a single
    v5e-8 host the axis rides ICI; multi-host extensions would add a 'dcn'
    outer axis here.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    known = int(np.prod([s for s in shape if s > 0])) or 1
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis))
