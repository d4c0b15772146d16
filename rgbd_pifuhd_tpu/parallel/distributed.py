"""Multi-host (multi-process) runtime: DCN-spanning data parallelism.

The reference has no distributed backend at all — no torch.distributed,
NCCL, MPI or Gloo anywhere (/root/reference grep; SURVEY.md §2.4) — and the
single-host multi-chip paths here already ride ICI via `Mesh`/`shard_map`.
This module adds the multi-HOST dimension the TPU-native design calls for:
N processes (one per host), each owning its local chips, joined into ONE
global device mesh whose 'data' axis spans hosts, with gradient psums
riding ICI within a host and DCN across hosts — exactly how pods scale.

Design (idiomatic JAX multi-process):
- ``initialize_distributed`` wraps ``jax.distributed.initialize``; after it,
  ``jax.devices()`` is the GLOBAL device list, so the existing
  ``make_device_mesh()`` / ``shard_train_step`` / sharded evaluators work
  unchanged — multi-host is a deployment property, not a code path.
- ``shard_host_batch`` feeds the global batch: every process computes the
  same (seeded) host batch, keeps its process-local slice, and assembles
  the global ``jax.Array`` via ``make_array_from_process_local_data``.
- IO (checkpoints, logs, montages) is gated on ``is_primary()``.

Validated without real hosts: tests/test_multihost.py spawns two localhost
processes x 4 virtual CPU devices (gloo collectives) and asserts that BOTH
a toy linear model AND the real tiny MultiResPIFu — through the same
make_fine_train_step + shard_train_step the drivers jit, with BatchNorm
batch_stats, frozen-netG stop_gradients and multi-collection variables
crossing processes — reproduce the single-process losses on the 8-device
global mesh, and that a grid query whose point axis spans processes
reproduces the single-process volume.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ENV_COORD = "RGBD_COORDINATOR"
_ENV_NPROC = "RGBD_NUM_PROCESSES"
_ENV_PID = "RGBD_PROCESS_ID"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Join the multi-process runtime; no-op for single-process runs.

    Arguments fall back to ``RGBD_COORDINATOR`` / ``RGBD_NUM_PROCESSES`` /
    ``RGBD_PROCESS_ID`` env vars (so launchers can configure workers by
    environment alone).  Returns True when distributed mode was entered.

    Must be called before the backend initializes (i.e. before any device
    computation).  On the CPU backend the cross-process collective
    implementation is set to gloo, which is how the multi-host paths are
    CI-tested on one machine.
    """
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])

    if not coordinator_address or not num_processes or num_processes <= 1:
        return False

    try:  # CPU backend needs an explicit cross-process collectives impl
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — config absent on older jaxlibs
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_primary() -> bool:
    """True on the process that owns checkpoint/log/montage IO."""
    return jax.process_index() == 0


def shard_host_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Assemble a global batch from each process's slice of a host batch.

    Every process passes the SAME (deterministically seeded) host batch;
    this keeps rows ``[pid*B/P, (pid+1)*B/P)`` locally and returns global
    ``jax.Array``s sharded on the leading axis over ``mesh``'s data axis.
    Single-process (the common case) returns ``batch`` untouched, so
    drivers call it unconditionally.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return batch
    sharding = NamedSharding(mesh, P(axis))
    pid = jax.process_index()
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        B = v.shape[0]
        if B % nproc:
            raise ValueError(
                f"global batch axis {B} of {k!r} is not divisible by "
                f"{nproc} processes")
        per = B // nproc
        local = v[pid * per:(pid + 1) * per]
        out[k] = jax.make_array_from_process_local_data(
            sharding, local, v.shape)
    return out
