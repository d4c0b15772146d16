"""Child worker for tests/test_multihost.py (NOT collected by pytest).

Joins a 2-process jax.distributed runtime (gloo over localhost), each
process contributing 4 virtual CPU devices, then runs 5 data-parallel
training steps through the framework's own shard_train_step +
shard_host_batch over the 8-device global mesh.  The primary process
writes the per-step losses for the parent test to compare against a
single-process run.

Usage: python multihost_child.py <port> <process_id> <out.npy>
"""

import os
import sys


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax
    jax.config.update("jax_platforms", "cpu")

    from rgbd_pifuhd_tpu.parallel import (
        initialize_distributed,
        is_primary,
        make_device_mesh,
        shard_host_batch,
    )

    assert initialize_distributed(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import numpy as np
    import jax.numpy as jnp
    import optax

    from rgbd_pifuhd_tpu.train.trainers import shard_train_step

    mesh = make_device_mesh()
    assert mesh.devices.size == 8

    tx = optax.sgd(0.1)

    def step_fn(w, opt_state, batch):
        def loss_fn(p):
            return jnp.mean((batch["x"] @ p - batch["y"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        upd, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(w, upd), opt_state, {"loss": loss}

    step = shard_train_step(step_fn, mesh)

    rng = np.random.default_rng(0)
    w_true = rng.standard_normal((4, 2)).astype(np.float32)
    w = jnp.zeros((4, 2), jnp.float32)
    opt_state = tx.init(w)
    losses = []
    for _ in range(5):
        # every process derives the same global batch (same seed) and
        # shard_host_batch keeps only this process's rows
        x = rng.standard_normal((16, 4)).astype(np.float32)
        gb = {"x": x, "y": x @ w_true}
        batch = shard_host_batch(mesh, gb)
        w, opt_state, m = step(w, opt_state, batch)
        losses.append(float(m["loss"]))

    if is_primary():
        np.save(out_path, np.asarray(losses, np.float64))


if __name__ == "__main__":
    main()
