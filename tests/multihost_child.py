"""Child worker for tests/test_multihost.py (NOT collected by pytest).

Joins a 2-process jax.distributed runtime (gloo over localhost), each
process contributing 4 virtual CPU devices, then over the 8-device GLOBAL
mesh runs:

1. 5 data-parallel steps of a toy linear model (plumbing sanity:
   initialize_distributed / shard_host_batch / cross-process psum);
2. 3 data-parallel steps of the REAL model — the tiny flagship-shaped
   MultiResPIFu (__graft_entry__._configs(tiny=True) with norm='batch')
   through the SAME make_fine_train_step + shard_train_step the
   single-host drivers jit: BatchNorm batch_stats mutation, the frozen
   netG stop_gradients and the multi-collection variables dict all cross
   the process boundary;
3. one multi-host sharded grid query: eval_grid_two_phase with
   shard_points_query over the global mesh, i.e. the reconstruction
   point axis spans processes.

The primary process writes per-step losses and the query volume for the
parent test to compare against a single-process run.

Usage: python multihost_child.py <port> <process_id> <out.npz>
"""

import os
import sys


def build_model_and_batch():
    """Tiny flagship-shaped model + deterministic batch (shared with the
    parent's single-process reference run).  norm='batch' so the train
    step exercises the mutable batch_stats path."""
    import dataclasses

    import numpy as np

    from __graft_entry__ import _configs, _example_batch
    from rgbd_pifuhd_tpu.models import MultiResPIFu

    cfg_g, cfg_l, _, _ = _configs(tiny=True)
    cfg_g = dataclasses.replace(cfg_g, norm="batch")
    cfg_l = dataclasses.replace(cfg_l, norm="batch")
    model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)
    rng = np.random.default_rng(7)
    batch = _example_batch(rng, B1=8, B2=2, N=64, res_g=64, res_l=32)
    return model, batch


def run_model_steps(model, batch, mesh, shard_batch_fn, n_steps: int = 3):
    """params/opt_state as host trees (process-local device arrays cannot
    feed a global-mesh jit); returns the per-step losses."""
    import numpy as np
    import jax

    from rgbd_pifuhd_tpu.train.trainers import (
        make_fine_train_step, make_optimizer, shard_train_step)

    variables = model.init(
        jax.random.PRNGKey(0),
        jax.tree.map(lambda x: x[:1], batch)["images_local"],
        batch["images_global"][:1], batch["points"][:1],
        batch["calib_local"][:1], batch["calib_global"][:1],
        batch["labels"][:1],
    )
    variables = jax.tree.map(np.asarray, variables)
    tx = make_optimizer("rmsprop", 1e-3)
    opt_state = jax.tree.map(np.asarray, tx.init(variables["params"]))
    step = shard_train_step(make_fine_train_step(model, tx), mesh)
    gbatch = shard_batch_fn(batch)
    losses = []
    for _ in range(n_steps):
        variables, opt_state, m = step(variables, opt_state, gbatch)
        losses.append(float(m["loss"]))
    # back to host numpy: the caller's eager apply + the next global-mesh
    # jit both need process-portable (uncommitted) values
    return losses, jax.tree.map(np.asarray, variables)


def run_sharded_grid_query(model, variables, batch, mesh):
    """One two-phase grid evaluation with the point axis sharded over the
    (possibly process-spanning) mesh; returns the dense volume."""
    import numpy as np
    import jax.numpy as jnp

    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.parallel import shard_points_query
    from rgbd_pifuhd_tpu.recon.grid import eval_grid_two_phase

    import jax

    g_feats = model.apply(variables, batch["images_global"][:1],
                          method=MultiResPIFu.filter_global)
    l_feats = model.apply(variables, batch["images_local"][:1, :1], g_feats,
                          method=MultiResPIFu.filter_local)
    # host numpy: eager results are committed to THIS process's device 0,
    # which a global-mesh jit would reject
    g_feats = jax.tree.map(lambda x: None if x is None else np.asarray(x),
                           g_feats)
    l_feats = jax.tree.map(lambda x: None if x is None else np.asarray(x),
                           l_feats)

    def query(world_pts, variables, l_feats, g_feats, calib):
        out = model.apply(variables, l_feats, g_feats,
                          world_pts[None, None], calib[None, None],
                          calib[None], method=MultiResPIFu.query)
        return out.preds[0, :, 0]

    sharded = shard_points_query(query, mesh)
    vol, _diag = eval_grid_two_phase(
        sharded, 16, jnp.eye(4), variables, l_feats, g_feats,
        jnp.eye(4, dtype=jnp.float32),
        factor=4, budget_cells=16, cells_per_chunk=16,
    )
    return np.asarray(vol)


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

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

    # ---- part 1: toy linear model (plumbing sanity)
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
    linear_losses = []
    for _ in range(5):
        # every process derives the same global batch (same seed) and
        # shard_host_batch keeps only this process's rows
        x = rng.standard_normal((16, 4)).astype(np.float32)
        gb = {"x": x, "y": x @ w_true}
        batch = shard_host_batch(mesh, gb)
        w, opt_state, m = step(w, opt_state, batch)
        linear_losses.append(float(m["loss"]))

    # ---- part 2: the real model through the same wrapper
    model, mbatch = build_model_and_batch()
    model_losses, variables = run_model_steps(
        model, mbatch, mesh, lambda b: shard_host_batch(mesh, b))

    # ---- part 3: multi-host sharded grid query
    vol = run_sharded_grid_query(model, variables, mbatch, mesh)

    if is_primary():
        np.savez(out_path,
                 linear=np.asarray(linear_losses, np.float64),
                 model=np.asarray(model_losses, np.float64),
                 vol=vol.astype(np.float64))


if __name__ == "__main__":
    main()
