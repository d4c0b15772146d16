"""Multi-host (multi-process) data parallelism over DCN — CI-tested on one
machine: two localhost processes x 4 virtual CPU devices each form one
8-device global mesh with gloo collectives (parallel/distributed.py).

The reference has no distributed backend whatsoever (SURVEY.md section 2.4);
this validates the framework's beyond-reference multi-host path: the same
shard_train_step the single-host drivers jit, fed per-process batch slices
by shard_host_batch, must reproduce the single-process losses.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from rgbd_pifuhd_tpu.parallel import (
    make_device_mesh,
    shard_host_batch,
)
from rgbd_pifuhd_tpu.train.trainers import shard_train_step

_CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_losses() -> list[float]:
    """The same 5 steps on this process's own 8-device mesh."""
    mesh = make_device_mesh()
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
        x = rng.standard_normal((16, 4)).astype(np.float32)
        gb = {"x": x, "y": x @ w_true}
        w, opt_state, m = step(w, opt_state, shard_host_batch(mesh, gb))
        losses.append(float(m["loss"]))
    return losses


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    """Two gloo-joined processes x 4 virtual CPU devices train (a) a toy
    linear model and (b) the REAL tiny MultiResPIFu through the same
    make_fine_train_step + shard_train_step the single-host drivers jit
    (BatchNorm batch_stats, frozen-netG stop_gradients, multi-collection
    variables all crossing processes), then run one grid query whose
    point axis spans processes.  All three must reproduce this process's
    own single-process 8-device run."""
    port = _free_port()
    out = tmp_path / "results.npz"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(port), str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out")
        outputs.append(stdout)
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"child failed:\n{text}"
    assert out.exists(), f"primary wrote no results:\n{outputs[0]}"

    multi = np.load(out)
    single = np.asarray(_single_process_losses())
    # training must make net progress (deterministic with this seed) and
    # match the single-process run (cross-process psum == in-process psum)
    assert multi["linear"][-1] < multi["linear"][0]
    np.testing.assert_allclose(multi["linear"], single, rtol=1e-5,
                               atol=1e-6)

    # the REAL model: same losses as this process's single-process run
    from tests.multihost_child import (
        build_model_and_batch, run_model_steps, run_sharded_grid_query)

    mesh = make_device_mesh()
    model, batch = build_model_and_batch()
    ref_losses, ref_vars = run_model_steps(model, batch, mesh,
                                           lambda b: b)
    assert multi["model"][-1] < multi["model"][0] * 1.001, multi["model"]
    np.testing.assert_allclose(multi["model"], np.asarray(ref_losses),
                               rtol=1e-4, atol=1e-6)

    # the sharded grid query: identical volume across the process split
    ref_vol = run_sharded_grid_query(model, ref_vars, batch, mesh)
    np.testing.assert_allclose(multi["vol"], ref_vol, rtol=1e-4,
                               atol=1e-5)


def test_shard_host_batch_single_process_noop():
    mesh = make_device_mesh()
    batch = {"x": jnp.ones((8, 3))}
    assert shard_host_batch(mesh, batch) is batch


def test_shard_host_batch_rejects_indivisible(monkeypatch):
    mesh = make_device_mesh()
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="not divisible"):
        shard_host_batch(mesh, {"x": np.ones((7, 3), np.float32)})
