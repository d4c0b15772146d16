"""The framework LEARNS: overfit a tiny coarse model on one synthetic
subject and verify the reconstructed mesh approximates the ground-truth
sphere.  This is the full learning loop (sampling -> filter -> query ->
balanced BCE -> optimizer) plus the full reconstruction path validated
together — the closest thing to a scientific end-to-end check that exists
for this model family.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
from rgbd_pifuhd_tpu.data.datasets import TrainDataset
from rgbd_pifuhd_tpu.models import CoarsePIFu
from rgbd_pifuhd_tpu.train.trainers import (
    make_coarse_train_step,
    make_optimizer,
)
from rgbd_pifuhd_tpu.utils.options import Options
from tests.test_models_pifu import tiny_global


@pytest.mark.slow
def test_overfit_sphere_and_reconstruct(tmp_path):
    root = str(tmp_path / "sphere_data")
    generate_synthetic_dataset(root, subjects=("sphere",), size=128,
                               load_size=128)
    opt = Options(dataroot=root, load_size=128, load_size_big=128,
                  load_size_local=128, num_sample_inout=512, sigma=8.0)
    ds = TrainDataset(opt, seed=0)
    item = ds[0]

    cfg = dataclasses.replace(
        tiny_global(), load_size=128, num_stack=2, hg_depth=2, hg_dim=16,
        mlp_dim=(17, 128, 64, 32, 1), mlp_res_layers=(1, 2), merge_layer=2,
        mlp_norm="none")
    model = CoarsePIFu(cfg)
    img = jnp.asarray(item["img_512"])[None]
    calib = jnp.asarray(item["calib"], jnp.float32)[None]
    variables = model.init(jax.random.PRNGKey(0), img,
                           jnp.asarray(item["samples"])[None], calib,
                           jnp.asarray(item["labels"])[None])
    tx = make_optimizer("adam", 3e-3, b1=0.9)
    opt_state = tx.init(variables["params"])
    step = jax.jit(make_coarse_train_step(model, tx, gamma=0.5))

    first_loss = None
    loss = None
    for i in range(300):
        it = ds[0]  # fresh occupancy sampling every step
        batch = {"images": img,
                 "points": jnp.asarray(it["samples"])[None],
                 "calibs": calib,
                 "labels": jnp.asarray(it["labels"])[None]}
        variables, opt_state, m = step(variables, opt_state, batch)
        if first_loss is None:
            first_loss = float(m["loss"])
        loss = float(m["loss"])

    assert loss < first_loss * 0.85, (first_loss, loss)

    from rgbd_pifuhd_tpu.recon.pipeline import CoarseReconstructor
    recon = CoarseReconstructor(model, variables, Options(resolution=64))
    data = {"img": img, "img_512": img,
            "calib": jnp.asarray(item["calib"], jnp.float32)}
    out = recon.gen_mesh(data, str(tmp_path / "learned.obj"), resolution=64)

    # ground truth: radius-90 sphere at the synthetic subject center
    center = np.array([-128.0, 100.0, -434.0])
    r = np.linalg.norm(out["verts"] - center, axis=1)
    assert 60.0 < r.mean() < 130.0, r.mean()
    assert r.std() < 25.0, r.std()
