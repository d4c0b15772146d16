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


def _coarse_cfg():
    return dataclasses.replace(
        tiny_global(), load_size=128, num_stack=2, hg_depth=2, hg_dim=16,
        mlp_dim=(17, 128, 64, 32, 1), mlp_res_layers=(1, 2), merge_layer=2,
        mlp_norm="none")


def _fine_cfg():
    # fine MLP input = local hg_dim (16) + coarse phi at merge_layer 2 (32)
    from rgbd_pifuhd_tpu.utils.options import PIFuLevelConfig
    return PIFuLevelConfig(
        num_stack=1, hg_depth=2, hg_dim=16, norm="group", hg_down="no_down",
        mlp_dim=(48, 64, 32, 1), mlp_res_layers=(1,), mlp_norm="none",
        merge_layer=-1, use_depth=True,
        use_front_normal=False, use_back_normal=False,
        load_size=128, z_size=200.0)


@pytest.mark.slow
def test_overfit_two_level_and_reconstruct(tmp_path):
    """The FLAGSHIP path learns: pretrain the coarse level, train the fine
    MLP on top (coarse frozen — reference train.py:159-204 with
    train_full_pifu=False), reconstruct through the two-level
    ``Reconstructor`` (reference reconstruction.py:25-75), and verify
    (a) the mesh approximates the ground-truth sphere and (b) the fine
    level ADDS fidelity over the coarse-only reconstruction — the full-res
    local features resolve the surface more tightly than the stride-4
    coarse features (the reason the architecture exists)."""
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import (
        CoarseReconstructor, Reconstructor)
    from rgbd_pifuhd_tpu.train.trainers import make_fine_train_step

    root = str(tmp_path / "sphere_data")
    generate_synthetic_dataset(root, subjects=("sphere",), size=128,
                               load_size=128)
    opt = Options(dataroot=root, load_size=128, load_size_big=128,
                  load_size_local=128, num_sample_inout=512, sigma=8.0)
    ds = TrainDataset(opt, seed=0)
    item = ds[0]

    # ---- 1. pretrain the coarse level (netG)
    cfg_g = _coarse_cfg()
    coarse = CoarsePIFu(cfg_g)
    img = jnp.asarray(item["img_512"])[None]
    calib = jnp.asarray(item["calib"], jnp.float32)[None]
    g_vars = coarse.init(jax.random.PRNGKey(0), img,
                         jnp.asarray(item["samples"])[None], calib,
                         jnp.asarray(item["labels"])[None])
    tx = make_optimizer("adam", 3e-3, b1=0.9)
    g_state = tx.init(g_vars["params"])
    g_step = jax.jit(make_coarse_train_step(coarse, tx, gamma=0.5))
    for i in range(300):
        it = ds[0]
        batch = {"images": img,
                 "points": jnp.asarray(it["samples"])[None],
                 "calibs": calib,
                 "labels": jnp.asarray(it["labels"])[None]}
        g_vars, g_state, m = g_step(g_vars, g_state, batch)

    # ---- 2. train the fine level on the frozen coarse
    cfg_l = _fine_cfg()
    model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g, train_full_pifu=False)
    img_l = img  # full-frame window (B2=1): local == global image here
    f_vars = model.init(
        jax.random.PRNGKey(1), img_l[None], img,
        jnp.asarray(item["samples"])[None, None], calib[None],
        calib, jnp.asarray(item["labels"])[None, None])
    f_vars["params"]["netG"] = g_vars["params"]
    tx_f = make_optimizer("adam", 3e-3, b1=0.9)
    f_state = tx_f.init(f_vars["params"])
    f_step = jax.jit(make_fine_train_step(model, tx_f))
    first_loss = loss = None
    for i in range(300):
        it = ds[0]
        batch = {"images_local": img_l[None],
                 "images_global": img,
                 "points": jnp.asarray(it["samples"])[None, None],
                 "calib_local": calib[None],
                 "calib_global": calib,
                 "labels": jnp.asarray(it["labels"])[None, None]}
        f_vars, f_state, m = f_step(f_vars, f_state, batch)
        if first_loss is None:
            first_loss = float(m["loss"])
        loss = float(m["loss"])
    # the fine MLP starts HALF-trained (the frozen coarse phi features
    # already carry the field), so the relative drop is smaller than the
    # coarse pretrain's; the geometric assertions below are the real check
    assert loss < first_loss * 0.85, (first_loss, loss)

    # ---- 3. reconstruct through the TWO-LEVEL path
    data = {"img": img_l, "img_512": img,
            "calib": jnp.asarray(item["calib"], jnp.float32)}
    recon = Reconstructor(model, f_vars, Options(resolution=64))
    out = recon.gen_mesh(data, str(tmp_path / "fine.obj"), resolution=64)
    center = np.array([-128.0, 100.0, -434.0])
    r_fine = np.linalg.norm(out["verts"] - center, axis=1)
    assert 60.0 < r_fine.mean() < 130.0, r_fine.mean()
    assert r_fine.std() < 20.0, r_fine.std()

    # ---- 4. the fine level beats the coarse-only reconstruction
    crec = CoarseReconstructor(coarse, g_vars, Options(resolution=64))
    cout = crec.gen_mesh(data, str(tmp_path / "coarse.obj"), resolution=64)
    r_coarse = np.linalg.norm(cout["verts"] - center, axis=1)
    # tighter surface: lower spread around the true radius
    assert r_fine.std() < r_coarse.std() * 1.05, (r_fine.std(),
                                                  r_coarse.std())
    err_fine = np.abs(r_fine - 90.0).mean()
    err_coarse = np.abs(r_coarse - 90.0).mean()
    assert err_fine < err_coarse * 1.05, (err_fine, err_coarse)
