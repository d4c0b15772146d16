"""Train the tiny two-level model whose field drives bench.py's surface.

The benchmark's headline runs FULL flagship compute per query point, but
until round 3 its surface came from an analytic capsule blended in at
weight 1.0 (the untrained flagship field is empty).  This script closes
that asterisk: it overfits a tiny coarse+fine MultiResPIFu on the
synthetic capsule subject (the same two-stage recipe the flagship uses —
pretrain netG, then train the fine MLP on the frozen coarse, reference
train.py:159-204) and commits the checkpoint; bench.py reconstructs from
this REAL trained field.

Run on CPU (a few minutes):
    python scripts/train_bench_tiny.py [--steps 400] [--out assets/bench_tiny]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Keep everything identical between training here and inference in
# bench.py: one module owns the tiny configs and the dataset recipe.
TINY_DATA_KW = dict(subjects=("capsule",), size=128, load_size=128, seed=0)


def tiny_coarse_cfg():
    from rgbd_pifuhd_tpu.utils.options import PIFuLevelConfig
    return PIFuLevelConfig(
        num_stack=2, hg_depth=2, hg_dim=16, norm="group", hg_down="ave_pool",
        mlp_dim=(17, 128, 64, 32, 1), mlp_res_layers=(1, 2), mlp_norm="none",
        merge_layer=2, use_depth=True,
        use_front_normal=False, use_back_normal=False,
        load_size=128, z_size=64.0)


def tiny_fine_cfg():
    # fine MLP input = local hg_dim (16) + coarse phi at merge_layer 2 (32)
    from rgbd_pifuhd_tpu.utils.options import PIFuLevelConfig
    return PIFuLevelConfig(
        num_stack=1, hg_depth=2, hg_dim=16, norm="group", hg_down="no_down",
        mlp_dim=(48, 64, 32, 1), mlp_res_layers=(1,), mlp_norm="none",
        merge_layer=-1, use_depth=True,
        use_front_normal=False, use_back_normal=False,
        load_size=128, z_size=64.0)


def tiny_options(dataroot: str):
    from rgbd_pifuhd_tpu.utils.options import Options
    return Options(dataroot=dataroot, load_size=128, load_size_big=128,
                   load_size_local=128, num_sample_inout=512, sigma=8.0,
                   netG=tiny_coarse_cfg(), netMR=tiny_fine_cfg())


def ensure_tiny_dataset(root: str) -> str:
    """Generate (once) the capsule dataset the tiny model trains/infers on."""
    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    if not os.path.isdir(os.path.join(root, "RENDER", "capsule")):
        generate_synthetic_dataset(root, **TINY_DATA_KW)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default="assets/bench_tiny")
    ap.add_argument("--dataroot", default="/tmp/rgbd_bench_tiny_data")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # tiny model: CPU is fine
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.models import CoarsePIFu, MultiResPIFu
    from rgbd_pifuhd_tpu.train.trainers import (
        make_coarse_train_step, make_fine_train_step, make_optimizer)
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt

    opt = tiny_options(ensure_tiny_dataset(args.dataroot))
    ds = TrainDataset(opt, seed=0)
    item = ds[0]
    img = jnp.asarray(item["img_512"])[None]
    calib = jnp.asarray(item["calib"], jnp.float32)[None]

    # ---- stage 1: pretrain the coarse level
    coarse = CoarsePIFu(opt.netG)
    g_vars = coarse.init(jax.random.PRNGKey(0), img,
                         jnp.asarray(item["samples"])[None], calib,
                         jnp.asarray(item["labels"])[None])
    tx = make_optimizer("adam", 3e-3, b1=0.9)
    g_state = tx.init(g_vars["params"])
    g_step = jax.jit(make_coarse_train_step(coarse, tx, gamma=0.5))
    for i in range(args.steps):
        it = ds[0]  # fresh occupancy sampling every step
        batch = {"images": img,
                 "points": jnp.asarray(it["samples"])[None],
                 "calibs": calib,
                 "labels": jnp.asarray(it["labels"])[None]}
        g_vars, g_state, m = g_step(g_vars, g_state, batch)
        if i % 100 == 0:
            print(f"[coarse {i}] loss={float(m['loss']):.4f}")

    # ---- stage 2: train the fine MLP on the frozen coarse
    model = MultiResPIFu(cfg=opt.netMR, cfg_global=opt.netG,
                         train_full_pifu=False)
    f_vars = model.init(
        jax.random.PRNGKey(1), img[None], img,
        jnp.asarray(item["samples"])[None, None], calib[None], calib,
        jnp.asarray(item["labels"])[None, None])
    f_vars["params"]["netG"] = g_vars["params"]
    tx_f = make_optimizer("adam", 3e-3, b1=0.9)
    f_state = tx_f.init(f_vars["params"])
    f_step = jax.jit(make_fine_train_step(model, tx_f))
    for i in range(args.steps):
        it = ds[0]
        batch = {"images_local": img[None], "images_global": img,
                 "points": jnp.asarray(it["samples"])[None, None],
                 "calib_local": calib[None], "calib_global": calib,
                 "labels": jnp.asarray(it["labels"])[None, None]}
        f_vars, f_state, m = f_step(f_vars, f_state, batch)
        if i % 100 == 0:
            print(f"[fine {i}] loss={float(m['loss']):.4f}")

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "ckpt")
    # store float16: halves the committed asset; the occupancy field is
    # insensitive at this precision (bench.py casts back to float32)
    f16 = jax.tree.map(
        lambda x: np.asarray(x, np.float16)
        if getattr(x, "dtype", None) == np.float32 else x, f_vars)
    ckpt.save_checkpoint(path, f16, opt, epoch=args.steps)
    n_params = sum(x.size for x in jax.tree.leaves(f_vars))
    print(f"saved {path} ({n_params / 1e6:.2f}M params, "
          f"final fine loss {float(m['loss']):.4f})")


if __name__ == "__main__":
    main()
