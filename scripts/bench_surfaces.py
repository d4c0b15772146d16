"""Benchmark surface loaders: which trained field does the bench measure?

Owns the checkpoint-to-device logic for the two bench surfaces so
``bench.py`` stays a thin measurement orchestrator:

- ``flagship_trained_field``: the 384.6M-param flagship checkpoint
  (scripts/train_bench_flagship.py), trained in-bench at reduced steps
  when absent.
- ``tiny_trained_field``: the committed trained-tiny checkpoint
  (assets/bench_tiny) — the fallback surface when no flagship checkpoint
  can be produced.

Loaded by bench.py via importlib (scripts/ is not a package).
"""

from __future__ import annotations

import os

import numpy as np

from rgbd_pifuhd_tpu.utils.retry import is_transient


def flagship_trained_field(repo: str):
    """Load (or regenerate) a trained FLAGSHIP-class checkpoint.

    Returns ``(params, opt_model, data, label)`` — trained params (f32 on
    device), the checkpoint's embedded Options, the capsule subject's
    data dict at flagship load sizes, and a surface label — or None when
    no checkpoint exists and in-bench regeneration is disabled/fails.

    Checkpoint search order (VERDICT r4 item 6 — cold start must not be
    a 30-min training run):

    1. ``RGBD_PIFUHD_FLAGSHIP_CKPT`` (explicit override),
    2. the full 384.6M-param flagship (~770 MB f16, too large to commit)
       in ``~/.cache/rgbd_pifuhd_tpu/flagship``,
    3. the COMMITTED flagship-lite (``assets/bench_flagship_lite``,
       42.6M params ~= 85 MB f16): identical hourglass encoders and MLP
       chains — the field-phase per-point work the bench times is
       byte-identical — with the pix2pixHD normal nets width-scaled
       ngf 64->16 (same topology; they run once per image in encode).

    Only when none exists does the bench TRAIN the full flagship
    in-process at reduced step counts (BENCH_TRAIN_FLAGSHIP=0 disables)
    — data and params stay device-resident during training, so the slow
    tunnel link is not on the training path.
    """
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "train_bench_flagship",
        os.path.join(repo, "scripts", "train_bench_flagship.py"))
    tbf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tbf)

    label = "trained flagship field"
    env_path = os.environ.get("RGBD_PIFUHD_FLAGSHIP_CKPT")
    lite_path = os.path.join(tbf.DEFAULT_LITE_OUT, "ckpt")
    if env_path:
        ckpt_path = env_path
    elif os.path.exists(os.path.join(tbf.DEFAULT_OUT, "ckpt")):
        ckpt_path = os.path.join(tbf.DEFAULT_OUT, "ckpt")
    elif os.path.exists(lite_path):
        ckpt_path = lite_path
        label = ("trained flagship-lite field (committed; encoders+MLPs "
                 "flagship-exact, normal nets ngf16)")
    else:
        ckpt_path = os.path.join(tbf.DEFAULT_OUT, "ckpt")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    dataroot = os.path.join(base, "rgbd_flagship_data")
    if not os.path.exists(ckpt_path):
        if os.environ.get("BENCH_TRAIN_FLAGSHIP", "1") != "1":
            return None
        import sys
        print("[bench] no flagship checkpoint: training in-bench "
              "(reduced steps)", file=sys.stderr)
        try:
            ckpt_path = tbf.train_flagship(
                dataroot, os.path.dirname(ckpt_path) or ".",
                steps_nml=200, steps_coarse=800, steps_fine=800,
                log_every=100)
            label = "trained flagship field (in-bench, reduced steps)"
        except Exception as e:  # noqa: BLE001 — fall back to tiny blend
            if is_transient(e):
                raise
            print(f"[bench] in-bench flagship training failed: {e}",
                  file=sys.stderr)
            return None

    import jax
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt_mod
    from rgbd_pifuhd_tpu.utils.options import Options

    import sys
    state = ckpt_mod.load_checkpoint(ckpt_path)
    opt_model = Options.from_dict(state["opt"])
    # Upload f16 (half the bytes over the tunnel), cast to f32 on device —
    # CHUNKED with a forced drain + heartbeat every ~64 MB: the one-shot
    # tree upload is a multi-minute silent window during which a tunnel
    # flap looks identical to normal progress (observed 2026-08-19: an
    # upload stalled at ~2 s CPU / 18 min wall); with heartbeats the
    # watchdog's silence rule kills a real stall in minutes instead.
    total_mb = sum(getattr(x, "nbytes", 0)
                   for x in jax.tree.leaves(state["params"])) / 1e6
    print(f"[bench] uploading flagship checkpoint ({total_mb:.0f} MB f16 "
          "over the tunnel — minutes)", file=sys.stderr)
    leaves, treedef = jax.tree.flatten(state["params"])
    up, acc, done_mb = [], 0.0, 0.0
    for x in leaves:
        d = jnp.asarray(x)
        if getattr(x, "dtype", None) == np.float16:
            d = d.astype(jnp.float32)
        up.append(d)
        acc += getattr(x, "nbytes", 0)
        if acc > 64e6 and d.size:
            float(d.ravel()[0])          # drain the async upload queue
            done_mb += acc / 1e6
            acc = 0.0
            print(f"[bench] ... {done_mb:.0f}/{total_mb:.0f} MB uploaded",
                  file=sys.stderr)
    params = jax.tree.unflatten(treedef, up)

    tbf.ensure_flagship_dataset(dataroot)
    import dataclasses
    ds = TrainDataset(dataclasses.replace(opt_model, dataroot=dataroot),
                      load_mesh=False, seed=0)
    idx = next(i for i in range(len(ds))
               if "capsule" in os.path.basename(ds.img_files[i]))
    item = ds[idx]
    data = {"img": jnp.asarray(item["img"]),
            "img_512": jnp.asarray(item["img_512"])[None],
            "calib": jnp.asarray(item["calib"], jnp.float32)}
    return params, opt_model, data, label


def tiny_trained_field(repo: str):
    """Load the committed trained-tiny checkpoint and the capsule subject.

    Returns ``(tiny_occ, data, (cfg_mr, cfg_g))`` — a world-space occupancy
    closure over the TRAINED tiny two-level model
    (scripts/train_bench_tiny.py) plus the flagship-resolution data dict of
    the same synthetic capsule subject — or None when the checkpoint is
    absent (analytic-capsule fallback).  Both views share the subject's
    world frame, so the trained field and the flagship lattice align
    exactly.
    """
    ckpt_path = os.path.join(repo, "assets", "bench_tiny", "ckpt")
    if not os.path.exists(ckpt_path):
        return None
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "train_bench_tiny",
        os.path.join(repo, "scripts", "train_bench_tiny.py"))
    tbt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tbt)

    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt_mod
    from rgbd_pifuhd_tpu.utils.options import Options

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    tiny_root = tbt.ensure_tiny_dataset(
        os.path.join(base, "rgbd_bench_tiny_data"))
    import dataclasses
    state = ckpt_mod.load_checkpoint(ckpt_path)
    t_opt = Options.from_dict(state["opt"])
    # bf16 activations for the tiny field's inference (same as the
    # flagship path; the 0.5 level set is insensitive at this precision)
    cfg_mr = dataclasses.replace(t_opt.netMR, compute_dtype="bfloat16")
    cfg_g = dataclasses.replace(t_opt.netG, compute_dtype="bfloat16")
    tiny_model = MultiResPIFu(cfg=cfg_mr, cfg_global=cfg_g)
    import jax  # noqa: F401 — device placement side effects
    import numpy as _np
    tiny_params = jax.tree.map(  # stored float16 -> compute float32
        lambda x: _np.asarray(x, _np.float32)
        if getattr(x, "dtype", None) == _np.float16 else x,
        state["params"])
    item = TrainDataset(tbt.tiny_options(tiny_root), load_mesh=False,
                        seed=0)[0]
    timg = jnp.asarray(item["img_512"])[None]
    tcalib = jnp.asarray(item["calib"], jnp.float32)
    tg = tiny_model.apply(tiny_params, timg, last_only=True,
                          method=MultiResPIFu.filter_global)
    tl = tiny_model.apply(tiny_params, timg[None], tg, last_only=True,
                          method=MultiResPIFu.filter_local)

    # The trained field is only meaningful inside its training sampling
    # box (TRAIN_B_MIN/B_MAX — outside it supervision is zero and a
    # single-view PIFu extrudes along z); the reference reconstructs
    # inside the same box (EvalDataset B_MIN/B_MAX, reconstruction
    # create_grid), so the bench windows the field identically.
    bmin = jnp.asarray(item["b_min"], jnp.float32)
    bmax = jnp.asarray(item["b_max"], jnp.float32)

    def tiny_occ(world_pts):
        out = tiny_model.apply(
            tiny_params, tl, tg, world_pts[None, None],
            tcalib[None, None], tcalib[None],
            method=MultiResPIFu.query)
        inside = jnp.all((world_pts >= bmin) & (world_pts <= bmax),
                         axis=-1)
        return jnp.where(inside, out.preds[0, :, 0], 0.0)

    # flagship-resolution images of the SAME subject (1024^2 render: the
    # capsule fills the NDC box like a real full-frame subject)
    flag_root = os.path.join(base, "rgbd_bench_flag_data")
    if not os.path.isdir(os.path.join(flag_root, "RENDER", "capsule")):
        generate_synthetic_dataset(flag_root, subjects=("capsule",),
                                   size=1024, load_size=1024, seed=0)
    fopt = Options(dataroot=flag_root, load_size=1024, load_size_big=1024,
                   load_size_local=512, num_sample_inout=8, sigma=8.0)
    fitem = TrainDataset(fopt, load_mesh=False, seed=0)[0]
    data = {"img": jnp.asarray(fitem["img"]),
            "img_512": jnp.asarray(fitem["img_512"])[None],
            "calib": jnp.asarray(fitem["calib"], jnp.float32)}
    return tiny_occ, data, (cfg_mr, cfg_g)
