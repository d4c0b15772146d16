"""Measure the SHARPNESS of a trained flagship field on a world lattice.

A PIFu occupancy field is only as cheap to reconstruct as it is
DECISIVE: every octree — ours (recon/grid.py rank-based top-K) and the
reference's threshold rule (mesh_util.py:179, skip when a cell's 8
corners disagree by < 0.05) — refines exactly the cells where the field
is ambiguous.  A field that saturates to 0/1 away from the true surface
costs ~6k refined cells at 64^3; a fuzzy one costs 10-20x that, and the
host marching/coloring tail scales with it.

This script loads the bench flagship checkpoint
(~/.cache/rgbd_pifuhd_tpu/flagship, scripts/train_bench_flagship.py),
evaluates the fine AND coarse fields on the reconstruction's own 65^3
world lattice (ONE jitted lax.map evaluation, ONE ~1 MB readback — the
dev tunnel moves device->host bytes at ~0.2-3 MB/s, so per-chunk
readbacks are 100x slower), and reports:

  - cells with corner disagreement > 0.05 (what ANY octree must refine)
  - cells straddling the 0.5 isosurface (a clean capsule needs ~5-6k)
  - lattice values in (0.02, 0.98) — the "undecided" volume fraction

Measured 2026-08-19 (capsule subject, 1200 coarse / 1200 fine steps):

  recipe                        fine act>.05  straddle  mid-values
  rmsprop 1e-3 (reference)        109,704     50,309    101,495/275k
  adam 3e-3                        75,671     35,138     61,263/275k
  adam 3e-3 + far_boost 2.0        42,557     17,976     38,408/275k
  (trained tiny model: ~6k active.  The reference recipe's coarse level
   is WORSE than its fine: 137k/50k/164k; f32 vs bf16 compute changes
   nothing — it is optimization, not precision noise.)

Run:  python scripts/field_quality_study.py [--ckpt DIR] [--coarse]
                                            [--save out.npz]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(tag, vals):
    from numpy.lib.stride_tricks import sliding_window_view
    vals = vals.reshape(65, 65, 65)
    w = sliding_window_view(vals, (2, 2, 2))
    act = w.max(axis=(3, 4, 5)) - w.min(axis=(3, 4, 5))
    strad = (w.min(axis=(3, 4, 5)) < 0.5) & (w.max(axis=(3, 4, 5)) > 0.5)
    mid = int(((vals > 0.02) & (vals < 0.98)).sum())
    print(f"[{tag}] cells act>0.05: {int((act > 0.05).sum())}/{act.size}"
          f"  straddling-0.5: {int(strad.sum())}"
          f"  mid-values(0.02-0.98): {mid}/{vals.size}", flush=True)
    return {"active": int((act > 0.05).sum()),
            "straddle": int(strad.sum()), "mid": mid}


def run(ckpt_dir=None, do_coarse=True, save=None):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    if ckpt_dir:
        os.environ["RGBD_PIFUHD_FLAGSHIP_CKPT"] = os.path.join(
            ckpt_dir, "ckpt") if os.path.isdir(ckpt_dir) else ckpt_dir
    flag = bench._flagship_trained_field(repo)
    assert flag is not None, "no flagship checkpoint found"
    params, opt_model, data = flag[:3]
    print(f"ckpt loaded ({time.time() - t0:.0f}s)", flush=True)

    from rgbd_pifuhd_tpu.models import CoarsePIFu, MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import (CoarseReconstructor,
                                                Reconstructor)
    from rgbd_pifuhd_tpu.recon.grid import create_grid_transform
    from rgbd_pifuhd_tpu.utils.options import Options

    cfg_g, cfg_l = opt_model.netG, opt_model.netMR
    calib = data["calib"]
    mat = create_grid_transform(64)
    trans = np.linalg.inv(np.asarray(calib)) @ mat
    idx = np.stack(np.meshgrid(*([np.arange(65.0)] * 3), indexing="ij"),
                   axis=-1).reshape(-1, 3)
    pts = np.ascontiguousarray(idx @ trans[:3, :3].T + trans[:3, 3])
    pts_d = jnp.asarray(pts.reshape(-1, 2197, 3), jnp.float32)  # 125 chunks

    model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)
    recon = Reconstructor(model, params, Options(resolution=512))
    lf, gf = recon.encode(data["img"], data["img_512"])

    @jax.jit
    def eval_fine(pd):
        return lax.map(
            lambda c: recon._query(c, recon.params, lf, gf, calib), pd)

    t1 = time.time()
    fv = np.asarray(eval_fine(pts_d), np.float32)
    print(f"fine lattice ({time.time() - t1:.0f}s)", flush=True)
    out = {"fine": summarize("fine", fv)}

    if do_coarse:
        crec = CoarseReconstructor(
            CoarsePIFu(cfg_g), {"params": params["params"]["netG"]},
            Options(resolution=512))
        _, cf = crec.encode(data["img"], data["img_512"])

        @jax.jit
        def eval_coarse(pd):
            return lax.map(
                lambda c: crec._query(c, crec.params, None, cf, calib), pd)

        t1 = time.time()
        cv = np.asarray(eval_coarse(pts_d), np.float32)
        print(f"coarse lattice ({time.time() - t1:.0f}s)", flush=True)
        out["coarse"] = summarize("coarse", cv)
    if save:
        np.savez(save, fine=fv.reshape(65, 65, 65), pts=pts,
                 **({"coarse": cv.reshape(65, 65, 65)} if do_coarse else {}))
        print(f"saved lattice(s) to {save}")
    print(f"total {time.time() - t0:.0f}s")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="flagship checkpoint dir (default: bench's)")
    ap.add_argument("--no-coarse", action="store_true")
    ap.add_argument("--save", default=None,
                    help="npz path for the raw lattice values")
    args = ap.parse_args()
    run(args.ckpt, not args.no_coarse, save=args.save)
