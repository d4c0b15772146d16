"""Benchmark: end-to-end coarse+fine mesh reconstruction on one TPU chip.

Primary metric (BASELINE.json): seconds per mesh at 512^3 coarse+fine.
vs_baseline is computed against the driver-set north-star of 2.0 s/mesh —
value < 1.0 means faster than the target.

Composition (documented because the model here is untrained):
- encode: coarse(512^2) + fine(1024^2) filters + normal nets, real flagship
  architecture — timed as-is.
- volume: two-phase 512^3 grid evaluation.  Its cost is BUDGET-BOUND
  (top-K cell refinement has static shapes), so it is identical for a
  trained or untrained model; the untrained model's MLP final bias is set
  to -4 so the field is empty and marching isn't fed noise.
- marching: timed on a realistic analytic 512^3 volume with a human-scale
  surface (~560k verts) — what a trained model would produce.

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def _human_scale_volume(res: int) -> np.ndarray:
    """Capsule-ish occupancy with ~0.5-1M surface verts at 512^3."""
    vol = np.zeros((res, res, res), np.float32)
    cy = res / 2
    yy = (np.arange(res)[:, None] - cy) ** 2
    xx = (np.arange(res)[None, :] - cy) ** 2
    r = res * 0.18
    half = res * 0.25
    for z in range(res):
        dz = z - cy
        dzc = np.clip(np.abs(dz) - half, 0, None)
        d = np.sqrt(yy + xx + dzc ** 2)
        vol[:, :, z] = 1.0 / (1.0 + np.exp(np.clip((d - r) / 1.5, -30, 30)))
    return vol


def main():
    import jax
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from __graft_entry__ import _configs

    import dataclasses

    resolution = 512
    cfg_g, cfg_l, _, _ = _configs(tiny=False)
    # bf16 activations for the inference path (params stay f32)
    cfg_g = dataclasses.replace(cfg_g, compute_dtype="bfloat16")
    cfg_l = dataclasses.replace(cfg_l, compute_dtype="bfloat16")
    model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)

    rng = np.random.default_rng(0)
    f32 = np.float32
    img_g = jnp.asarray(rng.standard_normal((1, 512, 512, 6)).astype(f32))
    img_l = jnp.asarray(rng.standard_normal((1, 1024, 1024, 6)).astype(f32))
    calib = jnp.eye(4, dtype=jnp.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), img_l[None], img_g,
        jnp.zeros((1, 1, 8, 3), f32), calib[None, None], calib[None],
        jnp.zeros((1, 1, 8, 1), f32),
    )
    # bias the fine MLP's last layer so the untrained field is empty
    # (grid-eval cost is budget-bound and unaffected; see module docstring)
    last = sorted(params["params"]["mlp"].keys())[-1]
    params["params"]["mlp"][last]["bias"] = (
        params["params"]["mlp"][last]["bias"] - 4.0)

    opt = Options(resolution=resolution, use_octree=True)
    recon = Reconstructor(model, params, opt)
    data = {"img": img_l, "img_512": img_g, "calib": calib}

    # ---- warmup (compile everything once)
    l_feats, g_feats = recon.encode(data["img"], data["img_512"])
    _ = recon.occupancy_volume(l_feats, g_feats, calib, resolution)

    # ---- timed components (median of 3)
    from rgbd_pifuhd_tpu.recon.grid import (
        eval_grid_two_phase_sparse, densify_sparse_volume,
        sparse_scan_cells)
    t_enc, t_vol, t_dev, t_xfer = [], [], [], []
    vol_buf = np.empty((resolution,) * 3, np.float32)  # warm reused buffer
    for _ in range(3):
        t0 = time.time()
        l_feats, g_feats = recon.encode(data["img"], data["img_512"])
        jax.block_until_ready(l_feats.im_feats)
        t_enc.append(time.time() - t0)
        t0 = time.time()
        sparse = eval_grid_two_phase_sparse(
            recon._query, resolution, jnp.linalg.inv(calib),
            recon.params, l_feats, g_feats, calib,
            factor=8, budget_cells=opt.num_refine_cells)
        jax.block_until_ready(sparse)
        t_dev.append(time.time() - t0)           # on-device evaluation
        t1 = time.time()
        host = [np.asarray(s) for s in sparse]   # device->host (tunnel!)
        t_xfer.append(time.time() - t1)
        _cells, marks = sparse_scan_cells(host[0], host[1], resolution,
                                          factor=8)
        vol = densify_sparse_volume(*host, resolution, factor=8,
                                    scan_marks=marks, out=vol_buf)
        t_vol.append(time.time() - t0)

    # marching timed on a realistic analytic volume through the SAME
    # masked path the pipeline uses (cells known from the sparse eval)
    from rgbd_pifuhd_tpu.recon.marching import marching_tetrahedra_cells
    from rgbd_pifuhd_tpu.recon.pipeline import _surface_cells
    mvol = _human_scale_volume(resolution)
    cells = _surface_cells(np.zeros((0,), np.int64), mvol,
                           resolution // 8, 8)
    t_mc = []
    for _ in range(3):
        t0 = time.time()
        verts, faces = marching_tetrahedra_cells(mvol, cells, factor=8)
        t_mc.append(time.time() - t0)

    enc = float(np.median(t_enc))
    volt = float(np.median(t_vol))
    mc = float(np.median(t_mc))
    secs = enc + volt + mc

    # grid-query throughput on the pure fused coarse+fine query path
    n_pts = 262144
    pts = jnp.asarray(rng.uniform(-1, 1, (n_pts, 3)).astype(f32))
    qj = jax.jit(recon._query)
    qj(pts, recon.params, l_feats, g_feats, calib).block_until_ready()
    t0 = time.time()
    for _ in range(5):
        r = qj(pts, recon.params, l_feats, g_feats, calib)
    r.block_until_ready()
    pps = n_pts * 5 / (time.time() - t0)

    xfer_mb = sum(h.nbytes for h in host) / 1e6
    print(json.dumps({
        "metric": "secs_per_mesh_512_coarse_fine",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(secs / 2.0, 4),
        "encode_s": round(enc, 4),
        "volume_512_s": round(volt, 4),
        "volume_device_eval_s": round(float(np.median(t_dev)), 4),
        "volume_host_transfer_s": round(float(np.median(t_xfer)), 4),
        "transfer_mb": round(xfer_mb, 2),
        "marching_s": round(mc, 4),
        "grid_query_pts_per_sec_per_chip": round(pps),
        "mesh_verts": int(len(verts)),
        "device": str(jax.devices()[0]),
        "note": ("volume_host_transfer_s is an environment artifact: this "
                 "dev chip is reached through a ~0.2-3 MB/s tunnel; over "
                 "PCIe the same transfer is ~1ms"),
    }))


if __name__ == "__main__":
    main()
