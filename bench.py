"""Benchmark: end-to-end coarse+fine mesh reconstruction on one TPU chip.

Primary metric (BASELINE.json): seconds per mesh at 512^3 coarse+fine.
The reference publishes no numbers; BASELINE.md's derived baseline is the
host-chunked CPU/GPU path with ~27k device round-trips.  vs_baseline is
computed against the driver-set north-star of 2.0 s/mesh on v5e-8 —
value < 1 means faster than target.

Prints ONE JSON line:
  {"metric": "secs_per_mesh_512_coarse_fine", "value": ..., "unit": "s",
   "vs_baseline": value / 2.0, ...extras}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from __graft_entry__ import _configs

    resolution = 512
    cfg_g, cfg_l, res_g, res_l = _configs(tiny=False)
    model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)

    rng = np.random.default_rng(0)
    f32 = np.float32
    # synthetic RGB-D subject at production sizes: global 512, local 1024
    img_g = jnp.asarray(rng.standard_normal((1, 512, 512, 6)).astype(f32))
    img_l = jnp.asarray(rng.standard_normal((1, 1024, 1024, 6)).astype(f32))
    calib = jnp.eye(4, dtype=jnp.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), img_l[None], img_g,
        jnp.zeros((1, 1, 8, 3), f32), calib[None, None], calib[None],
        jnp.zeros((1, 1, 8, 1), f32),
    )

    opt = Options(resolution=resolution, use_octree=True)
    recon = Reconstructor(model, params, opt)
    data = {"img": img_l, "img_512": img_g, "calib": calib}

    # warmup (compile)
    l_feats, g_feats = recon.encode(data["img"], data["img_512"])
    vol = recon.occupancy_volume(l_feats, g_feats, calib, resolution)

    # timed end-to-end: encode + volume + device->host + marching cubes
    times = []
    mesh_sizes = []
    for _ in range(3):
        t0 = time.time()
        l_feats, g_feats = recon.encode(data["img"], data["img_512"])
        vol = recon.occupancy_volume(l_feats, g_feats, calib, resolution)
        from rgbd_pifuhd_tpu.recon.marching import marching_tetrahedra
        verts, faces = marching_tetrahedra(vol, 0.5)
        times.append(time.time() - t0)
        mesh_sizes.append(len(verts))

    secs = float(np.median(times))
    # grid-query throughput (points/sec/chip) on the pure query path
    n_pts = 262144
    pts = jnp.asarray(rng.uniform(-1, 1, (n_pts, 3)).astype(f32))
    q = recon._query
    import jax as _jax
    qj = _jax.jit(q)
    qj(pts, recon.params, l_feats, g_feats, calib).block_until_ready()
    t0 = time.time()
    for _ in range(5):
        r = qj(pts, recon.params, l_feats, g_feats, calib)
    r.block_until_ready()
    pps = n_pts * 5 / (time.time() - t0)

    print(json.dumps({
        "metric": "secs_per_mesh_512_coarse_fine",
        "value": round(secs, 4),
        "unit": "s",
        "vs_baseline": round(secs / 2.0, 4),
        "grid_query_pts_per_sec_per_chip": round(pps),
        "mesh_verts": int(np.median(mesh_sizes)),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
