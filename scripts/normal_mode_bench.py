"""Measure fd vs autodiff (grad) vertex-normal coloring on the real chip.

The fd stencil (reference PIFuMRNet.py:188-243) evaluates the fine field
at 4 taps per vertex; normal_mode='grad' runs one reverse-mode sweep of
the same field (forward + input-gradient backward).  This script times
the full dispatch->pull cycle of ``_normals_many`` for both modes at a
flagship-scale vertex count and prints one JSON line.

Run:  python scripts/normal_mode_bench.py [n_verts]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _configs
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options

    n_verts = int(sys.argv[1]) if len(sys.argv) > 1 else 1_300_000

    cfg_g, cfg_l, _, _ = _configs(tiny=False)
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
        jnp.zeros((1, 1, 8, 1), f32))

    verts = rng.uniform(-0.9, 0.9, (n_verts, 3)).astype(f32)

    out = {"n_verts": n_verts, "device": str(jax.devices()[0])}
    for mode in ("fd", "grad"):
        opt = Options(resolution=512, normal_mode=mode)
        recon = Reconstructor(model, params, opt)
        feats = recon.encode(img_l, img_g)
        # warmup (compile)
        recon.color_by_normals(verts, feats, calib)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            recon.color_by_normals(verts, feats, calib)
            best = min(best, time.time() - t0)
        out[f"{mode}_color_s"] = round(best, 4)
    out["speedup_grad_vs_fd"] = round(out["fd_color_s"]
                                      / out["grad_color_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
