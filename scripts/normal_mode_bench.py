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
    # Build BOTH reconstructors and warm them up first, then measure in
    # INTERLEAVED rounds (fd, grad, fd, grad, ...).  The sandbox host and
    # tunnel throttle erratically and monotonically warm up over a run, so
    # a sequential fd-then-grad measurement hands whichever mode runs
    # second the faster machine state — interleaving removes that bias.
    recons, feats = {}, {}
    for mode in ("fd", "grad"):
        opt = Options(resolution=512, normal_mode=mode)
        recons[mode] = Reconstructor(model, params, opt)
        feats[mode] = recons[mode].encode(img_l, img_g)
        recons[mode].color_by_normals(verts, feats[mode], calib)  # compile
    samples = {"fd": [], "grad": []}
    for _ in range(4):
        for mode in ("fd", "grad"):
            t0 = time.time()
            recons[mode].color_by_normals(verts, feats[mode], calib)
            samples[mode].append(time.time() - t0)
    for mode in ("fd", "grad"):
        out[f"{mode}_color_s"] = round(min(samples[mode]), 4)
        out[f"{mode}_runs_s"] = [round(t, 3) for t in samples[mode]]
    out["speedup_grad_vs_fd"] = round(out["fd_color_s"]
                                      / out["grad_color_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
