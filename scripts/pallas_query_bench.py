"""Measure the fused gather+MLP Pallas kernel vs the XLA query path.

Flagship inference shapes, both levels chained (coarse phi feeds fine),
GroupNorm, bf16 compute.  Timing uses the lax.scan slope method
(scripts/field_phase_profile.py) so the ~25 ms tunnel RTT cancels.
Also reports bf16-tolerance numerics between the two paths (the
GroupNorm scope is aligned via gn_scoped_apply so differences are pure
arithmetic, not semantics).

Output: one JSON line.  VERDICT r4 item 4's acceptance: >=1.5-2x
field-phase points/s or a roofline note proving the bound.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from field_phase_profile import scan_slope_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--norm", default="group", choices=["group", "none"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rgbd_pifuhd_tpu.models.mlp import PointMLP
    from rgbd_pifuhd_tpu.ops import geometry as geom
    from rgbd_pifuhd_tpu.ops.pallas_query import (
        fused_gather_mlp, gn_scoped_apply, mlp_params_from_tree)
    from rgbd_pifuhd_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()  # reruns skip the slow tunnel compiles

    N, tile = args.chunk, args.tile
    rng = np.random.default_rng(0)
    f32 = np.float32

    feat_g = jnp.asarray(rng.standard_normal((128, 128, 256)).astype(f32))
    feat_l = jnp.asarray(rng.standard_normal((256, 256, 16)).astype(f32))
    uv = jnp.asarray(rng.uniform(-0.95, 0.95, (N, 2)).astype(f32))
    z = jnp.asarray(rng.standard_normal((N, 1)).astype(f32))

    dims_g = (257, 1024, 512, 256, 128, 1)
    dims_l = (272, 512, 256, 128, 1)
    res_g, res_l = (2, 3, 4), (1, 2)
    mg = PointMLP(filter_channels=dims_g, merge_layer=2, res_layers=res_g,
                  norm=args.norm, last_op="sigmoid", dtype="bfloat16")
    ml = PointMLP(filter_channels=dims_l, merge_layer=-1, res_layers=res_l,
                  norm=args.norm, last_op="sigmoid", dtype="bfloat16")
    xg = jnp.zeros((1, N, 257), f32)
    xl = jnp.zeros((1, N, 272), f32)
    pg = mg.init(jax.random.PRNGKey(0), xg)["params"]
    plp = ml.init(jax.random.PRNGKey(1), xl)["params"]
    wg, gng = mlp_params_from_tree(pg, 5, args.norm)
    wl, gnl = mlp_params_from_tree(plp, 4, args.norm)

    def xla_query(u):
        f_g = geom.index(feat_g[None], u[None])[0]
        pred_g, phi = gn_scoped_apply(
            mg, {"params": pg},
            jnp.concatenate([f_g, z], -1)[None], tile)
        f_l = geom.index(feat_l[None], u[None])[0]
        pred_l, _ = gn_scoped_apply(
            ml, {"params": plp},
            jnp.concatenate([f_l, phi[0]], -1)[None], tile)
        return pred_l[0]

    def pallas_query(u):
        _, phi = fused_gather_mlp(
            feat_g, u, z, wg, gng, res_layers=res_g, merge_layer=2,
            tile=tile)
        pred_l, _ = fused_gather_mlp(
            feat_l, u, phi, wl, gnl, res_layers=res_l, merge_layer=-1,
            tile=tile)
        return pred_l

    res = {"chunk": N, "tile": tile, "norm": args.norm,
           "device": str(jax.devices()[0])}

    # numerics first (also warms the compiles)
    px = jax.jit(xla_query)(uv)
    pp = jax.jit(pallas_query)(uv)
    d = np.abs(np.asarray(px) - np.asarray(pp))
    res["pred_max_abs_diff"] = round(float(d.max()), 5)
    res["pred_mean_abs_diff"] = round(float(d.mean()), 6)

    def chain(q):
        return lambda u: u + 1e-7 * q(u)[:, :1]

    t_x = scan_slope_time(chain(jax.jit(xla_query)), uv, reps=args.reps)
    t_p = scan_slope_time(chain(jax.jit(pallas_query)), uv, reps=args.reps)
    res["xla_ns_pt"] = round(t_x / N * 1e9, 2)
    res["pallas_ns_pt"] = round(t_p / N * 1e9, 2)
    res["speedup"] = round(t_x / t_p, 3)
    res["xla_mpts_s"] = round(N / t_x / 1e6, 2)
    res["pallas_mpts_s"] = round(N / t_p / 1e6, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
