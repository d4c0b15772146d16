"""Field-phase component roofline: where does the 127 ns/pt go?

Times each component of the two-level query chain at FLAGSHIP inference
shapes (coarse feat 128x128x256, fine feat 256x256x16, mlp_norm='group',
chunked points) on the real chip, so kernel effort (VERDICT r4 item 4 —
the fused gather+MLP Pallas kernel) lands where the time actually is:

    proj        projection + depth-normalize (elementwise)
    gather_g    coarse 4-tap bilinear gather (geom.index, C=256)
    gather_l    fine 4-tap bilinear gather (geom.index, C=16)
    mlp_g       coarse MLP chain [N,257]->1 with GroupNorm
    mlp_g_nonorm  same chain, mlp_norm='none' (isolates the GN cost)
    mlp_l       fine MLP chain [N,272]->1 with GroupNorm
    query       the full fused XLA query (MultiResPIFu.query, last_only)

Each timing jits the component alone, warms it, then takes the min of
``--reps`` timed calls ending in a scalar readback (block_until_ready does
not synchronize on the tunneled axon backend).  Components are timed on
the SAME chunk size the reconstructor uses (8192).

Output: one JSON line with ns/pt per component.  Reference hot path this
maps: /root/reference/mesh_util.py:98-114 + MLP.py:12-75.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, *args, reps=8):
    """min-of-reps wall time of jitted fn; scalar-readback synchronized."""
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))  # warm + compile
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = jfn(*args)
        float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        times.append(time.time() - t0)
    return float(np.min(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rgbd_pifuhd_tpu.models.mlp import PointMLP
    from rgbd_pifuhd_tpu.ops import geometry as geom

    N = args.chunk
    rng = np.random.default_rng(0)
    f32 = np.float32

    feat_g = jnp.asarray(rng.standard_normal((1, 128, 128, 256)).astype(f32))
    feat_l = jnp.asarray(rng.standard_normal((1, 256, 256, 16)).astype(f32))
    uv = jnp.asarray(rng.uniform(-0.95, 0.95, (1, N, 2)).astype(f32))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (1, N, 3)).astype(f32))
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    res = {"chunk": N, "device": str(jax.devices()[0])}

    def ns_pt(secs):
        return round(secs / N * 1e9, 1)

    # ---- projection + depth normalize
    def proj(p, c):
        xyz = geom.orthogonal(p, c)
        return geom.depth_normalize(xyz) + geom.in_bounds_mask(xyz)

    res["proj_ns_pt"] = ns_pt(time_fn(proj, pts, calib, reps=args.reps))

    # ---- gathers
    res["gather_g_ns_pt"] = ns_pt(
        time_fn(lambda f, u: geom.index(f, u).sum(), feat_g, uv,
                reps=args.reps))
    res["gather_l_ns_pt"] = ns_pt(
        time_fn(lambda f, u: geom.index(f, u).sum(), feat_l, uv,
                reps=args.reps))

    # ---- MLP chains (flagship dims), with and without GroupNorm
    def mlp_time(dims, res_layers, norm, cin):
        m = PointMLP(filter_channels=dims, merge_layer=2,
                     res_layers=res_layers, norm=norm, last_op="sigmoid")
        x = jnp.asarray(rng.standard_normal((1, N, cin)).astype(f32))
        params = m.init(jax.random.PRNGKey(0), x)
        return time_fn(lambda p, xx: m.apply(p, xx)[0].sum(), params, x,
                       reps=args.reps)

    dims_g = (257, 1024, 512, 256, 128, 1)
    dims_l = (272, 512, 256, 128, 1)
    res["mlp_g_ns_pt"] = ns_pt(mlp_time(dims_g, (2, 3, 4), "group", 257))
    res["mlp_g_nonorm_ns_pt"] = ns_pt(mlp_time(dims_g, (2, 3, 4), "none", 257))
    res["mlp_l_ns_pt"] = ns_pt(mlp_time(dims_l, (1, 2), "group", 272))

    # ---- full two-level query chain (what the reconstructor jits),
    # assembled from the same pieces so no model init is needed
    mg = PointMLP(filter_channels=dims_g, merge_layer=2, res_layers=(2, 3, 4),
                  norm="group", last_op="sigmoid")
    ml = PointMLP(filter_channels=dims_l, merge_layer=-1, res_layers=(1, 2),
                  norm="group", last_op="sigmoid")
    xg = jnp.asarray(rng.standard_normal((1, N, 257)).astype(f32))
    xl = jnp.asarray(rng.standard_normal((1, N, 272)).astype(f32))
    pg = mg.init(jax.random.PRNGKey(0), xg)
    plp = ml.init(jax.random.PRNGKey(1), xl)

    def full_query(pg, plp, points, calib, fg, fl):
        xyz = geom.orthogonal(points, calib)
        sp = geom.depth_normalize(xyz)
        mask = geom.in_bounds_mask(xyz, dims=3)
        f_g = geom.index(fg, xyz[..., :2])
        pred_g, phi = mg.apply(pg, jnp.concatenate([f_g, sp], axis=-1))
        f_l = geom.index(fl, xyz[..., :2])
        pred_l, _ = ml.apply(plp, jnp.concatenate([f_l, phi], axis=-1))
        return (mask * pred_l).sum()

    res["query_ns_pt"] = ns_pt(
        time_fn(full_query, pg, plp, pts, calib, feat_g, feat_l,
                reps=args.reps))

    # derived: unexplained overhead vs sum of parts
    parts = (res["proj_ns_pt"] + res["gather_g_ns_pt"]
             + res["gather_l_ns_pt"] + res["mlp_g_ns_pt"]
             + res["mlp_l_ns_pt"])
    res["sum_parts_ns_pt"] = round(parts, 1)
    res["gn_cost_ns_pt"] = round(
        res["mlp_g_ns_pt"] - res["mlp_g_nonorm_ns_pt"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
