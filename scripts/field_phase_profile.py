"""Field-phase component roofline: where does the ~127 ns/pt go?

Times each component of the two-level query chain at FLAGSHIP inference
shapes (coarse feat 128x128x256, fine feat 256x256x16, mlp_norm='group',
8192-pt chunks) on the real chip, so kernel effort (VERDICT r4 item 4 —
the fused gather+MLP Pallas kernel) lands where the time actually is.

Methodology — the tunnel adds ~25 ms of dispatch/readback RTT per call,
swamping any single-call timing (first version of this script measured
every component at an identical ~3100 ns/pt = pure RTT).  So each
component is SELF-CHAINED through a lax.scan carry (defeats CSE) and run
at two iteration counts; the SLOPE (t_hi - t_lo) / (iters_hi - iters_lo)
is the pure per-iteration device time, RTT cancelled.  Scalar readback
ends every timing (block_until_ready does not sync on this backend).

Components:
    proj          projection + depth-normalize + mask (elementwise)
    gather_g      coarse 4-tap bilinear gather (geom.index, C=256)
    gather_l      fine 4-tap bilinear gather (geom.index, C=16)
    mlp_g         coarse MLP chain [N,257]->1, GroupNorm
    mlp_g_nonorm  same chain, mlp_norm='none' (isolates GN cost)
    mlp_l         fine MLP chain [N,272]->1, GroupNorm
    query         full two-level chain (what the reconstructor jits)

Reference hot path this maps: /root/reference/mesh_util.py:98-114 +
MLP.py:12-75.  Output: one JSON line, ns/pt per component.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_slope_time(step_fn, init, iters_lo=8, iters_hi=104, reps=4,
                    label=""):
    """Per-iteration seconds of ``step_fn`` (carry -> carry), RTT-free.

    Jits lax.scan at two lengths; returns the min-over-reps slope.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def run(n):
        def body(c, _):
            return step_fn(c), None

        f = jax.jit(lambda c: jax.tree.map(
            lambda a: a.astype(jnp.float32).ravel()[0],
            lax.scan(body, c, None, length=n)[0]))
        t0 = time.time()
        out = f(init)
        jax.tree.map(float, out)  # warm/compile
        print(f"[profile] scan n={n} compiled+warm in "
              f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = f(init)
            jax.tree.map(float, out)
            ts.append(time.time() - t0)
        return float(np.min(ts))

    if label:
        print(f"[profile] timing {label}", file=sys.stderr, flush=True)
    t_lo, t_hi = run(iters_lo), run(iters_hi)
    return max(t_hi - t_lo, 1e-12) / (iters_hi - iters_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rgbd_pifuhd_tpu.models.mlp import PointMLP
    from rgbd_pifuhd_tpu.ops import geometry as geom
    from rgbd_pifuhd_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()  # reruns skip the slow tunnel compiles

    N = args.chunk
    rng = np.random.default_rng(0)
    f32 = np.float32

    feat_g = jnp.asarray(rng.standard_normal((1, 128, 128, 256)).astype(f32))
    feat_l = jnp.asarray(rng.standard_normal((1, 256, 256, 16)).astype(f32))
    uv = jnp.asarray(rng.uniform(-0.95, 0.95, (1, N, 2)).astype(f32))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (1, N, 3)).astype(f32))
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    res = {"chunk": N, "device": str(jax.devices()[0]),
           "method": "lax.scan slope (RTT-cancelled)"}

    def ns_pt(secs):
        return round(secs / N * 1e9, 2)

    kw = dict(reps=args.reps)

    # ---- projection + depth normalize + mask (carry: points)
    def proj_step(p):
        xyz = geom.orthogonal(p, calib)
        return p + 1e-7 * (geom.depth_normalize(xyz)
                           + geom.in_bounds_mask(xyz))

    res["proj_ns_pt"] = ns_pt(scan_slope_time(proj_step, pts, label="proj", **kw))

    # ---- gathers (carry: uv, nudged by the gathered values)
    res["gather_g_ns_pt"] = ns_pt(scan_slope_time(
        lambda u: u + 1e-9 * geom.index(feat_g, u)[..., :2], uv, label="gather_g", **kw))
    res["gather_l_ns_pt"] = ns_pt(scan_slope_time(
        lambda u: u + 1e-9 * geom.index(feat_l, u)[..., :2], uv, label="gather_l", **kw))

    # ---- MLP chains (carry: input features, nudged by pred)
    def mlp_slope(dims, res_layers, norm, cin, merge):
        m = PointMLP(filter_channels=dims, merge_layer=merge,
                     res_layers=res_layers, norm=norm, last_op="sigmoid")
        x = jnp.asarray(rng.standard_normal((1, N, cin)).astype(f32))
        params = m.init(jax.random.PRNGKey(0), x)
        return scan_slope_time(
            lambda c: c + 1e-9 * m.apply(params, c)[0], x, label=f"mlp{dims}-{norm}", **kw)

    dims_g = (257, 1024, 512, 256, 128, 1)
    dims_l = (272, 512, 256, 128, 1)
    res["mlp_g_ns_pt"] = ns_pt(mlp_slope(dims_g, (2, 3, 4), "group", 257, 2))
    res["mlp_g_nonorm_ns_pt"] = ns_pt(
        mlp_slope(dims_g, (2, 3, 4), "none", 257, 2))
    res["mlp_l_ns_pt"] = ns_pt(mlp_slope(dims_l, (1, 2), "group", 272, -1))

    # ---- full two-level query chain (carry: points)
    mg = PointMLP(filter_channels=dims_g, merge_layer=2, res_layers=(2, 3, 4),
                  norm="group", last_op="sigmoid")
    ml = PointMLP(filter_channels=dims_l, merge_layer=-1, res_layers=(1, 2),
                  norm="group", last_op="sigmoid")
    xg = jnp.asarray(rng.standard_normal((1, N, 257)).astype(f32))
    xl = jnp.asarray(rng.standard_normal((1, N, 272)).astype(f32))
    pg = mg.init(jax.random.PRNGKey(0), xg)
    plp = ml.init(jax.random.PRNGKey(1), xl)

    def query_step(points):
        xyz = geom.orthogonal(points, calib)
        sp = geom.depth_normalize(xyz)
        mask = geom.in_bounds_mask(xyz, dims=3)
        f_g = geom.index(feat_g, xyz[..., :2])
        _, phi = mg.apply(pg, jnp.concatenate([f_g, sp], axis=-1))
        f_l = geom.index(feat_l, xyz[..., :2])
        pred_l, _ = ml.apply(plp, jnp.concatenate([f_l, phi], axis=-1))
        return points + 1e-7 * (mask * pred_l)

    res["query_ns_pt"] = ns_pt(scan_slope_time(query_step, pts, label="query", **kw))

    parts = (res["proj_ns_pt"] + res["gather_g_ns_pt"]
             + res["gather_l_ns_pt"] + res["mlp_g_ns_pt"]
             + res["mlp_l_ns_pt"])
    res["sum_parts_ns_pt"] = round(parts, 2)
    res["gn_cost_ns_pt"] = round(
        res["mlp_g_ns_pt"] - res["mlp_g_nonorm_ns_pt"], 2)
    # MFU of the coarse MLP alone (the flop-dominant component)
    import types

    from rgbd_pifuhd_tpu.utils.flops import (
        device_peak_flops, mlp_flops_per_point)
    per_pt_flops = mlp_flops_per_point(types.SimpleNamespace(
        mlp_dim=dims_g, mlp_res_layers=(2, 3, 4)))
    if per_pt_flops:
        peak = device_peak_flops(jax.devices()[0])
        if peak:
            res["mlp_g_mfu"] = round(
                per_pt_flops / (res["mlp_g_ns_pt"] * 1e-9) / peak, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
