"""Fused gather+MLP Pallas query kernel vs the XLA path (interpret, CPU).

The kernel (ops/pallas_query.fused_gather_mlp) fuses the field-phase hot
loop — bilinear feature gather + z/phi concat + MLP chain (reference:
mesh_util.py:98-114 + MLP.py:12-75) — into one VMEM-resident pass.
Parity targets:

- gather == ops/geometry.grid_sample_bilinear (zeros padding,
  align_corners=True), including out-of-range taps;
- MLP chain == PointMLP (res-layer concats, GroupNorm, leaky_relu,
  merge-layer phi, sigmoid head). GroupNorm stats are per point-TILE, so
  the XLA comparison uses gn_scoped_apply with the same tile size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.models.mlp import PointMLP
from rgbd_pifuhd_tpu.ops import geometry as geom
from rgbd_pifuhd_tpu.ops.pallas_query import (
    fused_gather_mlp, gather_rows_weights, gn_scoped_apply,
    mlp_params_from_tree)


def _gather_via_rows(feat, uv):
    """Recombine the kernel's paired-row gather in NumPy."""
    H, W, C = feat.shape
    rows, wts = gather_rows_weights(jnp.asarray(uv), H, W)
    rows, wts = np.asarray(rows), np.asarray(wts)
    f2 = np.asarray(feat).reshape(H * W, C)
    f2 = np.concatenate([f2, np.zeros((8, C), f2.dtype)])  # kernel pad
    out = (f2[rows[:, 0]] * wts[:, 0:1]
           + f2[rows[:, 0] + 1] * wts[:, 1:2]
           + f2[rows[:, 1]] * wts[:, 2:3]
           + f2[rows[:, 1] + 1] * wts[:, 3:4])
    return out


def test_gather_rows_weights_match_grid_sample(rng):
    H, W, C = 13, 17, 5
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    # include far out-of-range and exactly-on-edge coords
    uv = np.concatenate([
        rng.uniform(-1.3, 1.3, (200, 2)),
        np.array([[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [0.0, 0.0]]),
    ]).astype(np.float32)
    ref = geom.grid_sample_bilinear(jnp.asarray(feat)[None],
                                    jnp.asarray(uv)[None])[0]
    got = _gather_via_rows(feat, uv)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("norm", ["group", "none"])
def test_fused_gather_mlp_matches_xla(rng, norm):
    H, W, C, E = 19, 23, 71, 1         # C forces the 128-pad path
    tile, N = 128, 256                  # two full tiles
    dims = (C + E, 64, 32, 1)
    res = (1,)
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    uv = rng.uniform(-1.1, 1.1, (N, 2)).astype(np.float32)
    extra = rng.standard_normal((N, E)).astype(np.float32)

    m = PointMLP(dims, merge_layer=1, res_layers=res, norm=norm,
                 last_op="sigmoid")
    x = jnp.concatenate(
        [geom.grid_sample_bilinear(jnp.asarray(feat)[None],
                                   jnp.asarray(uv)[None])[0],
         jnp.asarray(extra)], -1)[None]
    params = m.init(jax.random.PRNGKey(0), x)
    if norm == "group":
        ref, phi_ref = gn_scoped_apply(m, params, x, tile)
    else:
        ref, phi_ref = m.apply(params, x)

    weights, gn = mlp_params_from_tree(params["params"], len(dims) - 1,
                                       norm)
    pred, phi = fused_gather_mlp(
        jnp.asarray(feat), jnp.asarray(uv), jnp.asarray(extra), weights,
        gn, res_layers=res, merge_layer=1, tile=tile,
        compute_dtype=jnp.float32, feat_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref[0]),
                               rtol=2e-4, atol=2e-5)


def test_fused_gather_mlp_ragged_n(rng):
    """N not a multiple of the tile: padded points must not leak into
    real outputs (norm='none' — tile-GN stats are only defined for full
    tiles, which is how the pipeline calls it)."""
    H, W, C, E = 9, 9, 8, 2
    dims = (C + E, 24, 1)
    N, tile = 133, 64
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    uv = rng.uniform(-0.9, 0.9, (N, 2)).astype(np.float32)
    extra = rng.standard_normal((N, E)).astype(np.float32)
    m = PointMLP(dims, merge_layer=-1, res_layers=(), norm="none",
                 last_op="sigmoid")
    x = jnp.concatenate(
        [geom.grid_sample_bilinear(jnp.asarray(feat)[None],
                                   jnp.asarray(uv)[None])[0],
         jnp.asarray(extra)], -1)[None]
    params = m.init(jax.random.PRNGKey(0), x)
    ref, _ = m.apply(params, x)
    weights, gn = mlp_params_from_tree(params["params"], len(dims) - 1,
                                       "none")
    pred, _ = fused_gather_mlp(
        jnp.asarray(feat), jnp.asarray(uv), jnp.asarray(extra), weights,
        gn, res_layers=(), merge_layer=-1, tile=tile,
        compute_dtype=jnp.float32, feat_dtype=jnp.float32, interpret=True)
    assert pred.shape == (N, 1)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-5)


def test_fused_chain_two_levels(rng):
    """Coarse phi feeds the fine level (the flagship two-level topology),
    both levels through the kernel, vs the XLA chain."""
    tile = 128
    N = 256
    Hg, Wg, Cg = 16, 16, 31
    Hl, Wl, Cl = 24, 24, 7
    dims_g = (Cg + 1, 64, 32, 1)
    dims_l = (Cl + 32, 32, 1)
    feat_g = rng.standard_normal((Hg, Wg, Cg)).astype(np.float32)
    feat_l = rng.standard_normal((Hl, Wl, Cl)).astype(np.float32)
    uv = rng.uniform(-1.0, 1.0, (N, 2)).astype(np.float32)
    z = rng.standard_normal((N, 1)).astype(np.float32)

    mg = PointMLP(dims_g, merge_layer=1, res_layers=(1,), norm="group",
                  last_op="sigmoid")
    ml = PointMLP(dims_l, merge_layer=-1, res_layers=(), norm="group",
                  last_op="sigmoid")
    fg = geom.grid_sample_bilinear(jnp.asarray(feat_g)[None],
                                   jnp.asarray(uv)[None])[0]
    pg = mg.init(jax.random.PRNGKey(0),
                 jnp.concatenate([fg, jnp.asarray(z)], -1)[None])
    _, phi_ref = gn_scoped_apply(
        mg, pg, jnp.concatenate([fg, jnp.asarray(z)], -1)[None], tile)
    fl = geom.grid_sample_bilinear(jnp.asarray(feat_l)[None],
                                   jnp.asarray(uv)[None])[0]
    pl = ml.init(jax.random.PRNGKey(1),
                 jnp.concatenate([fl, phi_ref[0]], -1)[None])
    ref, _ = gn_scoped_apply(
        ml, pl, jnp.concatenate([fl, phi_ref[0]], -1)[None], tile)

    wg, gng = mlp_params_from_tree(pg["params"], len(dims_g) - 1, "group")
    wl, gnl = mlp_params_from_tree(pl["params"], len(dims_l) - 1, "group")
    _, phi = fused_gather_mlp(
        jnp.asarray(feat_g), jnp.asarray(uv), jnp.asarray(z), wg, gng,
        res_layers=(1,), merge_layer=1, tile=tile,
        compute_dtype=jnp.float32, feat_dtype=jnp.float32, interpret=True)
    pred, _ = fused_gather_mlp(
        jnp.asarray(feat_l), jnp.asarray(uv), phi, wl, gnl,
        res_layers=(), merge_layer=-1, tile=tile,
        compute_dtype=jnp.float32, feat_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(ref[0]),
                               rtol=5e-4, atol=5e-5)
