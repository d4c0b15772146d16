"""Sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.parallel import (
    make_device_mesh,
    shard_points_query,
)
from rgbd_pifuhd_tpu.recon.grid import eval_grid_two_phase, eval_grid_dense


def test_mesh_all_devices():
    mesh = make_device_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def sphere_occ(world_pts, center, radius):
    d = jnp.linalg.norm(world_pts - center, axis=-1)
    return jax.nn.sigmoid((radius - d) * 40.0)


def test_sharded_query_matches_single_device():
    mesh = make_device_mesh()
    sharded = shard_points_query(sphere_occ, mesh)
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1024, 3)).astype(np.float32))
    center = jnp.zeros(3)
    a = np.asarray(sphere_occ(pts, center, 0.5))
    b = np.asarray(jax.jit(sharded)(pts, center, 0.5))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_sharded_grid_eval_matches_dense():
    """The full two-phase evaluator with a sharded query on 8 devices."""
    mesh = make_device_mesh()
    sharded = shard_points_query(sphere_occ, mesh)
    res = 32
    calib_inv = jnp.eye(4)
    center = jnp.array([0.05, 0.0, -0.1])

    dense = np.asarray(eval_grid_dense(sphere_occ, res, calib_inv,
                                       center, 0.55))
    two, _diag = eval_grid_two_phase(sharded, res, calib_inv, center, 0.55,
                                     factor=4, budget_cells=128,
                                     cells_per_chunk=32)
    two = np.asarray(two)
    near = np.abs(dense - 0.5) < 0.2
    assert near.sum() > 50
    np.testing.assert_allclose(two[near], dense[near], atol=1e-6)


def test_sharded_three_phase_matches_dense():
    """The three-level evaluator with a sharded query on 8 devices."""
    from rgbd_pifuhd_tpu.recon.grid import (
        eval_grid_three_phase_sparse, densify_sparse3_volume)

    mesh = make_device_mesh()
    sharded = shard_points_query(sphere_occ, mesh)
    res = 64
    center = jnp.array([0.05, 0.0, -0.1])
    dense = np.asarray(eval_grid_dense(sphere_occ, res, jnp.eye(4),
                                       center, 0.55))
    corner, top8, sub, top4, ref, _diag = eval_grid_three_phase_sparse(
        sharded, res, jnp.eye(4), center, 0.55,
        budget_cells=256, budget_subcells=1024, cells_per_chunk=256)
    vol = densify_sparse3_volume(np.asarray(corner), np.asarray(top8),
                                 np.asarray(sub), np.asarray(top4),
                                 np.asarray(ref), res)
    near = np.abs(dense - 0.5) < 0.1
    assert near.sum() > 50
    np.testing.assert_allclose(vol[near], dense[near], atol=0.01)
    assert ((vol > 0.5) == (dense > 0.5)).mean() > 0.999


def test_sharded_model_query_runs(rng):
    """MultiResPIFu query wrapped with shard_map over the point axis."""
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from tests.test_models_pifu import tiny_global, tiny_local

    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())
    img_l = jnp.asarray(rng.standard_normal((1, 1, 32, 32, 6)).astype(np.float32))
    img_g = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    calib = jnp.eye(4, dtype=jnp.float32)
    pts0 = jnp.zeros((1, 1, 8, 3), jnp.float32)
    labels = jnp.zeros((1, 1, 8, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img_l, img_g, pts0,
                        calib[None, None], calib[None], labels)

    g_feats = model.apply(params, img_g, method=MultiResPIFu.filter_global)
    l_feats = model.apply(params, img_l, g_feats,
                          method=MultiResPIFu.filter_local)

    def query(world_pts, params, l_feats, g_feats, calib):
        out = model.apply(params, l_feats, g_feats, world_pts[None, None],
                          calib[None, None], calib[None],
                          method=MultiResPIFu.query)
        return out.preds[0, :, 0]

    mesh = make_device_mesh()
    sharded = shard_points_query(query, mesh)
    pts = jnp.asarray(rng.uniform(-1, 1, (2048, 3)).astype(np.float32))

    a = np.asarray(query(pts, params, l_feats, g_feats, calib))
    b = np.asarray(jax.jit(sharded)(pts, params, l_feats, g_feats, calib))
    # tiny configs use mlp_norm='none' so sharding must be exact
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_reconstructor_mesh_shards_query_and_colors(rng, tmp_path):
    """Reconstructor(mesh=...) shards BOTH the grid query and the vertex
    coloring chunk axis over 8 devices; the exported mesh (geometry AND
    uint8 colors) must be value-identical to the single-device run."""
    import os
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.mesh import load_obj
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global, tiny_local

    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())
    img_l = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    img_g = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    calib = jnp.eye(4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img_l[None], img_g,
                        jnp.zeros((1, 1, 8, 3), jnp.float32),
                        calib[None, None], calib[None],
                        jnp.zeros((1, 1, 8, 1), jnp.float32))

    mesh = make_device_mesh()
    opt = Options(resolution=32, use_octree=True)
    recon_mesh = Reconstructor(model, params, opt, mesh=mesh)
    recon_one = Reconstructor(model, params, opt)
    data = {"img": img_l, "img_512": img_g, "calib": calib}

    p_m = str(tmp_path / "mesh.obj")
    p_1 = str(tmp_path / "one.obj")
    recon_mesh.gen_mesh(data, p_m, resolution=32)
    recon_one.gen_mesh(data, p_1, resolution=32)
    v_m, f_m, c_m = load_obj(p_m)
    v_1, f_1, c_1 = load_obj(p_1)
    assert len(v_m) == len(v_1) and f_m.shape == f_1.shape
    o_m, o_1 = np.lexsort(v_m.T), np.lexsort(v_1.T)
    # tiny configs use mlp_norm='none' -> sharding must be value-identical
    np.testing.assert_allclose(v_m[o_m], v_1[o_1], atol=1e-5)
    np.testing.assert_allclose(c_m[o_m], c_1[o_1], atol=2.0 / 255.0)

    # image-color path shards too (its own vertex ordering: it goes
    # through the one-shot kernel, not the incremental overlap)
    p_mc = str(tmp_path / "mesh_c.obj")
    p_1c = str(tmp_path / "one_c.obj")
    recon_mesh.gen_mesh_img_color(data, p_mc, resolution=32)
    recon_one.gen_mesh_img_color(data, p_1c, resolution=32)
    vc_m, _, ci_m = load_obj(p_mc)
    vc_1, _, ci_1 = load_obj(p_1c)
    oc_m, oc_1 = np.lexsort(vc_m.T), np.lexsort(vc_1.T)
    np.testing.assert_allclose(vc_m[oc_m], vc_1[oc_1], atol=1e-5)
    np.testing.assert_allclose(ci_m[oc_m], ci_1[oc_1], atol=2.0 / 255.0)


def test_reconstructor_with_sharded_query(rng, tmp_path):
    """Full Reconstructor pipeline with the query sharded over 8 devices."""
    import os
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global, tiny_local

    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())
    img_l = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    img_g = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    calib = jnp.eye(4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img_l[None], img_g,
                        jnp.zeros((1, 1, 8, 3), jnp.float32),
                        calib[None, None], calib[None],
                        jnp.zeros((1, 1, 8, 1), jnp.float32))

    mesh = make_device_mesh()
    opt = Options(resolution=32, use_octree=True)
    sharder = lambda q: shard_points_query(q, mesh)
    recon_sharded = Reconstructor(model, params, opt, sharded_query=sharder)
    recon_single = Reconstructor(model, params, opt)

    data = {"img": img_l, "img_512": img_g, "calib": calib}
    out_s = recon_sharded.gen_mesh(data, str(tmp_path / "s.obj"),
                                   resolution=32)
    out_1 = recon_single.gen_mesh(data, str(tmp_path / "o.obj"),
                                  resolution=32)
    # tiny configs use mlp_norm='none' -> sharding must be value-identical
    assert len(out_s["verts"]) == len(out_1["verts"])
    np.testing.assert_allclose(
        np.sort(out_s["verts"], axis=0), np.sort(out_1["verts"], axis=0),
        atol=1e-4)
