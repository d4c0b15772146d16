"""Reconstruction-layer tests: grid evaluators, marching tetrahedra, OBJ IO,
and the end-to-end Reconstructor machinery."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.recon.grid import (
    eval_grid_dense,
    eval_grid_two_phase,
    create_grid_transform,
)
from rgbd_pifuhd_tpu.recon.marching import marching_tetrahedra
from rgbd_pifuhd_tpu.recon.mesh import (
    save_obj_with_color,
    load_obj,
    keep_largest_component,
    connected_components,
    compute_vertex_normals,
)


def sphere_occ(world_pts, center, radius):
    """Analytic soft occupancy: 0.5 exactly on the radius."""
    d = jnp.linalg.norm(world_pts - center, axis=-1)
    return jax.nn.sigmoid((radius - d) * 40.0)


def test_two_phase_matches_dense_near_surface():
    res = 64
    center = jnp.array([0.1, -0.05, 0.0])
    calib_inv = jnp.eye(4)

    dense = np.asarray(
        eval_grid_dense(sphere_occ, res, calib_inv, center, 0.5))
    two, diag = eval_grid_two_phase(sphere_occ, res, calib_inv, center, 0.5,
                                    factor=8, budget_cells=256,
                                    cells_per_chunk=64)
    two = np.asarray(two)
    assert int(diag["budget_cells"]) == 256
    assert int(diag["n_active"]) <= 256  # small sphere fits the budget
    # wherever the dense field is anywhere near the threshold, the two-phase
    # evaluator must have refined and match exactly
    near = np.abs(dense - 0.5) < 0.2
    assert near.sum() > 100
    np.testing.assert_array_equal(two[near], dense[near])
    # and the fill regions stay on the correct side of the threshold
    assert ((two > 0.5) == (dense > 0.5)).mean() > 0.999


def test_end_to_end_sphere_mesh(tmp_path):
    """Analytic field -> volume -> marching -> world transform -> OBJ."""
    res = 64
    radius = 0.6
    # non-trivial calib: scale 2x + translation
    calib = np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32)
    calib[:3, 3] = [0.1, 0.2, -0.05]
    calib_inv = jnp.asarray(np.linalg.inv(calib))

    # world-space sphere centered where NDC 0 maps to
    c_world = np.linalg.inv(calib) @ np.array([0.0, 0.0, 0.0, 1.0])
    center = jnp.asarray(c_world[:3])
    # world radius = radius / 0.5 (calib scales world->NDC by 0.5)
    w_radius = radius / 0.5

    vol, _ = eval_grid_two_phase(sphere_occ, res, calib_inv, center, w_radius,
                                 factor=8, budget_cells=512,
                                 cells_per_chunk=128)
    vol = np.asarray(vol)
    verts_idx, faces = marching_tetrahedra(vol, 0.5)
    assert len(verts_idx) > 500

    mat = create_grid_transform(res)
    trans = np.linalg.inv(calib) @ mat
    verts = verts_idx @ trans[:3, :3].T + trans[:3, 3]

    r = np.linalg.norm(verts - c_world[:3], axis=1)
    np.testing.assert_allclose(r.mean(), w_radius, rtol=0.02)
    assert r.std() < 0.02 * w_radius

    # OBJ roundtrip
    path = os.path.join(tmp_path, "sphere.obj")
    colors = np.tile([[1.0, 0.0, 0.5]], (len(verts), 1))
    save_obj_with_color(path, verts, faces, colors)
    v2, f2, c2 = load_obj(path)
    assert v2.shape == verts.shape
    assert f2.shape == faces.shape
    np.testing.assert_allclose(v2, verts, atol=1e-3)
    np.testing.assert_allclose(c2[0], [1.0, 0.0, 0.5], atol=1e-4)
    # writer flips winding: f v0 v2 v1 (mesh_util.py:197)
    np.testing.assert_array_equal(f2[:, [0, 2, 1]], faces)


def test_connected_components_and_cleaning():
    # two separate triangles, one tall (axis 0), one short
    verts = np.array([
        [0, 0, 0], [5, 0, 0], [0, 1, 0],       # tall in x
        [10, 10, 10], [10.5, 10, 10], [10, 10.5, 10],
    ], dtype=np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    labels = connected_components(6, faces)
    assert len(np.unique(labels)) == 2
    v, f, _ = keep_largest_component(verts, faces, axis=0)
    assert len(v) == 3 and len(f) == 1
    np.testing.assert_allclose(v[f[0]][:, 0].max(), 5.0)


def test_vertex_normals_sphere():
    n = 32
    g = np.mgrid[:n, :n, :n].astype(np.float64)
    d = np.sqrt(((g - n / 2) ** 2).sum(0))
    vol = 1.0 / (1.0 + np.exp(d - 10.0))
    verts, faces = marching_tetrahedra(vol, 0.5)
    nrm = compute_vertex_normals(verts, faces)
    radial = verts - n / 2
    radial /= np.linalg.norm(radial, axis=1, keepdims=True)
    cos = (nrm * radial).sum(1)
    assert cos.mean() > 0.98  # outward, aligned with radial direction


def test_reconstructor_machinery(rng, tmp_path):
    """Untrained tiny model: pipeline must still run end-to-end and export."""
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global, tiny_local

    opt = Options(resolution=32, use_octree=True)
    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())

    img_l = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    img_g = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    calib = jnp.eye(4, dtype=jnp.float32)
    pts = jnp.zeros((1, 1, 8, 3), jnp.float32)
    labels = jnp.zeros((1, 1, 8, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img_l[None], img_g, pts,
                        calib[None, None], calib[None], labels)

    recon = Reconstructor(model, params, opt)
    data = {"img": img_l, "img_512": img_g, "calib": calib}
    out = recon.gen_mesh(data, os.path.join(tmp_path, "out.obj"),
                         resolution=32)
    assert os.path.exists(os.path.join(tmp_path, "out.obj"))
    assert out["verts"].shape[1] == 3
    v, f, c = load_obj(os.path.join(tmp_path, "out.obj"))
    assert len(v) == len(out["verts"]) and c is not None


def test_reconstructor_grad_normal_mode(rng, tmp_path):
    """normal_mode='grad' (one-VJP autodiff normals) end to end: same
    pipeline, colors from the exact field gradient instead of 4 fd taps."""
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global, tiny_local

    opt = Options(resolution=32, use_octree=True, normal_mode="grad")
    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())

    img_l = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    img_g = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    calib = jnp.eye(4, dtype=jnp.float32)
    pts = jnp.zeros((1, 1, 8, 3), jnp.float32)
    labels = jnp.zeros((1, 1, 8, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img_l[None], img_g, pts,
                        calib[None, None], calib[None], labels)

    recon = Reconstructor(model, params, opt)
    data = {"img": img_l, "img_512": img_g, "calib": calib}
    out = recon.gen_mesh(data, os.path.join(tmp_path, "grad.obj"),
                         resolution=32)
    v, f, c = load_obj(os.path.join(tmp_path, "grad.obj"))
    assert len(v) == len(out["verts"]) and c is not None
    # colors decode to unit-normal encodings: |2c-1| close to 1
    mag = np.linalg.norm(np.asarray(c) * 2.0 - 1.0, axis=-1)
    assert np.all(mag < 1.1) and np.median(mag) > 0.5


def test_reconstructor_mesh_normal_mode(rng, tmp_path):
    """normal_mode='mesh' (host geometric normals, zero device color work)
    end to end: colors decode to unit normals that agree in orientation
    with the fd field normals of the same surface."""
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
    data = {"img": img_l, "img_512": img_g, "calib": calib}

    recon_m = Reconstructor(model, params,
                            Options(resolution=32, normal_mode="mesh"))
    p_m = os.path.join(tmp_path, "mesh.obj")
    out = recon_m.gen_mesh(data, p_m, resolution=32)
    v_m, f_m, c_m = load_obj(p_m)
    assert len(v_m) == len(out["verts"]) and c_m is not None
    n_mesh = np.asarray(c_m) * 2.0 - 1.0
    mag = np.linalg.norm(n_mesh, axis=-1)
    np.testing.assert_allclose(mag, 1.0, atol=0.02)  # unit (quantization)

    recon_f = Reconstructor(model, params, Options(resolution=32))
    p_f = os.path.join(tmp_path, "fd.obj")
    recon_f.gen_mesh(data, p_f, resolution=32)
    v_f, _, c_f = load_obj(p_f)
    assert len(v_f) == len(v_m)
    o_m, o_f = np.lexsort(v_m.T), np.lexsort(v_f.T)
    np.testing.assert_allclose(v_m[o_m], v_f[o_f], atol=1e-5)
    n_fd = np.asarray(c_f)[o_f] * 2.0 - 1.0
    n_fd /= np.maximum(np.linalg.norm(n_fd, axis=-1, keepdims=True), 1e-6)
    cos = (n_mesh[o_m] * n_fd).sum(-1)
    assert np.median(cos) > 0.5  # same surface, same orientation


def test_gen_mesh_overlap_matches_sequential(rng, tmp_path, monkeypatch):
    """The slab-pipelined marching+coloring path (IncrementalMarcher3)
    exports the same mesh as the sequential extract->color path: identical
    vertex set and near-identical fd-normal colors (positions go up in u16
    bbox fixed-point whose lo/scale may differ between the paths)."""
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon import marching as marching_mod
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global, tiny_local

    if not marching_mod.IncrementalMarcher3.supported():
        import pytest
        pytest.skip("native marching lib unavailable")

    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())
    img_l = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    img_g = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    calib = jnp.eye(4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img_l[None], img_g,
                        jnp.zeros((1, 1, 8, 3), jnp.float32),
                        calib[None, None], calib[None],
                        jnp.zeros((1, 1, 8, 1), jnp.float32))
    recon = Reconstructor(model, params, Options(resolution=32))
    data = {"img": img_l, "img_512": img_g, "calib": calib}

    p_ov = os.path.join(tmp_path, "overlap.obj")
    out_ov = recon.gen_mesh(data, p_ov, resolution=32)
    monkeypatch.setattr(marching_mod.IncrementalMarcher3, "supported",
                        staticmethod(lambda: False))
    p_sq = os.path.join(tmp_path, "sequential.obj")
    out_sq = recon.gen_mesh(data, p_sq, resolution=32)

    v1, f1, c1 = load_obj(p_ov)
    v2, f2, c2 = load_obj(p_sq)
    assert len(v1) == len(v2) == len(out_ov["verts"]) == len(out_sq["verts"])
    assert f1.shape == f2.shape
    o1, o2 = np.lexsort(v1.T), np.lexsort(v2.T)
    np.testing.assert_allclose(v1[o1], v2[o2], atol=1e-5)
    np.testing.assert_allclose(c1[o1], c2[o2], atol=6.0 / 255.0)
    # triangle geometry identical
    t1 = v1[f1].reshape(-1, 9)
    t2 = v2[f2].reshape(-1, 9)
    np.testing.assert_allclose(t1[np.lexsort(t1.T)], t2[np.lexsort(t2.T)],
                               atol=1e-5)


def test_gen_mesh_streamed_flag_off_matches(rng, tmp_path):
    """streamed_recon=False selects the one-shot-transfer + slab-overlap
    path; its mesh must canonically match the band-streamed default
    (which marches cells in data-arrival order, so indices permute but
    the vertex set and triangle geometry are identical)."""
    import dataclasses

    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon import marching as marching_mod
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global, tiny_local

    if not marching_mod.IncrementalMarcher3.supported():
        import pytest
        pytest.skip("native marching lib unavailable")

    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())
    img_l = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    img_g = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    calib = jnp.eye(4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img_l[None], img_g,
                        jnp.zeros((1, 1, 8, 3), jnp.float32),
                        calib[None, None], calib[None],
                        jnp.zeros((1, 1, 8, 1), jnp.float32))
    data = {"img": img_l, "img_512": img_g, "calib": calib}

    p_st = os.path.join(tmp_path, "streamed.obj")
    out_st = Reconstructor(model, params, Options(resolution=32)).gen_mesh(
        data, p_st, resolution=32)
    opt_slab = dataclasses.replace(Options(resolution=32),
                                   streamed_recon=False)
    p_sl = os.path.join(tmp_path, "slab.obj")
    out_sl = Reconstructor(model, params, opt_slab).gen_mesh(
        data, p_sl, resolution=32)

    v1, f1, _ = load_obj(p_st)
    v2, f2, _ = load_obj(p_sl)
    assert len(v1) == len(v2) == len(out_st["verts"]) == len(out_sl["verts"])
    assert f1.shape == f2.shape
    o1, o2 = np.lexsort(v1.T), np.lexsort(v2.T)
    np.testing.assert_allclose(v1[o1], v2[o2], atol=1e-5)
    t1 = v1[f1].reshape(-1, 9)
    t2 = v2[f2].reshape(-1, 9)
    np.testing.assert_allclose(t1[np.lexsort(t1.T)], t2[np.lexsort(t2.T)],
                               atol=1e-5)


def test_ply_roundtrip_matches_obj(rng, tmp_path):
    """Binary PLY writer: round-trips exactly and agrees with the OBJ
    writer on geometry, winding, and (uint8-quantized) colors."""
    from rgbd_pifuhd_tpu.recon.mesh import save_ply_with_color, load_ply

    verts = rng.standard_normal((100, 3)).astype(np.float32)
    faces = rng.integers(0, 100, (60, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (100, 3)).astype(np.float32)

    ply = os.path.join(tmp_path, "m.ply")
    obj = os.path.join(tmp_path, "m.obj")
    save_ply_with_color(ply, verts, faces, colors)
    save_obj_with_color(obj, verts, faces, colors)

    pv, pf, pc = load_ply(ply)
    ov, of, oc = load_obj(obj)
    np.testing.assert_array_equal(pv, verts)
    np.testing.assert_array_equal(pf, faces)       # load_ply un-flips back
    # load_obj returns the on-disk (flipped) winding; both writers flip
    # identically, so the OBJ faces are the PLY faces re-flipped
    np.testing.assert_array_equal(of, pf[:, [0, 2, 1]])
    np.testing.assert_allclose(pc, colors, atol=1.0 / 255.0 + 1e-7)
    # colorless variant
    save_ply_with_color(ply, verts, faces, None)
    pv, pf, pc = load_ply(ply)
    np.testing.assert_array_equal(pv, verts)
    assert pc is None


def test_gen_mesh_ply_export(rng, tmp_path):
    """gen_mesh with a .ply save path uses the binary writer end to end."""
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.mesh import load_ply
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
    recon = Reconstructor(model, params, Options(resolution=32))
    data = {"img": img_l, "img_512": img_g, "calib": calib}
    p = os.path.join(tmp_path, "out.ply")
    out = recon.gen_mesh(data, p, resolution=32)
    v, f, c = load_ply(p)
    assert len(v) == len(out["verts"]) and c is not None
    np.testing.assert_allclose(v, out["verts"], rtol=1e-6)
    np.testing.assert_array_equal(f, out["faces"])


def test_sparse_two_phase_matches_dense():
    from rgbd_pifuhd_tpu.recon.grid import (
        eval_grid_two_phase_sparse, densify_sparse_volume)
    res = 64
    center = jnp.array([0.1, -0.05, 0.0])
    calib_inv = jnp.eye(4)
    dense = np.asarray(
        eval_grid_dense(sphere_occ, res, calib_inv, center, 0.5))
    corner, top_idx, refined, _diag = eval_grid_two_phase_sparse(
        sphere_occ, res, calib_inv, center, 0.5,
        factor=8, budget_cells=256, cells_per_chunk=64)
    vol = densify_sparse_volume(corner, top_idx, refined, res, factor=8)
    # 4-bit band quantization: step = (1/15)/band_scale(4) ~ 0.0167 in
    # occupancy units inside the band |occ - 0.5| < 0.125
    near = np.abs(dense - 0.5) < 0.1
    assert near.sum() > 50
    np.testing.assert_allclose(vol[near], dense[near], atol=0.01)
    # topology (threshold side) must be exact everywhere
    assert ((vol > 0.5) == (dense > 0.5)).mean() > 0.999

    # 8-bit path too
    corner, top_idx, refined, _diag = eval_grid_two_phase_sparse(
        sphere_occ, res, calib_inv, center, 0.5,
        factor=8, budget_cells=256, cells_per_chunk=64, pack_bits=8)
    vol8 = densify_sparse_volume(corner, top_idx, refined, res, factor=8,
                                 pack_bits=8)
    np.testing.assert_allclose(vol8[near], dense[near], atol=0.002)


def test_sparse_direct_marching_matches_densified():
    """marching_tetrahedra_sparse (no dense volume) produces the identical
    mesh to densify + masked marching."""
    from rgbd_pifuhd_tpu.recon.grid import (
        eval_grid_two_phase_sparse, densify_sparse_volume, sparse_scan_cells)
    from rgbd_pifuhd_tpu.recon.marching import (
        marching_tetrahedra_cells, marching_tetrahedra_sparse)

    res = 64
    corner, top, ref, _ = eval_grid_two_phase_sparse(
        sphere_occ, res, jnp.eye(4), jnp.array([0.1, -0.05, 0.0]), 0.6,
        factor=8, budget_cells=512, cells_per_chunk=128)
    corner, top, ref = np.asarray(corner), np.asarray(top), np.asarray(ref)
    cells, marks = sparse_scan_cells(corner, top, res, factor=8)
    vol = densify_sparse_volume(corner, top, ref, res, factor=8,
                                scan_marks=marks)
    v1, f1 = marching_tetrahedra_cells(vol, cells, factor=8)
    v2, f2 = marching_tetrahedra_sparse(corner, top, ref, cells, res,
                                        factor=8)
    assert len(v2) > 500
    assert v1.shape == v2.shape and f1.shape == f2.shape
    np.testing.assert_allclose(v1[np.lexsort(v1.T)], v2[np.lexsort(v2.T)],
                               atol=1e-5)

    # 8-bit packing path
    corner, top, ref, _ = eval_grid_two_phase_sparse(
        sphere_occ, res, jnp.eye(4), jnp.array([0.1, -0.05, 0.0]), 0.6,
        factor=8, budget_cells=512, cells_per_chunk=128, pack_bits=8)
    corner, top, ref = np.asarray(corner), np.asarray(top), np.asarray(ref)
    cells, marks = sparse_scan_cells(corner, top, res, factor=8, pack_bits=8)
    vol = densify_sparse_volume(corner, top, ref, res, factor=8,
                                scan_marks=marks, pack_bits=8)
    v1, f1 = marching_tetrahedra_cells(vol, cells, factor=8)
    v2, f2 = marching_tetrahedra_sparse(corner, top, ref, cells, res,
                                        factor=8, pack_bits=8)
    assert v1.shape == v2.shape
    np.testing.assert_allclose(v1[np.lexsort(v1.T)], v2[np.lexsort(v2.T)],
                               atol=1e-5)


def test_three_phase_matches_dense_and_sparse3_marching():
    """Three-level evaluation (stride 8->4->1): near-surface values match
    dense within quantization, topology is exact, and the native
    sparse3-direct marching equals the densify3 oracle."""
    from rgbd_pifuhd_tpu.recon.grid import (
        eval_grid_three_phase_sparse, densify_sparse3_volume,
        sparse_scan_cells)
    from rgbd_pifuhd_tpu.recon.marching import (
        marching_tetrahedra_cells, marching_tetrahedra_sparse3)

    res = 64
    center = jnp.array([0.1, -0.05, 0.0])
    dense = np.asarray(eval_grid_dense(sphere_occ, res, jnp.eye(4),
                                       center, 0.5))
    corner, top8, sub, top4, ref, diag = eval_grid_three_phase_sparse(
        sphere_occ, res, jnp.eye(4), center, 0.5,
        budget_cells=256, budget_subcells=1024, cells_per_chunk=256)
    assert int(diag["n_active"]) <= 256
    assert int(diag["n_active_subcells"]) <= 1024
    corner, top8, sub, top4, ref = map(
        np.asarray, (corner, top8, sub, top4, ref))
    vol = densify_sparse3_volume(corner, top8, sub, top4, ref, res)
    near = np.abs(dense - 0.5) < 0.1
    assert near.sum() > 50
    np.testing.assert_allclose(vol[near], dense[near], atol=0.01)
    assert ((vol > 0.5) == (dense > 0.5)).mean() > 0.999

    cells, _ = sparse_scan_cells(corner, top8, res, factor=8)
    v1, f1 = marching_tetrahedra_cells(vol, cells, factor=8)
    v3, f3 = marching_tetrahedra_sparse3(corner, top8, sub, top4, ref,
                                         cells, res)
    assert len(v3) > 500
    assert v1.shape == v3.shape and f1.shape == f3.shape
    np.testing.assert_allclose(v1[np.lexsort(v1.T)], v3[np.lexsort(v3.T)],
                               atol=1e-5)
    # sphere geometry sanity on the sparse3 mesh
    r = np.linalg.norm(v3 * (2.0 / res) - 1.0 - np.asarray(center), axis=1)
    np.testing.assert_allclose(np.median(r), 0.5, atol=0.02)


def test_incremental_marcher_matches_one_shot():
    """Slab-incremental mt3 session == one-shot sparse3 marching, exactly:
    same vertices in the same global order, same faces — so the pipelined
    march+color overlap cannot change the exported mesh."""
    from rgbd_pifuhd_tpu.recon.grid import (
        eval_grid_three_phase_sparse, sparse_scan_cells)
    from rgbd_pifuhd_tpu.recon.marching import (
        IncrementalMarcher3, marching_tetrahedra_sparse3)

    if not IncrementalMarcher3.supported():
        import pytest
        pytest.skip("native marching lib unavailable")

    res = 64
    center = jnp.array([0.1, -0.05, 0.0])
    corner, top8, sub, top4, ref, _diag = eval_grid_three_phase_sparse(
        sphere_occ, res, jnp.eye(4), center, 0.5,
        budget_cells=256, budget_subcells=1024, cells_per_chunk=256)
    corner, top8, sub, top4, ref = map(
        np.asarray, (corner, top8, sub, top4, ref))
    cells, _ = sparse_scan_cells(corner, top8, res, factor=8)
    v_ref, f_ref = marching_tetrahedra_sparse3(corner, top8, sub, top4,
                                               ref, cells, res)

    for n_slabs in (1, 3, 7):
        bounds = np.linspace(0, len(cells), n_slabs + 1).astype(int)
        v_parts, f_parts = [], []
        with IncrementalMarcher3(corner, top8, sub, top4, ref,
                                 res) as m:
            for s in range(n_slabs):
                vs, fs = m.step(cells[bounds[s]:bounds[s + 1]])
                v_parts.append(vs)
                f_parts.append(fs)
            assert m.total_verts == len(v_ref)
        v_inc = np.concatenate(v_parts)
        f_inc = np.concatenate(f_parts)
        # same vertex set (ordering may differ when thread counts differ
        # between the one-shot and per-slab scans)
        assert v_inc.shape == v_ref.shape and f_inc.shape == f_ref.shape
        np.testing.assert_allclose(v_inc[np.lexsort(v_inc.T)],
                                   v_ref[np.lexsort(v_ref.T)], atol=0.0)
        # faces reference valid global indices and reproduce the exact
        # triangle geometry
        assert f_inc.min() >= 0 and f_inc.max() < len(v_inc)
        tri_inc = v_inc[f_inc].reshape(-1, 9)
        tri_ref = v_ref[f_ref].reshape(-1, 9)
        np.testing.assert_allclose(tri_inc[np.lexsort(tri_inc.T)],
                                   tri_ref[np.lexsort(tri_ref.T)],
                                   atol=0.0)


def test_three_phase_subcell_overflow_warns():
    """Sub-cell budget smaller than the active sub-cell count: diag
    reports it and the Reconstructor warning fires."""
    import types
    import warnings
    from rgbd_pifuhd_tpu.recon.grid import eval_grid_three_phase_sparse
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor

    res = 64
    *_rest, diag = eval_grid_three_phase_sparse(
        sphere_occ, res, jnp.eye(4), jnp.zeros(3), 0.8,
        budget_cells=256, budget_subcells=64, cells_per_chunk=64)
    assert int(diag["n_active_subcells"]) > int(diag["budget_subcells"])

    shim = types.SimpleNamespace(last_grid_diag=None)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Reconstructor._check_budget(shim, diag)
    assert any("sub-cell refinement budget overflow" in str(w.message)
               for w in caught)
    assert shim.last_grid_diag["overflow_subcells"] > 0


def test_budget_overflow_warns_and_still_meshes():
    """Surface needs more cells than the budget: the evaluator must report
    overflow, the Reconstructor must warn, and sign-change cells must still
    mesh (at coarse corner-interpolation accuracy)."""
    import types
    import warnings
    from rgbd_pifuhd_tpu.recon.grid import (
        eval_grid_two_phase_sparse, densify_sparse_volume, sparse_scan_cells)
    from rgbd_pifuhd_tpu.recon.marching import marching_tetrahedra_cells
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor

    res = 64
    center = jnp.zeros(3)
    calib_inv = jnp.eye(4)
    # radius 0.8 sphere crosses ~200+ of the 8^3-voxel cells; budget 64
    corner, top_idx, refined, diag = eval_grid_two_phase_sparse(
        sphere_occ, res, calib_inv, center, 0.8,
        factor=8, budget_cells=64, cells_per_chunk=64)
    assert int(diag["n_active"]) > int(diag["budget_cells"])
    assert float(diag["kth_activity"]) > 0.05

    # the Reconstructor surface warns on this diag
    shim = types.SimpleNamespace(last_grid_diag=None)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Reconstructor._check_budget(shim, diag)
    assert any("refinement budget overflow" in str(w.message) for w in caught)
    assert shim.last_grid_diag["overflow_cells"] > 0

    # sign-change cells beyond the budget still mesh (coarse fill)
    corner_h, top_h = np.asarray(corner), np.asarray(top_idx)
    cells, marks = sparse_scan_cells(corner_h, top_h, res, factor=8)
    vol = densify_sparse_volume(corner_h, top_h, np.asarray(refined), res,
                                factor=8, scan_marks=marks)
    verts, faces = marching_tetrahedra_cells(vol, cells, factor=8)
    r = np.linalg.norm(verts * (2.0 / res) - 1.0, axis=1)
    assert len(verts) > 500
    # coarse-interpolated cells are 8x coarser: loose tolerance
    assert abs(np.median(r) - 0.8) < 0.1


def test_masked_marching_matches_full():
    from rgbd_pifuhd_tpu.recon.marching import marching_tetrahedra_cells
    from rgbd_pifuhd_tpu.recon.pipeline import _surface_cells

    n = 64
    g = np.mgrid[:n, :n, :n].astype(np.float64)
    d = np.sqrt(((g - n / 2) ** 2).sum(0))
    vol = (1.0 / (1.0 + np.exp(d - 20.0))).astype(np.float32)

    v_full, f_full = marching_tetrahedra(vol, 0.5)
    cells = _surface_cells(np.zeros((0,), np.int64), vol, n // 8, 8)
    v_mask, f_mask = marching_tetrahedra_cells(vol, cells, factor=8)

    assert v_mask.shape == v_full.shape
    assert f_mask.shape == f_full.shape
    s1 = v_full[np.lexsort(v_full.T)]
    s2 = v_mask[np.lexsort(v_mask.T)]
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_native_affine_transform_matches_numpy(rng):
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.recon.grid import create_grid_transform

    verts_idx = rng.uniform(0, 64, (5000, 3)).astype(np.float32)
    faces = np.zeros((1, 3), np.int32)
    calib = np.diag([0.4, -0.5, 0.6, 1.0]).astype(np.float32)
    calib[:3, 3] = [0.1, -0.2, 0.3]
    v_native, f_native = Reconstructor._to_world(verts_idx, faces, calib, 64)
    mat = create_grid_transform(64)
    trans = np.linalg.inv(np.asarray(calib, np.float64)) @ mat
    ref = (verts_idx @ trans[:3, :3].T + trans[:3, 3]).astype(np.float32)
    np.testing.assert_allclose(v_native, ref, rtol=1e-6, atol=1e-5)
    # y axis negated => det < 0 => winding flipped
    assert np.linalg.det(trans[:3, :3]) < 0
    np.testing.assert_array_equal(f_native, faces[:, ::-1])


def test_vgg_npz_weight_roundtrip(tmp_path):
    from rgbd_pifuhd_tpu.models.vgg import VGG16Features

    ref = VGG16Features.init_params(3)
    path = os.path.join(tmp_path, "vgg.npz")
    flat = {}
    for i in range(10):
        flat[f"conv{i}_kernel"] = np.asarray(ref["params"][f"conv{i}"]["kernel"])
        flat[f"conv{i}_bias"] = np.asarray(ref["params"][f"conv{i}"]["bias"])
    np.savez(path, **flat)
    loaded = VGG16Features.load_weights(path)
    for i in range(10):
        np.testing.assert_array_equal(
            loaded["params"][f"conv{i}"]["kernel"],
            ref["params"][f"conv{i}"]["kernel"])
    # missing file falls back to seeded random init without raising
    rand = VGG16Features.load_weights(os.path.join(tmp_path, "nope.pth"),
                                      rng_key=3)
    np.testing.assert_array_equal(rand["params"]["conv0"]["kernel"],
                                  ref["params"]["conv0"]["kernel"])


def test_gen_mesh_many_matches_sequential(rng, tmp_path):
    """Two-slot pipelined reconstruction produces the same meshes as the
    serial per-subject loop."""
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global, tiny_local

    opt = Options(resolution=32, use_octree=True)
    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())
    calib = jnp.eye(4, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 32, 32, 6), jnp.float32),
        jnp.zeros((1, 64, 64, 6), jnp.float32),
        jnp.zeros((1, 1, 8, 3), jnp.float32), calib[None, None],
        calib[None], jnp.zeros((1, 1, 8, 1), jnp.float32))
    recon = Reconstructor(model, params, opt)

    datas = []
    for k in range(3):
        r = np.random.default_rng(k)
        datas.append({
            "img": jnp.asarray(
                r.standard_normal((1, 32, 32, 6)).astype(np.float32)),
            "img_512": jnp.asarray(
                r.standard_normal((1, 64, 64, 6)).astype(np.float32)),
            "calib": calib,
        })

    seq = [recon.gen_mesh(d, os.path.join(tmp_path, f"seq{k}.obj"),
                          resolution=32)
           for k, d in enumerate(datas)]
    paths = [os.path.join(tmp_path, f"pipe{k}.obj") for k in range(3)]
    # force the worker pipeline: the auto mode falls back to the serial
    # loop on a 1-core host, which would leave the worker path untested
    piped = recon.gen_mesh_many(datas, paths, use_color=0, resolution=32,
                                pipeline=True)

    assert len(piped) == len(seq)
    for s, p, path in zip(seq, piped, paths):
        assert os.path.exists(path)
        np.testing.assert_allclose(s["verts"], p["verts"], atol=1e-5)
        np.testing.assert_array_equal(s["faces"], p["faces"])

    # geometric-normal (normal_mode='mesh') pipelined path must color
    # every subject with ITS OWN geometry: the worker resolves the color
    # thunk after the main loop has moved on to the next subject, so the
    # thunk must bind verts/faces by value (late binding colored subject
    # i with subject i+1's mesh and could read out of bounds)
    import dataclasses
    from rgbd_pifuhd_tpu.recon.mesh import load_obj
    recon.opt = dataclasses.replace(opt, normal_mode="mesh")
    seq_paths_m = [os.path.join(tmp_path, f"sm{k}.obj") for k in range(3)]
    for k, d in enumerate(datas):
        recon.gen_mesh(d, seq_paths_m[k], resolution=32)
    paths_m = [os.path.join(tmp_path, f"pm{k}.obj") for k in range(3)]
    recon.gen_mesh_many(datas, paths_m, use_color=0, resolution=32,
                        pipeline=True)
    recon.opt = opt
    for sp, pp in zip(seq_paths_m, paths_m):
        v_s, f_s, c_s = load_obj(sp)
        v_p, f_p, c_p = load_obj(pp)
        np.testing.assert_allclose(v_s, v_p, atol=1e-5)
        np.testing.assert_array_equal(f_s, f_p)
        np.testing.assert_allclose(c_s, c_p, atol=2.0 / 255.0)

    # image-color (1) and cleanup (2) pipelined paths match sequential too
    for uc in (1, 2):
        seq_c = [recon.gen_mesh_img_color(
            d, os.path.join(tmp_path, f"sc{uc}_{k}.obj"), resolution=32,
            cleanup=uc == 2) for k, d in enumerate(datas[:2])]
        paths_c = [os.path.join(tmp_path, f"pc{uc}_{k}.obj")
                   for k in range(2)]
        piped_c = recon.gen_mesh_many(datas[:2], paths_c, use_color=uc,
                                      resolution=32, pipeline=True)
        for s, p, path in zip(seq_c, piped_c, paths_c):
            assert os.path.exists(path)
            np.testing.assert_allclose(s["verts"], p["verts"], atol=1e-5)
            np.testing.assert_array_equal(s["faces"], p["faces"])


def test_coarse_only_reconstructor(rng, tmp_path):
    """Single-level (coarse) reconstruction end to end."""
    from rgbd_pifuhd_tpu.models import CoarsePIFu
    from rgbd_pifuhd_tpu.recon.pipeline import CoarseReconstructor
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global

    model = CoarsePIFu(tiny_global())
    img_g = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    calib = jnp.eye(4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img_g,
                        jnp.zeros((1, 8, 3), jnp.float32), calib[None],
                        jnp.zeros((1, 8, 1), jnp.float32))

    recon = CoarseReconstructor(model, params, Options(resolution=32))
    data = {"img": img_g, "img_512": img_g, "calib": calib}
    out = recon.gen_mesh(data, os.path.join(tmp_path, "coarse.obj"),
                         resolution=32)
    assert os.path.exists(os.path.join(tmp_path, "coarse.obj"))
    assert len(out["verts"]) > 0


def test_estimate_back_colors_matches_dense_oracle():
    """The windowed y-sorted inpainting must match the dense O(n*M)
    computation exactly (reference esti_color, reconstruction.py:190-229)."""
    from rgbd_pifuhd_tpu.recon.pipeline import estimate_back_colors

    rng = np.random.default_rng(7)
    n = 3000
    xyz = rng.standard_normal((n, 3)).astype(np.float64)
    # force a populated boundary band and a back set
    xyz[: n // 3, 2] = rng.uniform(0.0, 1e-3, n // 3)      # boundary
    xyz[n // 3: 2 * n // 3, 2] = -np.abs(
        xyz[n // 3: 2 * n // 3, 2]) - 1e-6                  # back-facing
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    def dense_oracle(colors, xyz, k=10, band=1e-3):
        out = colors.copy()
        back = np.nonzero(xyz[:, 2] < 0)[0]
        boundary = np.nonzero((xyz[:, 2] >= 0) & (xyz[:, 2] < band))[0]
        bx, by = xyz[boundary, 0], xyz[boundary, 1]
        bc = out[boundary].astype(np.float64)
        for i in back:
            px, py = xyz[i, 0], xyz[i, 1]
            dy = np.abs(by - py)
            tot, cnt = np.zeros(3), 0
            for m in (bx < px, bx >= px):
                idx = np.nonzero(m)[0]
                if len(idx) == 0:
                    continue
                sel = idx[np.argsort(dy[idx], kind="stable")[:k]]
                tot += bc[sel].sum(axis=0)
                cnt += len(sel)
            if cnt:
                out[i] = (tot / cnt).astype(out.dtype)
        return out

    got = estimate_back_colors(colors, xyz)
    want = dense_oracle(colors, xyz)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_streamed_obj_write_byte_identical(tmp_path):
    """The streamed per-color-group OBJ writer (vertex lines written
    while later groups are still in flight) must produce a byte-identical
    file to the monolithic save_obj_with_color."""
    from rgbd_pifuhd_tpu.native import load_meshio
    from rgbd_pifuhd_tpu.recon.mesh import (format_faces_block,
                                            save_obj_with_color)
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor, _ColorJob

    if load_meshio() is None:
        pytest.skip("native meshio unavailable")

    rng = np.random.default_rng(7)
    for parts_rows, V in (((1024,), 1000),        # one part, truncated
                          ((512, 512), 1000),     # multi-part, last short
                          ((256,), 256)):         # exact fit
        verts = rng.standard_normal((V, 3)).astype(np.float32)
        faces = rng.integers(0, V, (2 * V, 3)).astype(np.int32)
        parts = [rng.integers(0, 256, (1, r, 3)).astype(np.uint8)
                 for r in parts_rows]
        job = _ColorJob(parts, V)

        ref_path = os.path.join(tmp_path, "ref.obj")
        save_obj_with_color(ref_path, verts, faces, job())
        out_path = os.path.join(tmp_path, "streamed.obj")
        ok = Reconstructor._write_obj_streamed(
            out_path, verts, job, format_faces_block(faces))
        assert ok
        with open(ref_path, "rb") as f1, open(out_path, "rb") as f2:
            assert f1.read() == f2.read()


def test_quantize_colors_clips_out_of_range():
    from rgbd_pifuhd_tpu.recon.pipeline import _quantize_colors_jit
    import jax.numpy as jnp

    vals = jnp.asarray([[-1.5, -1.0, 0.0], [1.0, 1.01, 2.0]])
    out = np.asarray(_quantize_colors_jit(vals))
    np.testing.assert_array_equal(out, [[0, 0, 128], [255, 255, 255]])


def test_budget_auto_escalation():
    """An under-budgeted evaluation must RE-RUN with doubled budgets until
    the active surface is covered (opt.auto_escalate_budget, default on) —
    the reference's threshold octree never under-refines.  The escalated
    budget is remembered so the next subject starts covered."""
    import warnings
    from rgbd_pifuhd_tpu.recon.pipeline import Reconstructor
    from rgbd_pifuhd_tpu.utils.options import Options

    center = jnp.zeros(3)

    class Shim:
        _query = staticmethod(
            lambda pts, params, l, g, calib: sphere_occ(pts, center, 0.8))
        _diag_host = staticmethod(Reconstructor._diag_host)
        _check_budget = Reconstructor._check_budget
        params = jnp.zeros(1)
        last_grid_diag = None

    shim = Shim()
    shim._esc_budgets = {}
    # budgets far below the r=0.8 sphere's active cell/sub-cell counts
    shim.opt = Options(num_refine_cells=64, num_refine_subcells=64,
                       octree_levels=3, auto_escalate_budget=True)
    z = jnp.zeros(1)
    calib = jnp.eye(4, dtype=jnp.float32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        field = Reconstructor.evaluate_field(shim, z, z, calib, 64)
    assert not [w for w in caught if "overflow" in str(w.message)], \
        [str(w.message) for w in caught]
    d = shim.last_grid_diag
    assert d["overflow_cells"] == 0 and d["overflow_subcells"] == 0
    esc = shim._esc_budgets[64]
    assert esc["cells"] > 64 and esc["subcells"] > 64

    # escalated field reconstructs the sphere at full accuracy
    verts, _faces = Reconstructor.extract_mesh(field, 64)
    r = np.linalg.norm(verts * (2.0 / 64) - 1.0, axis=1)
    np.testing.assert_allclose(np.median(r), 0.8, atol=0.02)

    # a second evaluation starts at the escalated budget: no re-run
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Reconstructor.evaluate_field(shim, z, z, calib, 64)
    assert shim.last_grid_diag["overflow_subcells"] == 0

    # with escalation disabled, the same budgets under-refine and warn
    shim2 = Shim()
    shim2._esc_budgets = {}
    shim2.opt = Options(num_refine_cells=64, num_refine_subcells=64,
                        octree_levels=3, auto_escalate_budget=False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Reconstructor.evaluate_field(shim2, z, z, calib, 64)
    assert any("overflow" in str(w.message) for w in caught)
