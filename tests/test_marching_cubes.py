"""Derived marching-cubes extractor: correctness oracle is the import-time
table derivation itself plus geometric invariants — watertightness (the
fixed per-face disambiguation rule makes neighboring cubes agree), outward
orientation, sphere accuracy, and exact native-vs-NumPy agreement."""

from collections import Counter

import numpy as np
import pytest

from rgbd_pifuhd_tpu.recon.marching import (
    _MC_CASE_TABLE,
    _marching_native,
    marching_cubes_numpy,
    marching_tetrahedra,
)


def _edge_use_counts(faces):
    cnt: Counter = Counter()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            cnt[tuple(sorted(e))] += 1
    return cnt


def _sphere_vol(n=24, r=7.5):
    g = np.arange(n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2.0
    d = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    return (1.0 / (1.0 + np.exp((d - r) * 2.0))).astype(np.float32), c, r


def test_table_structure():
    # pure triangles after the interior-fan split, complement symmetry of
    # the empty/full cases, single corner -> single triangle
    assert all(len(loop) == 3 for loops in _MC_CASE_TABLE for loop in loops)
    assert len(_MC_CASE_TABLE[0]) == 0 and len(_MC_CASE_TABLE[255]) == 0
    assert len(_MC_CASE_TABLE[1]) == 1 and len(_MC_CASE_TABLE[254]) == 1


def test_sphere_geometry_and_orientation():
    vol, c, r = _sphere_vol()
    v, f = marching_cubes_numpy(vol, 0.5)
    assert len(v) > 300
    rad = np.linalg.norm(v - c, axis=1)
    assert abs(rad.mean() - r) < 0.1
    assert rad.std() < 0.05
    # watertight + outward winding (parity with the tet kernel's contract)
    assert not [k for k, n in _edge_use_counts(f).items() if n != 2]
    tri = v[f]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    assert ((nrm * (tri.mean(1) - c)).sum(1) > 0).all()


def test_mc_vs_mt_vertex_reduction():
    vol, c, r = _sphere_vol()
    v, f = marching_cubes_numpy(vol, 0.5)
    vt, ft = marching_tetrahedra(vol, 0.5, use_native=False)
    assert len(vt) > 2.5 * len(v)
    assert len(ft) > 2.5 * len(f)
    # same surface: radius statistics agree
    assert abs(np.linalg.norm(v - c, axis=1).mean()
               - np.linalg.norm(vt - c, axis=1).mean()) < 0.05


def test_random_fields_watertight():
    rng = np.random.default_rng(3)
    for _ in range(4):
        vol = np.zeros((11, 11, 11), np.float32)
        vol[1:-1, 1:-1, 1:-1] = rng.uniform(0, 1, (9, 9, 9))
        v, f = marching_cubes_numpy(vol, 0.5)
        assert not [k for k, n in _edge_use_counts(f).items() if n != 2]


def test_native_matches_numpy():
    out = _marching_native(np.zeros((4, 4, 4), np.float32), 0.5,
                           algorithm="mc")
    if out is None:
        pytest.skip("native marching kernel unavailable")
    rng = np.random.default_rng(5)
    for _ in range(3):
        vol = np.zeros((10, 10, 10), np.float32)
        vol[1:-1, 1:-1, 1:-1] = rng.uniform(0, 1, (8, 8, 8))
        vn, fn = _marching_native(vol, 0.5, algorithm="mc")
        vp, fp = marching_cubes_numpy(vol, 0.5)
        assert len(vn) == len(vp) and len(fn) == len(fp)
        # same vertex set (orders differ across thread merges)
        a = np.array(sorted(map(tuple, np.round(vn, 4))))
        b = np.array(sorted(map(tuple, np.round(vp, 4))))
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_vectorized_fallback_matches_oracle():
    """marching_tetrahedra(algorithm='mc', use_native=False) routes to the
    vectorized slab fallback (_marching_cubes_numpy_vec) — it must produce
    the oracle's exact vertex set and face count (the loop-per-cube oracle
    is hours at 512^3; production hosts without the native kernel get the
    vectorized path).  Slab boundaries must not crack the mesh."""
    rng = np.random.default_rng(7)
    for trial in range(3):
        vol = np.zeros((12, 12, 12), np.float32)
        vol[1:-1, 1:-1, 1:-1] = rng.uniform(0, 1, (10, 10, 10))
        # slab=3 forces several slab boundaries inside the volume
        vv, fv = marching_tetrahedra(vol, 0.5, slab=3, use_native=False,
                                     algorithm="mc")
        vp, fp = marching_cubes_numpy(vol, 0.5)
        assert len(vv) == len(vp) and len(fv) == len(fp)
        a = np.array(sorted(map(tuple, np.round(vv, 4))))
        b = np.array(sorted(map(tuple, np.round(vp, 4))))
        np.testing.assert_allclose(a, b, atol=1e-4)
        # watertight through slab boundaries
        assert not [k for k, n in _edge_use_counts(fv).items() if n != 2]


def test_sparse3_mc_matches_densified(rng):
    """Sparse-direct MC extraction == densify + dense MC (the same
    identity the MT kernels guarantee), via the pipeline's own evaluator
    on a synthetic field."""
    import jax
    import jax.numpy as jnp

    from rgbd_pifuhd_tpu.recon.grid import (
        densify_sparse3_volume, eval_grid_three_phase_sparse,
        sparse_scan_cells)
    from rgbd_pifuhd_tpu.recon.marching import marching_tetrahedra_sparse3

    def occ(pts, *args):
        d = jnp.linalg.norm(pts, axis=-1)
        return jax.nn.sigmoid((0.55 - d) * 24.0)

    res = 64
    corner, top8, sub_q, top4, refined, diag = eval_grid_three_phase_sparse(
        occ, res, jnp.eye(4), factor=8, budget_cells=128,
        budget_subcells=512, cells_per_chunk=64)
    corner, top8, sub_q, top4, refined = map(
        np.asarray, (corner, top8, sub_q, top4, refined))
    cells, _ = sparse_scan_cells(corner, top8, res, factor=8)
    v_sp, f_sp = marching_tetrahedra_sparse3(
        corner, top8, sub_q, top4, refined, cells, res, factor=8,
        algorithm="mc")
    vol = densify_sparse3_volume(corner, top8, sub_q, top4, refined, res,
                                 factor=8)
    v_d, f_d = _marching_native(vol, 0.5, algorithm="mc") or (None, None)
    if v_d is None:
        pytest.skip("native marching kernel unavailable")
    assert len(v_sp) == len(v_d) and len(f_sp) == len(f_d)
    a = np.array(sorted(map(tuple, np.round(v_sp, 4))))
    b = np.array(sorted(map(tuple, np.round(v_d, 4))))
    np.testing.assert_allclose(a, b, atol=1e-4)
    # plausible sphere
    r = np.linalg.norm(v_sp - (res / 2 - 0.5), axis=1)
    assert 0.4 * res / 2 < r.mean() < 0.7 * res


def test_incremental_mc_equals_one_shot(rng):
    """IncrementalMarcher3 with algorithm='mc' reproduces the one-shot
    sparse3 MC mesh exactly (same dedup, same global indices)."""
    import jax
    import jax.numpy as jnp

    from rgbd_pifuhd_tpu.recon.grid import (
        eval_grid_three_phase_sparse, sparse_scan_cells)
    from rgbd_pifuhd_tpu.recon.marching import (
        IncrementalMarcher3, marching_tetrahedra_sparse3)

    if not IncrementalMarcher3.supported():
        pytest.skip("native marching kernel unavailable")

    def occ(pts, *args):
        d = jnp.linalg.norm(pts - 0.1, axis=-1)
        return jax.nn.sigmoid((0.5 - d) * 20.0)

    res = 64
    out = eval_grid_three_phase_sparse(
        occ, res, jnp.eye(4), factor=8, budget_cells=128,
        budget_subcells=512, cells_per_chunk=64)
    corner, top8, sub_q, top4, refined = map(np.asarray, out[:5])
    cells, _ = sparse_scan_cells(corner, top8, res, factor=8)
    v1, f1 = marching_tetrahedra_sparse3(
        corner, top8, sub_q, top4, refined, cells, res, factor=8,
        algorithm="mc")
    vs, fs = [], []
    with IncrementalMarcher3(corner, top8, sub_q, top4, refined, res,
                             algorithm="mc") as m:
        for s in range(0, len(cells), max(1, len(cells) // 3)):
            v, f = m.step(cells[s:s + max(1, len(cells) // 3)])
            vs.append(v)
            fs.append(f)
    v2 = np.concatenate(vs)
    f2 = np.concatenate(fs)
    assert len(v1) == len(v2) and len(f1) == len(f2)
    a = np.array(sorted(map(tuple, np.round(v1, 4))))
    b = np.array(sorted(map(tuple, np.round(v2, 4))))
    np.testing.assert_allclose(a, b, atol=1e-4)
