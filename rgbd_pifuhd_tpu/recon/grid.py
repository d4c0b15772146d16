"""On-device occupancy-grid evaluation.

Re-design of the reference's host-side grid pipeline
(/root/reference/mesh_util.py:12-187).  The reference streams 5k-point
chunks through ~27k host<->device round trips per mesh and runs the octree
logic in NumPy; here the ENTIRE lattice evaluation — including the
coarse-to-fine skip logic — runs on-device under one jit, and the finished
volume crosses to the host exactly once.

Two evaluators:

- ``eval_grid_dense``      — full res^3 lattice in x-slab chunks via
  ``lax.fori_loop`` (parity: eval_grid, mesh_util.py:116-120).
- ``eval_grid_two_phase``  — TPU-friendly re-design of the octree
  (mesh_util.py:124-187): phase 1 evaluates the coarse corner lattice
  (stride ``factor``); cells are ranked by corner disagreement
  ``v_max - v_min`` and the top ``budget_cells`` are refined densely in
  phase 2; skipped cells are filled with 0.5*(v_max+v_min) — the same fill
  the reference uses (mesh_util.py:177-183).  Fixed budget => static
  shapes; ranking (not thresholding) => no dynamic compaction.

Grid convention (parity with create_grid + the calib_inv world mapping,
mesh_util.py:12-38, 59-65): lattice index i in [0, res) maps to
NDC = i * (2/res) - 1, and world = calib_inv @ [ndc, 1].
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Octree skip threshold: cells whose 8 corners disagree by less than this
# are interpolated, not refined (reference mesh_util.py:179).  Used only for
# the overflow diagnostic — refinement itself is rank-based, not thresholded.
_SKIP_THRESHOLD = 0.05

# query_fn: ([M, 3] world-space points, *query_args) -> [M] occupancy.
# query_args carry the dynamic model state (params, image features, calib)
# so the jitted evaluators compile ONCE per query_fn and are reused across
# subjects.
QueryFn = Callable[..., jax.Array]


def create_grid_transform(resolution: int,
                          b_min=(-1.0, -1.0, -1.0),
                          b_max=(1.0, 1.0, 1.0)) -> np.ndarray:
    """4x4 index->box affine (reference create_grid's coords_matrix)."""
    b_min = np.asarray(b_min, np.float64)
    b_max = np.asarray(b_max, np.float64)
    mat = np.eye(4)
    mat[0, 0] = (b_max[0] - b_min[0]) / resolution
    mat[1, 1] = (b_max[1] - b_min[1]) / resolution
    mat[2, 2] = (b_max[2] - b_min[2]) / resolution
    mat[:3, 3] = b_min
    return mat


def _idx_to_world(idx_xyz: jax.Array, resolution: int,
                  calib_inv: jax.Array) -> jax.Array:
    """Lattice indices [M, 3] -> world points [M, 3] via NDC and calib_inv."""
    ndc = idx_xyz.astype(jnp.float32) * (2.0 / resolution) - 1.0
    rot = calib_inv[:3, :3].astype(jnp.float32)
    trans = calib_inv[:3, 3].astype(jnp.float32)
    return ndc @ rot.T + trans


@partial(jax.jit, static_argnames=("query_fn", "resolution"))
def eval_grid_dense(query_fn: QueryFn, resolution: int,
                    calib_inv: jax.Array, *query_args) -> jax.Array:
    """Evaluate every lattice point; returns [res, res, res] occupancy."""
    res = resolution
    chunk = res * res  # one x-slab per step: divides res^3 exactly

    def body(i, vol_flat):
        lin = i * chunk + jnp.arange(chunk)
        x = lin // (res * res)
        y = (lin // res) % res
        z = lin % res
        world = _idx_to_world(jnp.stack([x, y, z], axis=-1), res, calib_inv)
        occ = query_fn(world, *query_args)
        return lax.dynamic_update_slice(vol_flat, occ, (i * chunk,))

    vol = lax.fori_loop(0, res, body, jnp.zeros((res ** 3,), jnp.float32))
    return vol.reshape(res, res, res)


@partial(
    jax.jit,
    static_argnames=("query_fn", "resolution", "factor", "budget_cells",
                     "cells_per_chunk"),
)
def eval_grid_two_phase(
    query_fn: QueryFn,
    resolution: int,
    calib_inv: jax.Array,
    *query_args,
    factor: int = 8,
    budget_cells: int = 49152,
    cells_per_chunk: int = 512,
):
    """Coarse-to-fine evaluation with a fixed refinement budget.

    Args:
        factor: coarse stride (8 => 64^3 coarse cells at res 512; matches the
            reference's init stride res/64, mesh_util.py:126,138).
        budget_cells: number of cells refined densely (static).  49152 =
            18.75% of 64^3 — generous vs the ~5-10% of cells a human surface
            crosses; overflow cells fall back to the coarse fill.
        cells_per_chunk: refinement batch granularity.

    Returns ``(volume [res,res,res] float32, diag dict)``.  ``diag`` reports
    refinement-budget health (the reference's threshold-based octree never
    silently under-refines, mesh_util.py:124-187; the fixed-budget redesign
    can, so it must say when it did):

        kth_activity — corner-disagreement of the LAST refined cell; if it
            exceeds the skip threshold, cells beyond the budget wanted
            refinement too.
        n_active     — number of cells above the reference's 0.05 skip
            threshold (mesh_util.py:179); overflow iff n_active > budget.
        budget_cells — the (rounded) budget actually used.
    """
    res = resolution
    n = res // factor                      # cells per axis
    n1 = n + 1                             # corner lattice points per axis
    # keep the refinement loop pad-free: budget is a multiple of the chunk
    cells_per_chunk = min(cells_per_chunk, n ** 3)
    budget_cells = min(max(budget_cells, cells_per_chunk), n ** 3)
    budget_cells = (budget_cells // cells_per_chunk) * cells_per_chunk

    # ---------------- phase 1: coarse corner lattice -------------------
    ii = jnp.arange(n1)
    cx, cy, cz = jnp.meshgrid(ii, ii, ii, indexing="ij")
    corner_idx = jnp.stack(
        [cx.reshape(-1), cy.reshape(-1), cz.reshape(-1)], axis=-1
    ) * factor
    corner_idx = jnp.minimum(corner_idx, res - 1)      # clamp 512 -> 511
    # pad the (n+1)^3 corner count to a power-of-two multiple so a
    # shard_map-wrapped query (point axis sharded over up to 1024 devices)
    # always divides evenly
    n_corners = n1 ** 3
    n_pad = -(-n_corners // 1024) * 1024
    corner_idx = jnp.concatenate(
        [corner_idx,
         jnp.broadcast_to(corner_idx[-1:], (n_pad - n_corners, 3))], axis=0)
    world = _idx_to_world(corner_idx, res, calib_inv)
    corner_vals = query_fn(world, *query_args)[:n_corners].reshape(n1, n1, n1)

    # cell corner stats
    c = corner_vals
    stack8 = jnp.stack(
        [
            c[:-1, :-1, :-1], c[:-1, :-1, 1:], c[:-1, 1:, :-1], c[:-1, 1:, 1:],
            c[1:, :-1, :-1], c[1:, :-1, 1:], c[1:, 1:, :-1], c[1:, 1:, 1:],
        ],
        axis=0,
    )                                                   # [8, n, n, n]
    v_min = stack8.min(axis=0)
    v_max = stack8.max(axis=0)
    activity = (v_max - v_min).reshape(-1)              # [n^3]
    fill = 0.5 * (v_min + v_max)                        # [n, n, n]

    # initialize volume with the per-cell fill, broadcast to factor^3 blocks
    vol = jnp.broadcast_to(
        fill[:, None, :, None, :, None],
        (n, factor, n, factor, n, factor),
    ).reshape(res, res, res).reshape(-1)

    # ---------------- phase 2: refine top-K active cells ---------------
    top_vals, top_idx = lax.top_k(activity, budget_cells)  # [K] cell ids
    diag = {
        "kth_activity": top_vals[-1],
        "n_active": jnp.sum(activity > _SKIP_THRESHOLD),
        "budget_cells": jnp.asarray(budget_cells, jnp.int32),
    }
    cbx = top_idx // (n * n)
    cby = (top_idx // n) % n
    cbz = top_idx % n
    cell_base = jnp.stack([cbx, cby, cbz], axis=-1) * factor  # [K, 3]

    f3 = factor ** 3
    oi = jnp.arange(factor)
    ox, oy, oz = jnp.meshgrid(oi, oi, oi, indexing="ij")
    offsets = jnp.stack(
        [ox.reshape(-1), oy.reshape(-1), oz.reshape(-1)], axis=-1
    )                                                   # [f^3, 3]

    n_chunks = budget_cells // cells_per_chunk  # exact (budget rounded above)

    def body(i, vol_flat):
        s = i * cells_per_chunk
        bases = lax.dynamic_slice(cell_base, (s, 0), (cells_per_chunk, 3))
        pts_idx = (bases[:, None, :] + offsets[None, :, :]).reshape(-1, 3)
        world = _idx_to_world(pts_idx, res, calib_inv)
        occ = query_fn(world, *query_args)               # [chunk*f^3]
        lin = (pts_idx[:, 0] * res + pts_idx[:, 1]) * res + pts_idx[:, 2]
        return vol_flat.at[lin].set(occ)

    vol = lax.fori_loop(0, n_chunks, body, vol)
    return vol.reshape(res, res, res), diag


@partial(
    jax.jit,
    static_argnames=("query_fn", "resolution", "factor", "budget_cells",
                     "cells_per_chunk", "pack_bits", "band_scale"),
)
def eval_grid_two_phase_sparse(
    query_fn: QueryFn,
    resolution: int,
    calib_inv: jax.Array,
    *query_args,
    factor: int = 8,
    budget_cells: int = 12288,
    cells_per_chunk: int = 512,
    pack_bits: int = 4,
    band_scale: float = 4.0,
):
    """Two-phase evaluation returning a SPARSE volume representation.

    Same computation as ``eval_grid_two_phase`` but instead of scattering
    into a dense res^3 f32 array (which then costs a 4*res^3-byte
    device->host transfer), returns:

        corner_vals  [(n+1)^3] float32   — coarse corner lattice
        top_idx      [K] int32           — refined cell linear ids
        refined      [K, factor^3] uint8 — refined occupancy, quantized
        diag         dict                — budget-overflow diagnostics
                                           (see eval_grid_two_phase)

    ``densify_sparse_volume`` reassembles the dense NumPy volume on host.
    For res=512/K=12288 this shrinks the transfer from 536 MB to ~7 MB —
    essential over slow host links, harmless over PCIe.

    Quantization: values are first BAND-CLAMPED around the iso-threshold —
    ``q = clip((occ - 0.5) * band_scale + 0.5, 0, 1)`` — which discards
    far-from-surface precision marching cubes never uses, then stored in
    ``pack_bits`` (4 => two voxels/byte, ~3.4 MB total at K=12288; 8 =>
    one byte/voxel).  Near-threshold resolution at 4 bits with
    band_scale=4 is (1/15)/4 ~ 1.7% occupancy => sub-2% voxel vertex
    jitter.  Saturated cells keep the correct side of the threshold, so
    topology is exact.
    """
    res = resolution
    n = res // factor
    n1 = n + 1
    cells_per_chunk = min(cells_per_chunk, n ** 3)
    budget_cells = min(max(budget_cells, cells_per_chunk), n ** 3)
    budget_cells = (budget_cells // cells_per_chunk) * cells_per_chunk

    ii = jnp.arange(n1)
    cx, cy, cz = jnp.meshgrid(ii, ii, ii, indexing="ij")
    corner_idx = jnp.stack(
        [cx.reshape(-1), cy.reshape(-1), cz.reshape(-1)], axis=-1
    ) * factor
    corner_idx = jnp.minimum(corner_idx, res - 1)
    n_corners = n1 ** 3
    n_pad = -(-n_corners // 1024) * 1024
    corner_idx_p = jnp.concatenate(
        [corner_idx,
         jnp.broadcast_to(corner_idx[-1:], (n_pad - n_corners, 3))], axis=0)
    world = _idx_to_world(corner_idx_p, res, calib_inv)
    corner_vals = query_fn(world, *query_args)[:n_corners]

    c = corner_vals.reshape(n1, n1, n1)
    stack8 = jnp.stack(
        [
            c[:-1, :-1, :-1], c[:-1, :-1, 1:], c[:-1, 1:, :-1], c[:-1, 1:, 1:],
            c[1:, :-1, :-1], c[1:, :-1, 1:], c[1:, 1:, :-1], c[1:, 1:, 1:],
        ],
        axis=0,
    )
    activity = (stack8.max(axis=0) - stack8.min(axis=0)).reshape(-1)
    top_vals, top_idx = lax.top_k(activity, budget_cells)
    diag = {
        "kth_activity": top_vals[-1],
        "n_active": jnp.sum(activity > _SKIP_THRESHOLD),
        "budget_cells": jnp.asarray(budget_cells, jnp.int32),
    }

    cbx = top_idx // (n * n)
    cby = (top_idx // n) % n
    cbz = top_idx % n
    cell_base = jnp.stack([cbx, cby, cbz], axis=-1) * factor

    f3 = factor ** 3
    oi = jnp.arange(factor)
    ox, oy, oz = jnp.meshgrid(oi, oi, oi, indexing="ij")
    offsets = jnp.stack(
        [ox.reshape(-1), oy.reshape(-1), oz.reshape(-1)], axis=-1)

    n_chunks = budget_cells // cells_per_chunk

    levels = (1 << pack_bits) - 1
    per_byte = 8 // pack_bits
    packed_width = f3 // per_byte

    def quantize(occ):
        band = jnp.clip((occ - 0.5) * band_scale + 0.5, 0.0, 1.0)
        return jnp.round(band * levels).astype(jnp.uint8)

    def body(i, refined):
        s = i * cells_per_chunk
        bases = lax.dynamic_slice(cell_base, (s, 0), (cells_per_chunk, 3))
        pts_idx = (bases[:, None, :] + offsets[None, :, :]).reshape(-1, 3)
        world = _idx_to_world(pts_idx, res, calib_inv)
        occ = query_fn(world, *query_args).reshape(cells_per_chunk, f3)
        q = quantize(occ)
        if per_byte == 2:  # pack two 4-bit voxels per byte
            q = q.reshape(cells_per_chunk, packed_width, 2)
            q = q[:, :, 0] | (q[:, :, 1] << 4)
        return lax.dynamic_update_slice(refined, q, (s, 0))

    refined = lax.fori_loop(
        0, n_chunks, body,
        jnp.zeros((budget_cells, packed_width), jnp.uint8),
    )
    corner_q = quantize(corner_vals)
    return corner_q, top_idx.astype(jnp.int32), refined, diag


def eval_grid_three_phase_sparse(
    query_fn: QueryFn,
    resolution: int,
    calib_inv: jax.Array,
    *query_args,
    factor: int = 8,
    budget_cells: int = 12288,
    budget_subcells: int = 49152,
    cells_per_chunk: int = 4096,
    pack_bits: int = 4,
    band_scale: float = 4.0,
):
    """Three-level coarse-to-fine evaluation (stride 8 -> 4 -> 1).

    Closer to the reference's stride-halving octree (mesh_util.py:124-187)
    than the two-phase scheme AND ~2x cheaper: instead of refining every
    active 8-cell densely (512 points each), active cells are first probed
    on their interior stride-4 lattice (27 points) and only the sub-cells
    (4^3) whose corners still disagree are evaluated densely (64 points).
    For a surface crossing ~10k of 64^3 cells this evaluates ~3M instead
    of ~6.6M points.

    Returns ``(corner_q, top8_idx, sub_q, top4_idx, refined, diag)``:

        corner_q  [(n+1)^3] uint8     — quantized stride-8 corner lattice
        top8_idx  [K1] int32          — active 8-cell linear ids
        sub_q     [K1, 27] uint8      — quantized stride-4 lattice per cell
        top4_idx  [K2] int32          — refined sub-cell ids, encoded
                                        ``k1_index * 8 + local_subcell``
                                        (local = (sx<<2)|(sy<<1)|sz)
        refined   [K2, 64*pack_bits/8] uint8 — packed 4^3 blocks
        diag      dict                — both budget-overflow diagnostics

    Cell fills follow the same rule at every level: skipped regions read
    0.5*(min+max of their corners) — the reference's interpolation fill.

    Orchestrated as THREE separate jits (one per phase) with every
    intermediate staying on device: a single fused kernel at flagship
    scale trips a libtpu register-allocator RET_CHECK
    (live_range_finder.cc) on v5e; the per-phase kernels match patterns
    the two-phase evaluator already compiles.
    """
    if factor != 8:
        raise ValueError("three-phase evaluation assumes factor=8 (8->4->1)")
    res = resolution
    n = res // factor
    K1 = min(budget_cells, n ** 3)
    K2 = min(budget_subcells, K1 * 8)

    corner_q, top8_idx, cell_base, d1 = _three_phase_p1(
        query_fn, res, factor, K1, pack_bits, band_scale, calib_inv,
        *query_args)
    sub_q, top4_idx, sub_base, d2 = _three_phase_p2(
        query_fn, res, factor, K2, pack_bits, band_scale, calib_inv,
        cell_base, *query_args)
    cells_per_chunk = min(cells_per_chunk, K2)
    refined = _three_phase_p3(
        query_fn, res, K2, cells_per_chunk, pack_bits, band_scale,
        calib_inv, sub_base, *query_args)
    diag = {**d1, **d2}
    return (corner_q, top8_idx.astype(jnp.int32),
            sub_q, top4_idx.astype(jnp.int32), refined, diag)


def _quantize_band(occ, band_scale: float = 4.0, pack_bits: int = 4):
    levels = (1 << pack_bits) - 1
    band = jnp.clip((occ - 0.5) * band_scale + 0.5, 0.0, 1.0)
    return jnp.round(band * levels).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("query_fn", "res", "factor", "K1",
                                   "pack_bits", "band_scale"))
def _three_phase_p1(query_fn, res, factor, K1, pack_bits, band_scale,
                    calib_inv, *query_args):
    """Stride-8 corner lattice -> active-cell ranking."""
    n = res // factor
    n1 = n + 1
    ii = jnp.arange(n1)
    cx, cy, cz = jnp.meshgrid(ii, ii, ii, indexing="ij")
    corner_idx = jnp.stack(
        [cx.reshape(-1), cy.reshape(-1), cz.reshape(-1)], axis=-1
    ) * factor
    corner_idx = jnp.minimum(corner_idx, res - 1)
    n_corners = n1 ** 3
    n_pad = -(-n_corners // 1024) * 1024
    corner_idx_p = jnp.concatenate(
        [corner_idx,
         jnp.broadcast_to(corner_idx[-1:], (n_pad - n_corners, 3))], axis=0)
    world = _idx_to_world(corner_idx_p, res, calib_inv)
    corner_vals = query_fn(world, *query_args)[:n_corners]

    c = corner_vals.reshape(n1, n1, n1)
    stack8 = jnp.stack(
        [
            c[:-1, :-1, :-1], c[:-1, :-1, 1:], c[:-1, 1:, :-1], c[:-1, 1:, 1:],
            c[1:, :-1, :-1], c[1:, :-1, 1:], c[1:, 1:, :-1], c[1:, 1:, 1:],
        ],
        axis=0,
    )
    activity = (stack8.max(axis=0) - stack8.min(axis=0)).reshape(-1)
    top_vals, top8_idx = lax.top_k(activity, K1)
    diag = {
        "kth_activity": top_vals[-1],
        "n_active": jnp.sum(activity > _SKIP_THRESHOLD),
        "budget_cells": jnp.asarray(K1, jnp.int32),
    }
    cbx = top8_idx // (n * n)
    cby = (top8_idx // n) % n
    cbz = top8_idx % n
    cell_base = jnp.stack([cbx, cby, cbz], axis=-1) * factor  # [K1, 3]
    return (_quantize_band(corner_vals, band_scale, pack_bits), top8_idx,
            cell_base, diag)


@partial(jax.jit, static_argnames=("query_fn", "res", "factor", "K2",
                                   "pack_bits", "band_scale"))
def _three_phase_p2(query_fn, res, factor, K2, pack_bits, band_scale,
                    calib_inv, cell_base, *query_args):
    """Stride-4 lattice inside active cells -> sub-cell ranking.

    The 27-point probes are evaluated in fixed chunks via fori_loop —
    the same codegen shape as the refinement loops (a single flat query
    over K1*27 points trips the libtpu regalloc RET_CHECK on v5e).
    """
    K1 = cell_base.shape[0]
    half = factor // 2
    oi = jnp.arange(3) * half                                 # 0, 4, 8
    ox, oy, oz = jnp.meshgrid(oi, oi, oi, indexing="ij")
    sub_offsets = jnp.stack(
        [ox.reshape(-1), oy.reshape(-1), oz.reshape(-1)], axis=-1)  # [27, 3]

    chunk = min(8192, K1)
    n_chunks = -(-K1 // chunk)
    K1_pad = n_chunks * chunk
    cell_base_p = jnp.concatenate(
        [cell_base,
         jnp.broadcast_to(cell_base[-1:], (K1_pad - K1, 3))], axis=0)

    def body(i, vals):
        s = i * chunk
        bases = lax.dynamic_slice(cell_base_p, (s, 0), (chunk, 3))
        pts_idx = (bases[:, None, :] + sub_offsets[None]).reshape(-1, 3)
        pts_idx = jnp.minimum(pts_idx, res - 1)               # clamp edge
        occ = query_fn(
            _idx_to_world(pts_idx, res, calib_inv), *query_args
        ).reshape(chunk, 27)
        return lax.dynamic_update_slice(vals, occ, (s, 0))

    sub_vals = lax.fori_loop(
        0, n_chunks, body, jnp.zeros((K1_pad, 27), jnp.float32))[:K1]

    s3 = sub_vals.reshape(K1, 3, 3, 3)
    sub_stack = jnp.stack(
        [
            s3[:, :-1, :-1, :-1], s3[:, :-1, :-1, 1:],
            s3[:, :-1, 1:, :-1], s3[:, :-1, 1:, 1:],
            s3[:, 1:, :-1, :-1], s3[:, 1:, :-1, 1:],
            s3[:, 1:, 1:, :-1], s3[:, 1:, 1:, 1:],
        ],
        axis=0,
    )
    sub_act = (sub_stack.max(axis=0) - sub_stack.min(axis=0))
    sub_act = sub_act.reshape(K1, 8).reshape(-1)               # sx<<2|sy<<1|sz
    sub_top_vals, top4_idx = lax.top_k(sub_act, K2)
    diag = {
        "kth_subactivity": sub_top_vals[-1],
        "n_active_subcells": jnp.sum(sub_act > _SKIP_THRESHOLD),
        "budget_subcells": jnp.asarray(K2, jnp.int32),
    }
    k1_of = top4_idx // 8
    loc = top4_idx % 8
    sub_base = (
        cell_base[k1_of]
        + jnp.stack([(loc >> 2) & 1, (loc >> 1) & 1, loc & 1], axis=-1)
        * half
    )                                                          # [K2, 3]
    return (_quantize_band(sub_vals, band_scale, pack_bits), top4_idx,
            sub_base, diag)


@partial(jax.jit, static_argnames=("query_fn", "res", "K2",
                                   "cells_per_chunk", "pack_bits",
                                   "band_scale"))
def _three_phase_p3(query_fn, res, K2, cells_per_chunk, pack_bits,
                    band_scale, calib_inv, sub_base, *query_args):
    """Dense 4^3 evaluation of the top sub-cells, packed."""
    half = 4
    f3 = half ** 3
    oi2 = jnp.arange(half)
    qx, qy, qz = jnp.meshgrid(oi2, oi2, oi2, indexing="ij")
    fine_offsets = jnp.stack(
        [qx.reshape(-1), qy.reshape(-1), qz.reshape(-1)], axis=-1)  # [64, 3]

    n_chunks = -(-K2 // cells_per_chunk)
    K2_pad = n_chunks * cells_per_chunk
    sub_base_p = jnp.concatenate(
        [sub_base,
         jnp.broadcast_to(sub_base[-1:], (K2_pad - K2, 3))], axis=0)

    per_byte = 8 // pack_bits
    packed_width = f3 // per_byte

    def body(i, refined):
        s = i * cells_per_chunk
        bases = lax.dynamic_slice(sub_base_p, (s, 0), (cells_per_chunk, 3))
        pts = (bases[:, None, :] + fine_offsets[None]).reshape(-1, 3)
        occ = query_fn(
            _idx_to_world(pts, res, calib_inv), *query_args
        ).reshape(cells_per_chunk, f3)
        q = _quantize_band(occ, band_scale, pack_bits)
        if per_byte == 2:
            q = q.reshape(cells_per_chunk, packed_width, 2)
            q = q[:, :, 0] | (q[:, :, 1] << 4)
        return lax.dynamic_update_slice(refined, q, (s, 0))

    refined = lax.fori_loop(
        0, n_chunks, body,
        jnp.zeros((K2_pad, packed_width), jnp.uint8),
    )
    return refined[:K2]


@partial(jax.jit, static_argnames=("query_fn", "res", "pack_bits",
                                   "band_scale"))
def three_phase_p3_band(query_fn, res, pack_bits, band_scale, calib_inv,
                        bases, *query_args):
    """ONE band of phase-3 dense 4^3 evaluation (``bases`` [B, 3]).

    The banded variant of ``_three_phase_p3``'s loop body, dispatched per
    band at the Python level so the host can PULL band b while band b+1
    computes — the streamed reconstruct path
    (pipeline._reconstruct_streamed) marches band-b cells as they arrive
    instead of waiting for the full packed transfer.  One compile total:
    every band shares the static band size.
    """
    half = 4
    f3 = half ** 3
    oi2 = jnp.arange(half)
    qx, qy, qz = jnp.meshgrid(oi2, oi2, oi2, indexing="ij")
    fine_offsets = jnp.stack(
        [qx.reshape(-1), qy.reshape(-1), qz.reshape(-1)], axis=-1)
    B = bases.shape[0]
    pts = (bases[:, None, :] + fine_offsets[None]).reshape(-1, 3)
    occ = query_fn(
        _idx_to_world(pts, res, calib_inv), *query_args
    ).reshape(B, f3)
    q = _quantize_band(occ, band_scale, pack_bits)
    per_byte = 8 // pack_bits
    if per_byte == 2:
        q = q.reshape(B, f3 // 2, 2)
        q = q[:, :, 0] | (q[:, :, 1] << 4)
    return q


@jax.jit
def pack_sparse3_head(corner_q, top8, sub_q, top4, diag):
    """``pack_sparse3`` without the refined blocks: the head blob the
    streamed path pulls FIRST (scan inputs + escalation diagnostics)
    while phase-3 bands are still computing."""
    data = jnp.concatenate([corner_q.reshape(-1), sub_q.reshape(-1)])
    ids = jnp.concatenate(
        [top8.astype(jnp.int32), top4.astype(jnp.int32)])
    dvec = jnp.stack([
        diag["kth_activity"].astype(jnp.float32),
        diag["n_active"].astype(jnp.float32),
        diag["budget_cells"].astype(jnp.float32),
        diag["kth_subactivity"].astype(jnp.float32),
        diag["n_active_subcells"].astype(jnp.float32),
        diag["budget_subcells"].astype(jnp.float32),
    ])
    return data, ids, dvec


@jax.jit
def pack_sparse3(corner_q, top8, sub_q, top4, refined, diag):
    """Pack the three-phase result into THREE device arrays.

    Each ``np.asarray`` pull over the tunneled host link pays a ~20-40 ms
    round trip; the unpacked result needs 5 array pulls + up to 6 scalar
    diag reads (~9 RTTs).  Packed: one uint8 blob (corner + sub lattice +
    refined blocks), one int32 id vector (top8 ++ top4), one float32 diag
    vector — 3 transfers, byte-identical content.  Hosts unpack with
    zero-copy slices (``unpack_sparse3``).
    """
    data = jnp.concatenate(
        [corner_q.reshape(-1), sub_q.reshape(-1), refined.reshape(-1)])
    ids = jnp.concatenate(
        [top8.astype(jnp.int32), top4.astype(jnp.int32)])
    dvec = jnp.stack([
        diag["kth_activity"].astype(jnp.float32),
        diag["n_active"].astype(jnp.float32),
        diag["budget_cells"].astype(jnp.float32),
        diag["kth_subactivity"].astype(jnp.float32),
        diag["n_active_subcells"].astype(jnp.float32),
        diag["budget_subcells"].astype(jnp.float32),
    ])
    return data, ids, dvec


def unpack_sparse3(data: np.ndarray, ids: np.ndarray, resolution: int,
                   K1: int, K2: int, factor: int = 8, pack_bits: int = 4):
    """Host-side zero-copy unpacking of ``pack_sparse3``'s blobs."""
    n1 = resolution // factor + 1
    n_corner = n1 ** 3
    n_sub = K1 * 27
    packed_w = (factor // 2) ** 3 // (8 // pack_bits)
    corner = data[:n_corner]
    sub_q = data[n_corner:n_corner + n_sub].reshape(K1, 27)
    refined = data[n_corner + n_sub:].reshape(K2, packed_w)
    return corner, ids[:K1], sub_q, ids[K1:], refined


def sparse_scan_cells(corner_vals, top_idx, resolution: int,
                      factor: int = 8, pack_bits: int = 4,
                      band_scale: float = 4.0):
    """Surface-candidate cell marks from the SPARSE result alone.

    Marks = refined top-K cells + cells whose 8 coarse corners disagree in
    sign + cells whose fill sign differs from a face neighbor's.  Complete
    w.r.t. the densified volume: non-marked cells are constant fill with
    sign-matching neighbors, so they cannot contain iso crossings.

    Returns (origins [K', 3] int32 voxel origins, marks [n, n, n] bool).
    """
    res = resolution
    n = res // factor
    n1 = n + 1
    levels = (1 << pack_bits) - 1
    c = ((np.asarray(corner_vals).astype(np.float32) / levels - 0.5)
         / band_scale + 0.5).reshape(n1, n1, n1)

    corners8 = [
        c[dx:n + dx, dy:n + dy, dz:n + dz]
        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
    ]
    s = [q > 0.5 for q in corners8]
    all_in = np.logical_and.reduce(s)
    all_out = np.logical_and.reduce([~q for q in s])
    marks = ~(all_in | all_out)

    v_min = np.minimum.reduce(corners8)
    v_max = np.maximum.reduce(corners8)
    fsign = (0.5 * (v_min + v_max)) > 0.5
    for ax in range(3):
        d = np.diff(fsign, axis=ax) != 0
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(0, n - 1)
        hi[ax] = slice(1, n)
        marks[tuple(lo)] |= d
        marks[tuple(hi)] |= d

    marks.reshape(-1)[np.asarray(top_idx)] = True
    origins = np.argwhere(marks).astype(np.int32) * factor
    return origins, marks


def densify_sparse3_volume(corner_q, top8_idx, sub_q, top4_idx, refined,
                           resolution: int, factor: int = 8,
                           pack_bits: int = 4,
                           band_scale: float = 4.0) -> np.ndarray:
    """Host NumPy reassembly of the THREE-phase sparse result (fallback /
    test oracle; the native sparse-direct marching never materializes
    this).  Fill rule at every level: 0.5*(min+max of corners)."""
    res = resolution
    n = res // factor
    n1 = n + 1
    half = factor // 2
    levels = (1 << pack_bits) - 1

    def unq(q):
        return ((np.asarray(q).astype(np.float32) / levels - 0.5)
                / band_scale + 0.5)

    c = unq(corner_q).reshape(n1, n1, n1)
    stack8 = np.stack(
        [
            c[:-1, :-1, :-1], c[:-1, :-1, 1:], c[:-1, 1:, :-1], c[:-1, 1:, 1:],
            c[1:, :-1, :-1], c[1:, :-1, 1:], c[1:, 1:, :-1], c[1:, 1:, 1:],
        ],
        axis=0,
    )
    fill8 = (0.5 * (stack8.min(axis=0) + stack8.max(axis=0))).astype(
        np.float32)
    vol = np.broadcast_to(
        fill8[:, None, :, None, :, None],
        (n, factor, n, factor, n, factor),
    ).reshape(res, res, res).copy()

    top8_idx = np.asarray(top8_idx)
    sub = unq(sub_q).reshape(-1, 3, 3, 3)
    sub_stack = np.stack(
        [
            sub[:, :-1, :-1, :-1], sub[:, :-1, :-1, 1:],
            sub[:, :-1, 1:, :-1], sub[:, :-1, 1:, 1:],
            sub[:, 1:, :-1, :-1], sub[:, 1:, :-1, 1:],
            sub[:, 1:, 1:, :-1], sub[:, 1:, 1:, 1:],
        ],
        axis=0,
    )
    fill4 = (0.5 * (sub_stack.min(axis=0)
                    + sub_stack.max(axis=0))).reshape(-1, 8)  # [K1, 8]
    cbx = top8_idx // (n * n)
    cby = (top8_idx // n) % n
    cbz = top8_idx % n
    v8 = vol.reshape(n, 2, half, n, 2, half, n, 2, half)
    for s in range(8):
        sx, sy, sz = (s >> 2) & 1, (s >> 1) & 1, s & 1
        v8[cbx, sx, :, cby, sy, :, cbz, sz, :] = \
            fill4[:, s][:, None, None, None]

    top4_idx = np.asarray(top4_idx)
    refined = np.asarray(refined)
    if pack_bits == 4:
        lo = refined & 0x0F
        hi = refined >> 4
        refined = np.stack([lo, hi], axis=-1).reshape(refined.shape[0], -1)
    blocks = unq(refined).reshape(-1, half, half, half)
    k1_of = top4_idx // 8
    loc = top4_idx % 8
    gx, gy, gz = cbx[k1_of], cby[k1_of], cbz[k1_of]
    sx, sy, sz = (loc >> 2) & 1, (loc >> 1) & 1, loc & 1
    v8[gx, sx, :, gy, sy, :, gz, sz, :] = blocks
    return vol


def densify_sparse_volume(corner_vals, top_idx, refined, resolution: int,
                          factor: int = 8, pack_bits: int = 4,
                          band_scale: float = 4.0,
                          scan_marks: np.ndarray | None = None,
                          out: np.ndarray | None = None) -> np.ndarray:
    """Host-side reassembly of the sparse two-phase result (NumPy).

    With ``scan_marks`` (from sparse_scan_cells), only marked cells and
    their 1-cell neighborhood are materialized — everything the masked
    marching kernel can read — cutting host writes from res^3 floats to
    the surface neighborhood (~30x at 512^3).  Voxels outside that region
    are UNINITIALIZED; pass scan_marks=None for a fully-dense volume.

    ``out``: optional preallocated [res, res, res] float32 buffer.  REUSE
    IT across subjects: under sandboxed kernels, first-touch page faults
    on a fresh 536 MB allocation can cost tens of seconds; a warm buffer
    is written at memory speed.
    """
    res = resolution
    n = res // factor
    n1 = n + 1
    levels = (1 << pack_bits) - 1

    def unquantize(q):
        band = q.astype(np.float32) / levels
        return (band - 0.5) / band_scale + 0.5

    c = unquantize(np.asarray(corner_vals)).reshape(n1, n1, n1)
    top_idx = np.asarray(top_idx)
    refined = np.asarray(refined)
    if pack_bits == 4:  # unpack two voxels per byte
        lo = refined & 0x0F
        hi = refined >> 4
        refined = np.stack([lo, hi], axis=-1).reshape(refined.shape[0], -1)

    stack8 = np.stack(
        [
            c[:-1, :-1, :-1], c[:-1, :-1, 1:], c[:-1, 1:, :-1], c[:-1, 1:, 1:],
            c[1:, :-1, :-1], c[1:, :-1, 1:], c[1:, 1:, :-1], c[1:, 1:, 1:],
        ],
        axis=0,
    )
    fill = (0.5 * (stack8.min(axis=0) + stack8.max(axis=0))).astype(
        np.float32)                                           # [n, n, n]
    if scan_marks is None:
        dil = np.ones((n, n, n), dtype=bool)
    else:
        # materialize only the marked cells + their 26-neighborhood
        dil = scan_marks.copy()
        for ax in range(3):
            grown = dil.copy()
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[ax] = slice(0, n - 1)
            sl_hi[ax] = slice(1, n)
            grown[tuple(sl_lo)] |= dil[tuple(sl_hi)]
            grown[tuple(sl_hi)] |= dil[tuple(sl_lo)]
            dil = grown

    blocks = unquantize(refined).reshape(-1, factor, factor, factor)
    from ..native import load_meshio
    lib = load_meshio()
    if lib is not None:
        import ctypes

        vol = out if out is not None else np.empty((res, res, res),
                                                   np.float32)
        fill_c = np.ascontiguousarray(fill)
        marks_c = np.ascontiguousarray(dil.astype(np.uint8))
        top_c = np.ascontiguousarray(top_idx.astype(np.int32))
        ref_c = np.ascontiguousarray(blocks.astype(np.float32))
        lib.densify(
            vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(res),
            fill_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            marks_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n), ctypes.c_int(factor),
            top_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(top_c)),
            ref_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            0,
        )
        return vol

    # NumPy fallback
    if scan_marks is None:
        vol = np.broadcast_to(
            fill[:, None, :, None, :, None],
            (n, factor, n, factor, n, factor),
        ).reshape(res, res, res).copy()
    else:
        vol = out if out is not None else np.empty((res, res, res),
                                                   np.float32)
        kx, ky, kz = np.nonzero(dil)
        v6l = vol.reshape(n, factor, n, factor, n, factor)
        v6l[kx, :, ky, :, kz, :] = fill[kx, ky, kz][:, None, None, None]

    cbx = top_idx // (n * n)
    cby = (top_idx // n) % n
    cbz = top_idx % n
    blocks = unquantize(refined).reshape(-1, factor, factor, factor)
    v6 = vol.reshape(n, factor, n, factor, n, factor)
    # advanced indexing on dims 0/2/4 -> [K, f, f, f] view assignment
    v6[cbx, :, cby, :, cbz, :] = blocks
    return vol
