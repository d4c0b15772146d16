"""Pallas TPU kernel: fused bilinear-gather + per-point MLP field query.

STATUS — measured NEGATIVE result, kept as a tested reference
implementation: on the real v5e at flagship shapes this kernel runs at
7.7 Mpts/s vs 17.8 Mpts/s for the XLA path (scripts/pallas_query_bench.py;
numerics parity max |diff| 1.4e-3 bf16).  The aligned-block gather +
masked row-reduction must run in a sequential per-point fori_loop
(Mosaic forbids unaligned dynamic VMEM slices), and that loop's scalar
overhead (~65 ns/pt/level) dominates; XLA's batched gather lowering
vectorizes the same access pattern.  Full analysis:
docs/PERFORMANCE.md "Optimization journey" item 3.

The field-phase hot loop (reference: mesh_util.py:98-114 eval_func +
MLP.py:12-75) is, per query point: project -> 4-tap bilinear gather from
the encoder feature map -> concat a spatial feature -> MLP chain.  Under
XLA the gather lowers to per-point dynamic loads from HBM and each MLP
layer round-trips [N, C] activations through HBM.  This kernel keeps the
WHOLE feature map resident in VMEM (coarse 128x128x256 bf16 = 8.4 MB,
fine 256x256x16 = 2 MB) and, per tile of K points:

    1. gathers the 2x2 taps with TWO dynamic-slice reads per point —
       taps (x0, y) and (x0+1, y) are ADJACENT ROWS of the [H*W, C]
       feature layout.  Mosaic requires dynamic dim-0 indices to be
       provably sublane-aligned ("cannot statically prove that index
       ... is a multiple of 8"), so each read is a 2*ALIGN-row block
       at ``(row // ALIGN) * ALIGN`` (``pl.multiple_of`` carries the
       proof; ALIGN=16 covers bf16 packing) and the bilinear combine
       happens in the same loop step as a masked row-reduction: tap
       weights scattered onto iota==offset masks over the block rows,
       multiply-accumulated down to one [C] row per point;
    2. runs the full MLP chain on the MXU with activations in VMEM,
       including GroupNorm (stats over the tile — see below), residual
       input concats, leaky_relu, the merge-layer phi capture, and the
       sigmoid head.

Tap weights (computed in XLA by ``gather_rows_weights``, fused into
neighbouring elementwise work) use the hat formulation: pixel ``p``
contributes ``relu(1 - |x - p|)`` — for the clipped pixel pair this is
EXACTLY grid_sample's bilinear weight with zeros padding and
align_corners=True, including every out-of-range case (ops/geometry.py
``grid_sample_bilinear`` is the parity reference).

GroupNorm scope: flax/torch GroupNorm over [N, C] couples ALL points of
a chunk (stats over N x C/G) — the reference field is chunk-dependent by
construction.  The kernel computes stats over its K-point tile; for
exact parity the XLA comparison path reshapes its chunk to [n/K, K, C]
(``gn_scoped_apply``) so both paths normalize over identical point
sets.  K defaults to 512 — stats over >=2048 values per group,
comfortably stable (the trained flagship was itself trained with a
different scope, its 4096-sample batches).

Channel padding: all widths are zero-padded to multiples of 128 (lane
width).  The padded input row is laid out ``[feat_pad | extra | zeros]``
(feat and extra each padded independently) and the layer-0 / residual
weight rows are scattered to match.  Real hidden widths in the flagship
chains (1024/512/256/128) are already lane multiples, so GroupNorm
groups never see padding there; for non-multiple widths (tiny test
models) the padded tail stays exactly zero through matmul+GN+leaky.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _r128(n: int) -> int:
    return -(-n // 128) * 128


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def gather_rows_weights(uv: jax.Array, H: int, W: int):
    """Per-point paired-row indices + hat tap weights for the gather.

    Args:
        uv: ``[N, 2]`` normalized coords (x, y) in [-1, 1]
            (align_corners=True mapping, grid_sample parity).

    Returns:
        rows: ``[N, 2]`` int32 — flat row index of the (y0, x_left) pair
              and the (y1, x_left) pair in the [H*W, C] feature layout
              (tap pair p, p+1 = pixels x_left, x_left+1).
        wts:  ``[N, 4]`` f32 — weights for taps (y0,xl), (y0,xl+1),
              (y1,xl), (y1,xl+1); out-of-range taps weigh exactly 0.
    """
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)
    xl = jnp.clip(jnp.floor(x), 0, max(W - 2, 0))
    yt = jnp.clip(jnp.floor(y), 0, max(H - 2, 0))
    # hat weights: pixel p gets relu(1 - |x - p|) — equals the bilinear
    # weight for in-range taps and 0 for every out-of-range tap
    wxl = jnp.maximum(0.0, 1.0 - jnp.abs(x - xl))
    wxr = jnp.maximum(0.0, 1.0 - jnp.abs(x - (xl + 1.0)))
    wyt = jnp.maximum(0.0, 1.0 - jnp.abs(y - yt))
    wyb = jnp.maximum(0.0, 1.0 - jnp.abs(y - (yt + 1.0)))
    rows = jnp.stack(
        [yt * W + xl, (yt + 1.0) * W + xl], axis=-1).astype(jnp.int32)
    wts = jnp.stack([wyt * wxl, wyt * wxr, wyb * wxl, wyb * wxr], axis=-1)
    return rows, wts.astype(jnp.float32)


class _LayerPack(NamedTuple):
    """Padded per-layer parameters (host-side prep, device constants)."""

    kernels: list         # [rows_pad, cols_pad] per layer
    biases: list          # [1, cols_pad] f32
    gn_scales: list       # [1, cols_pad] f32 or None
    gn_biases: list       # [1, cols_pad] f32 or None
    out_dims: list        # padded output widths
    real_dims: list       # real output widths


def _pack_layers(weights, gn_params, res_layers, C, c_feat, E, in_pad,
                 compute_dtype) -> _LayerPack:
    """Zero-pad kernels/biases/GN affines to lane multiples.

    The padded input row is ``[feat (C real of c_feat) | extra (E) |
    zeros]``; layer-0 and residual x-part rows are scattered to match.
    """
    res_set = frozenset(res_layers)

    def expand_input_rows(block, cols):
        """[C+E, cols] original-input rows -> [in_pad, cols] padded."""
        out = jnp.zeros((in_pad, cols), jnp.float32)
        out = out.at[:C, :].set(block[:C])
        if E:
            out = out.at[c_feat:c_feat + E, :].set(block[C:C + E])
        return out

    ks, bs, gs, gb, od, rd = [], [], [], [], [], []
    prev_pad, prev_real = in_pad, C + E
    for i, (w, b) in enumerate(weights):
        cols_real = w.shape[1]
        cols = _r128(cols_real)
        wcp = _pad_to(jnp.asarray(w, jnp.float32), cols, 1)
        if i == 0:
            wp = expand_input_rows(wcp, cols)
        elif i in res_set:
            wp = jnp.zeros((prev_pad + in_pad, cols), jnp.float32)
            wp = wp.at[:prev_real].set(wcp[:prev_real])
            wp = wp.at[prev_pad:].set(expand_input_rows(wcp[prev_real:],
                                                        cols))
        else:
            wp = jnp.zeros((prev_pad, cols), jnp.float32)
            wp = wp.at[:prev_real].set(wcp)
        ks.append(wp.astype(compute_dtype))
        bs.append(_pad_to(jnp.asarray(b, jnp.float32), cols,
                          0).reshape(1, -1))
        if gn_params[i] is not None:
            s, bb = gn_params[i]
            gs.append(_pad_to(jnp.asarray(s, jnp.float32), cols,
                              0).reshape(1, -1))
            gb.append(_pad_to(jnp.asarray(bb, jnp.float32), cols,
                              0).reshape(1, -1))
        else:
            gs.append(None)
            gb.append(None)
        od.append(cols)
        rd.append(cols_real)
        prev_pad, prev_real = cols, cols_real
    return _LayerPack(ks, bs, gs, gb, od, rd)


def _group_norm_tile(h32, scale, bias, num_groups, real_c, eps=1e-5):
    """GroupNorm over a [K, C] tile (stats over K x C/G), f32 in/out.

    The channel->group reduction and the group->channel broadcast are
    expressed as matmuls with an iota-built [C, G] indicator matrix —
    Mosaic rejects 1D<->2D vector reshapes inside kernels, and the
    [1, C] x [C, G] dots are a few kMACs, noise next to the layer
    matmul.  Padded cols (real_c < C): the indicator row is all-zero,
    so mean/inv broadcast as 0 there; with the 0-padded affine the
    padded tail stays exactly 0.
    """
    K, C = h32.shape
    cg = real_c // num_groups
    cid = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
    gid = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    member = jnp.where((cid // cg == gid) & (cid < real_c), 1.0, 0.0)
    s = jnp.sum(h32, axis=0, keepdims=True)            # [1, C]
    ss = jnp.sum(h32 * h32, axis=0, keepdims=True)
    sg = jnp.dot(s, member, preferred_element_type=jnp.float32)  # [1, G]
    ssg = jnp.dot(ss, member, preferred_element_type=jnp.float32)
    n = K * cg
    mean_g = sg / n
    var_g = ssg / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, member.T,
                     preferred_element_type=jnp.float32)         # [1, C]
    inv_c = jnp.dot(inv_g, member.T,
                    preferred_element_type=jnp.float32)
    return (h32 - mean_c) * inv_c * scale + bias


_ALIGN = 16        # sublane alignment Mosaic can honor for f32 AND bf16


def _query_kernel(feat_ref, rows_ref, wts_ref, extra_ref, *refs,
                  n_layers, res_set, real_dims, gn_mask, num_groups,
                  merge, last_op, K, c_feat, c_extra_real, compute_dtype,
                  in_pad):
    """One grid step: gather K points' taps, combine, run the MLP chain."""
    g_ref = refs[-1]           # scratch [K, c_feat] f32 (combined taps)
    pred_ref = refs[-3]
    phi_ref = refs[-2]
    w_refs = refs[:-3]

    blk = 2 * _ALIGN
    io = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)

    def body(i, _):
        ra = rows_ref[0, 0, i]
        rb = rows_ref[0, 1, i]
        ba = pl.multiple_of((ra // _ALIGN) * _ALIGN, _ALIGN)
        bb = pl.multiple_of((rb // _ALIGN) * _ALIGN, _ALIGN)
        oa = ra - ba                     # in [0, ALIGN); oa+1 < blk
        ob = rb - bb
        # scatter the 4 hat weights onto block-row masks and reduce:
        # rows oa, oa+1 of block a carry taps (y0,xl), (y0,xl+1);
        # rows ob, ob+1 of block b carry taps (y1,xl), (y1,xl+1)
        wa = (jnp.where(io == oa, wts_ref[0, 0, i], 0.0)
              + jnp.where(io == oa + 1, wts_ref[0, 1, i], 0.0))  # [blk, 1]
        wb = (jnp.where(io == ob, wts_ref[0, 2, i], 0.0)
              + jnp.where(io == ob + 1, wts_ref[0, 3, i], 0.0))
        blk_a = feat_ref[pl.ds(ba, blk), :].astype(jnp.float32)
        blk_b = feat_ref[pl.ds(bb, blk), :].astype(jnp.float32)
        g_ref[i, :] = jnp.sum(blk_a * wa + blk_b * wb, axis=0)
        return 0

    jax.lax.fori_loop(0, K, body, 0)

    feat_pt = g_ref[:]                                 # [K, c_feat] f32

    # assemble padded input row: [feat_pad | extra | zeros]
    extra = extra_ref[:][:, :c_extra_real].astype(jnp.float32)
    pad_w = in_pad - c_feat - c_extra_real
    parts = [feat_pt, extra]
    if pad_w:
        parts.append(jnp.zeros((K, pad_w), jnp.float32))
    x0 = jnp.concatenate(parts, axis=-1).astype(compute_dtype)

    h = x0
    h32 = None
    ri = 0
    phi_written = False
    for i in range(n_layers):
        kern = w_refs[ri][:]
        bias = w_refs[ri + 1][:]
        ri += 2
        inp = jnp.concatenate([h, x0], axis=-1) if i in res_set else h
        h32 = (jnp.dot(inp, kern, preferred_element_type=jnp.float32)
               + bias)
        if i != n_layers - 1:
            if gn_mask[i]:
                scale = w_refs[ri][:]
                gnb = w_refs[ri + 1][:]
                ri += 2
                h32 = _group_norm_tile(h32, scale, gnb, num_groups,
                                       real_dims[i])
            h32 = jnp.where(h32 >= 0, h32, 0.01 * h32)
        if i == merge:
            phi_ref[:] = h32.astype(phi_ref.dtype)
            phi_written = True
        h = h32.astype(compute_dtype)
    out = h32
    if last_op == "sigmoid":
        out = jax.nn.sigmoid(h32)
    pred_ref[:] = out.astype(pred_ref.dtype)
    if not phi_written:
        phi_ref[:] = jnp.zeros_like(phi_ref)


def fused_gather_mlp(
    feat: jax.Array,
    uv: jax.Array,
    extra: jax.Array,
    weights: Sequence[tuple[jax.Array, jax.Array]],
    gn_params: Sequence[tuple[jax.Array, jax.Array] | None] | None = None,
    res_layers: Sequence[int] = (),
    merge_layer: int = -1,
    num_groups: int = 32,
    last_op: str = "sigmoid",
    tile: int = 512,
    compute_dtype=jnp.bfloat16,
    feat_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused bilinear-gather + MLP over ``[N]`` query points.

    Args:
        feat: ``[H, W, C]`` feature map (single image).
        uv: ``[N, 2]`` normalized coords in [-1, 1].
        extra: ``[N, E]`` extra input channels appended after the gathered
            features (z-feat for the coarse level, phi for the fine).
        weights: per-layer (kernel, bias) — PointMLP layout.
        gn_params: per-layer (gn_scale, gn_bias) or None per layer;
            GroupNorm stats are computed over each ``tile`` of points.
        merge_layer: layer whose post-activation output is returned as
            phi (coarse level); -1 disables.

    Returns:
        (pred ``[N, C_out]`` f32, phi ``[N, C_merge]`` f32 or None)
    """
    H, W, C = feat.shape
    N, E = extra.shape
    n_layers = len(weights)
    res_set = frozenset(int(r) for r in res_layers)
    merge = -1 if merge_layer is None else int(merge_layer)
    if gn_params is None:
        gn_params = [None] * n_layers

    c_feat = _r128(C)
    in_pad = _r128(c_feat + E)
    feat2d = feat.reshape(H * W, C).astype(feat_dtype)
    # rows pad: aligned-block reads reach ((H*W-2)//ALIGN)*ALIGN + 2*ALIGN
    rows_pad = (-(-(H * W) // _ALIGN)) * _ALIGN + 2 * _ALIGN
    feat2d = _pad_to(_pad_to(feat2d, c_feat, 1), rows_pad, 0)

    rows, wts = gather_rows_weights(uv, H, W)
    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    # SMEM layout: point axis MINOR ([n_tiles, 2|4, tile]) — a (tile, 2)
    # SMEM block gets its minor dim padded and blows the 1 MB budget
    rows = _pad_to(rows, Np, 0).reshape(n_tiles, tile, 2).transpose(0, 2, 1)
    wts = _pad_to(wts, Np, 0).reshape(n_tiles, tile, 4).transpose(0, 2, 1)
    extra_p = _pad_to(_pad_to(extra, _r128(max(E, 1)), 1), Np, 0)
    e_pad = extra_p.shape[1]

    pack = _pack_layers(weights, gn_params, res_set, C, c_feat, E, in_pad,
                        compute_dtype)
    gn_mask = [g is not None for g in pack.gn_scales]

    w_args, w_specs = [], []
    for i in range(n_layers):
        for arr in [pack.kernels[i], pack.biases[i]] + (
                [pack.gn_scales[i], pack.gn_biases[i]] if gn_mask[i]
                else []):
            w_args.append(arr)
            w_specs.append(pl.BlockSpec(arr.shape, lambda g: (0, 0),
                                        memory_space=pltpu.VMEM))

    out_cols = pack.out_dims[-1]
    phi_cols = pack.out_dims[merge] if 0 <= merge < n_layers else 128

    kernel = partial(
        _query_kernel, n_layers=n_layers, res_set=res_set,
        real_dims=pack.real_dims, gn_mask=gn_mask, num_groups=num_groups,
        merge=merge, last_op=last_op, K=tile, c_feat=c_feat,
        c_extra_real=E, compute_dtype=compute_dtype, in_pad=in_pad)

    pred, phi = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((feat2d.shape[0], c_feat), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, tile), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, e_pad), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=(
            pl.BlockSpec((tile, out_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, phi_cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, out_cols), jnp.float32),
            jax.ShapeDtypeStruct((Np, phi_cols), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, c_feat), jnp.float32),
        ],
        # the whole feature map lives in VMEM (coarse 8.4 MB bf16; fine
        # 2 MB data but 16.8 MB in lane-padded layout) — the default
        # 16 MB scoped-vmem cap is too small, the chip's VMEM is not
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(feat2d, rows, wts, extra_p, *w_args)

    pred = pred[:N, : pack.real_dims[-1]]
    phi_out = None
    if 0 <= merge < n_layers:
        phi_out = phi[:N, : pack.real_dims[merge]]
    return pred, phi_out


def mlp_params_from_tree(params: dict, n_layers: int, norm: str):
    """Extract (weights, gn_params) lists from a PointMLP param subtree."""
    weights = [
        (params[f"dense{i}"]["kernel"], params[f"dense{i}"]["bias"])
        for i in range(n_layers)
    ]
    gn = []
    for i in range(n_layers):
        key = f"norm{i}"
        if norm == "group" and key in params and i != n_layers - 1:
            gn.append((params[key]["scale"], params[key]["bias"]))
        else:
            gn.append(None)
    return weights, gn


def gn_scoped_apply(mlp_module, params, x, scope: int):
    """Reference XLA path with GroupNorm stats over ``scope``-point tiles.

    Reshapes ``[B, N, C]`` to ``[B * N/scope, scope, C]`` so flax
    GroupNorm normalizes over the same point sets the kernel tiles —
    the exact-parity comparison target for ``fused_gather_mlp``.
    """
    B, N, C = x.shape
    if N % scope:
        raise ValueError(f"N={N} not a multiple of gn scope {scope}")
    xs = x.reshape(B * (N // scope), scope, C)
    pred, phi = mlp_module.apply(params, xs)
    pred = pred.reshape(B, N, -1)
    phi = None if phi is None else phi.reshape(B, N, -1)
    return pred, phi
