"""Pallas TPU kernel: fused per-point occupancy MLP.

The per-point MLP chain (PointMLP) is a sequence of small matmuls over the
point axis; under XLA each layer round-trips its [N, C] activations through
HBM.  All layer weights of both PIFu MLPs fit comfortably in VMEM (~4.2 MB
coarse, ~0.6 MB fine), so this kernel tiles the point axis and runs the
WHOLE chain per tile with activations resident in VMEM: HBM traffic drops
to one input read + one output write.

Scope: the inference/query path with mlp_norm='none' (the norm-free chain;
GroupNorm couples points across the whole chunk and cannot be tiled without
changing its semantics — the XLA path remains the default for 'group').

Measured on v5e (262144 points, coarse-MLP shape, f32): XLA 9.1 ms vs this
kernel 9.6 ms at block=1024 — XLA already fuses this chain to within ~5% of
the matmul roofline, so the kernel is kept as an optional path and a
baseline for future fused gather+MLP work, not the default.  block must
keep (block x widest-layer + weights) under the 16 MB VMEM budget;
block=1024 is the practical ceiling for the coarse MLP.

Semantics parity with PointMLP (models/mlp.py): residual layers concatenate
the ORIGINAL input, leaky_relu(0.01) between layers, sigmoid head.

All channel sizes are zero-padded to multiples of 128 (lane width) at the
wrapper level; zero weights keep results exact.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _r128(n: int) -> int:
    return -(-n // 128) * 128


def fused_point_mlp(
    x: jax.Array,
    weights: Sequence[tuple[jax.Array, jax.Array]],
    res_layers: Sequence[int] = (),
    last_op: str = "sigmoid",
    block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x [N, C0] -> [N, C_out] through the fused MLP chain.

    Args:
        weights: per-layer (kernel [C_in(+C0 if residual), C_out], bias).
        res_layers: layers whose input is concat(h, x) (MLP.py:31-36).
        block: points per grid step (multiple of 8).
    """
    N, C0 = x.shape
    n_layers = len(weights)
    res_set = frozenset(res_layers)

    # VMEM guard: block activations (block x widest layer x 4B, x2 for the
    # residual concat) + weights must fit the ~16MB scoped budget
    widest = max(w.shape[1] for w, _ in weights) + _r128(C0)
    w_bytes = sum(w.size * 4 for w, _ in weights)
    while block > 128 and block * widest * 4 * 2 + w_bytes > 14 * 2 ** 20:
        block //= 2

    C0p = _r128(C0)
    xp = _pad_to(x, C0p, 1)
    n_blocks = -(-N // block)
    Np = n_blocks * block
    xp = _pad_to(xp, Np, 0)

    # pad weights: rows to padded input width, cols to multiple of 128
    padded = []
    out_dims = []
    in_dim = C0p
    for i, (w, b) in enumerate(weights):
        rows = in_dim + (C0p if i in res_set else 0)
        cols = _r128(w.shape[1])
        wp = jnp.zeros((rows, cols), w.dtype)
        r0 = in_dim - _r128(weights[i - 1][0].shape[1]) if False else 0
        # place the real weights: first the h-part rows, then (if residual)
        # the x-part rows at offset in_dim
        h_rows = w.shape[0] - (C0 if i in res_set else 0)
        wp = wp.at[:h_rows, : w.shape[1]].set(w[:h_rows])
        if i in res_set:
            wp = wp.at[in_dim:in_dim + C0, : w.shape[1]].set(w[h_rows:])
        bp = _pad_to(b, cols, 0)
        padded.append((wp, bp))
        out_dims.append(cols)
        in_dim = cols

    out_cols = out_dims[-1]

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        w_refs = refs[:-1]
        x0 = x_ref[:]
        h = x0
        for i in range(n_layers):
            w_ref = w_refs[2 * i]
            b_ref = w_refs[2 * i + 1]
            inp = (
                jnp.concatenate([h, x0], axis=-1) if i in res_set else h
            )
            h = (
                jnp.dot(inp, w_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:]
            )
            if i != n_layers - 1:
                h = jnp.where(h >= 0, h, 0.01 * h)  # leaky_relu(0.01)
        if last_op == "sigmoid":
            h = jax.nn.sigmoid(h)
        out_ref[:] = h

    w_specs = []
    w_args = []
    for wp, bp in padded:
        w_specs.append(pl.BlockSpec(wp.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
        w_specs.append(pl.BlockSpec((1, bp.shape[0]), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))
        w_args.append(wp)
        w_args.append(bp.reshape(1, -1))

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block, C0p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((block, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, out_cols), jnp.float32),
        interpret=interpret,
    )(xp, *w_args)

    return out[:N, : weights[-1][0].shape[1]]


def mlp_weights_from_params(params: dict, n_layers: int):
    """Extract (kernel, bias) pairs from a PointMLP param subtree."""
    return [
        (params[f"dense{i}"]["kernel"], params[f"dense{i}"]["bias"])
        for i in range(n_layers)
    ]
