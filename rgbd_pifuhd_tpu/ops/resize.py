"""Image resize / pooling ops with exact PyTorch semantics.

The hourglass upsample path uses ``F.interpolate(scale_factor=2,
mode='bicubic', align_corners=True)`` (/root/reference/Filter.py:125) and the
normal-map path uses bilinear align_corners=True upsampling
(PIFuNetwNML.py:91, PIFuMRNet.py:99).  ``jax.image.resize`` uses half-pixel
centers and a different cubic kernel, so we implement the align_corners
variants exactly: for static shapes the tap indices and weights are computed
at trace time (NumPy) and the resize becomes two cheap gather+weighted-sum
passes that XLA fuses.

All ops take NHWC ``[B, H, W, C]``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), a=-0.75 as in PyTorch/OpenCV."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _resize_taps(in_size: int, out_size: int, mode: str):
    """Static tap indices [out, K] and weights [out, K] for align_corners=True."""
    if out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        src = np.zeros((1,), dtype=np.float64)
    base = np.floor(src).astype(np.int64)
    t = src - base
    if mode == "bilinear":
        idx = np.stack([base, base + 1], axis=1)  # [out, 2]
        w = np.stack([1.0 - t, t], axis=1)
    elif mode == "bicubic":
        idx = np.stack([base - 1, base, base + 1, base + 2], axis=1)  # [out, 4]
        w = np.stack(
            [
                _cubic_weight(1.0 + t),
                _cubic_weight(t),
                _cubic_weight(1.0 - t),
                _cubic_weight(2.0 - t),
            ],
            axis=1,
        )
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    idx = np.clip(idx, 0, in_size - 1)  # border clamp, matches torch
    # NOTE: return NumPy (not jnp) — this function is lru_cached and may be
    # called inside a jit trace; caching device arrays would leak tracers.
    return idx.astype(np.int32), w.astype(np.float32)


def _resize_axis(x: jax.Array, out_size: int, axis: int, mode: str) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size and mode == "bilinear":
        return x
    idx, w = _resize_taps(in_size, out_size, mode)
    gathered = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis : axis + 1] = [out_size, idx.shape[1]]
    gathered = gathered.reshape(new_shape)
    w_shape = [1] * len(new_shape)
    w_shape[axis] = out_size
    w_shape[axis + 1] = idx.shape[1]
    out = jnp.sum(gathered * w.astype(x.dtype).reshape(w_shape), axis=axis + 1)
    return out


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """``F.interpolate(mode='bilinear', align_corners=True)`` on NHWC."""
    x = _resize_axis(x, out_hw[0], axis=1, mode="bilinear")
    x = _resize_axis(x, out_hw[1], axis=2, mode="bilinear")
    return x


def resize_bicubic_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """``F.interpolate(mode='bicubic', align_corners=True)`` on NHWC."""
    x = _resize_axis(x, out_hw[0], axis=1, mode="bicubic")
    x = _resize_axis(x, out_hw[1], axis=2, mode="bicubic")
    return x


def upsample2x_bicubic(x: jax.Array) -> jax.Array:
    """2x bicubic align_corners=True upsample (hourglass up path)."""
    B, H, W, C = x.shape
    return resize_bicubic_align_corners(x, (2 * H, 2 * W))


def avg_pool2d(
    x: jax.Array,
    window: int = 2,
    stride: int | None = None,
    padding: int = 0,
    count_include_pad: bool = True,
) -> jax.Array:
    """``F.avg_pool2d`` on NHWC with optional count_include_pad=False.

    The hourglass down path uses window=2 stride=2 (Filter.py:113,191); the
    pix2pixHD pyramid uses window=3 stride=2 pad=1 count_include_pad=False
    (networks.py:113).
    """
    stride = window if stride is None else stride
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    if count_include_pad or padding == 0:
        return summed / float(window * window)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return summed / counts
