"""Geometry / projection / pixel-aligned sampling primitives.

TPU-native re-design of the reference's L0 geometry layer
(/root/reference/BasePIFuNet.py:11-65): same math, new layouts.

Layout conventions (framework-wide):
    images / feature maps : ``[B, H, W, C]``  (NHWC — XLA's preferred TPU
                             conv layout; channels ride the 128-lane axis)
    points                : ``[B, N, 3]``     (N = shardable point axis)
    uv                    : ``[B, N, 2]``     normalized to [-1, 1]
    calib                 : ``[B, 3, 4]`` or ``[B, 4, 4]``

The reference's ``index(feat[B,C,H,W], uv[B,2,N]) -> [B,C,N]`` becomes
``index(feat[B,H,W,C], uv[B,N,2]) -> [B,N,C]`` here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sampling of image features at normalized coordinates.

    Matches ``torch.nn.functional.grid_sample(..., mode='bilinear',
    padding_mode='zeros', align_corners=True)`` semantics bit-close
    (the parity linchpin; see /root/reference/BasePIFuNet.py:22).

    With align_corners=True, u = -1 maps to pixel center 0 and u = +1 to
    pixel center W-1.  Out-of-range taps contribute zero (zeros padding).

    Args:
        feat: ``[B, H, W, C]`` feature map.
        uv:   ``[B, N, 2]`` coordinates, ``uv[..., 0]`` = x (width axis),
              ``uv[..., 1]`` = y (height axis), in [-1, 1].

    Returns:
        ``[B, N, C]`` sampled features.
    """
    B, H, W, C = feat.shape
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)  # [B, N]
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # Bilinear weights (computed before clipping so weights stay exact).
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        """Gather feat[b, iy, ix, :] with zero for out-of-bounds taps."""
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat_idx = iyc * W + ixc  # [B, N]
        flat = feat.reshape(B, H * W, C)
        g = jnp.take_along_axis(flat, flat_idx[..., None], axis=1)  # [B,N,C]
        return g * valid[..., None].astype(feat.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[..., None]
        + gather(x1, y0) * (wx1 * wy0)[..., None]
        + gather(x0, y1) * (wx0 * wy1)[..., None]
        + gather(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


# The reference calls this op `index` (BasePIFuNet.py:11-23); keep the name.
index = grid_sample_bilinear


def orthogonal(points: jax.Array, calib: jax.Array) -> jax.Array:
    """Orthogonal projection of world points into screen space.

    Equivalent to the reference's ``orthogonal`` (BasePIFuNet.py:25-43):
    ``pts = rot @ points + trans`` with rot = calib[:, :3, :3] and
    trans = calib[:, :3, 3].

    Args:
        points: ``[B, N, 3]`` (or ``[..., N, 3]``, batched arbitrarily).
        calib:  ``[B, 3, 4]`` or ``[B, 4, 4]`` (extra row ignored).

    Returns:
        ``[B, N, 3]`` screen-space coordinates.
    """
    rot = calib[..., :3, :3]
    trans = calib[..., :3, 3]
    # [..., N, 3] @ [..., 3, 3]^T + [..., 1, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, points) + trans[..., None, :]


def perspective(points: jax.Array, calib: jax.Array) -> jax.Array:
    """Perspective projection of world points into screen space.

    Equivalent to the reference's ``perspective`` (BasePIFuNet.py:45-65):
    homogeneous transform then divide x, y by z; z passed through.
    """
    homo = orthogonal(points, calib)  # [..., N, 3]
    xy = homo[..., :2] / homo[..., 2:3]
    return jnp.concatenate([xy, homo[..., 2:3]], axis=-1)


PROJECTIONS = {"orthogonal": orthogonal, "perspective": perspective}


def in_bounds_mask(xyz: jax.Array, dims: int = 3) -> jax.Array:
    """[-1, 1] bounding-box mask over the first ``dims`` coordinates.

    The coarse model masks on x, y and z (PIFuNetwNML.py:115-117); the fine
    model masks on x, y only (PIFuMRNet.py:150-152).

    Args:
        xyz:  ``[..., N, 3]`` projected coordinates.
        dims: number of leading coordinates to test (2 or 3).

    Returns:
        ``[..., N, 1]`` float mask (1.0 inside, 0.0 outside).
    """
    inside = jnp.all(
        (xyz[..., :dims] >= -1.0) & (xyz[..., :dims] <= 1.0), axis=-1
    )
    return inside[..., None].astype(xyz.dtype)


def depth_normalize(
    xyz: jax.Array, load_size: int = 1024, z_size: float = 200.0
) -> jax.Array:
    """Normalized-depth spatial feature.

    Equivalent to the reference's DepthNormalizer
    (/root/reference/DepthNormalizer.py:17-25):
    ``z_feat = z * (load_size // 2) / z_size``.

    Args:
        xyz: ``[..., N, 3]`` screen-space points.

    Returns:
        ``[..., N, 1]`` z feature.
    """
    return xyz[..., 2:3] * (load_size // 2) / z_size
