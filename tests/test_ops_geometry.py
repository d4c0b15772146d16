"""Golden parity tests: ops.geometry vs PyTorch reference ops.

The PyTorch library ops (grid_sample, baddbmm) define the semantics the
reference relies on (/root/reference/BasePIFuNet.py:11-65); we assert our
JAX implementations match them bit-close on random inputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rgbd_pifuhd_tpu.ops import geometry as G


def torch_index(feat_nchw, uv_b2n):
    uv = uv_b2n.transpose(1, 2).unsqueeze(2)  # [B, N, 1, 2]
    s = F.grid_sample(feat_nchw, uv, mode="bilinear", padding_mode="zeros",
                      align_corners=True)
    return s[:, :, :, 0]  # [B, C, N]


@pytest.mark.parametrize("H,W", [(7, 5), (32, 32), (128, 128)])
def test_grid_sample_matches_torch(rng, H, W):
    B, C, N = 2, 6, 217
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # include in-range, boundary, and out-of-range coords
    uv = rng.uniform(-1.4, 1.4, size=(B, N, 2)).astype(np.float32)
    uv[:, :4] = np.array([[-1, -1], [1, 1], [-1, 1], [0, 0]], np.float32)

    ours = np.asarray(G.grid_sample_bilinear(jnp.asarray(feat), jnp.asarray(uv)))

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2).contiguous()
    t_uv = torch.from_numpy(uv).permute(0, 2, 1).contiguous()
    theirs = torch_index(t_feat, t_uv).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_orthogonal_matches_torch(rng):
    B, N = 3, 50
    points = rng.standard_normal((B, N, 3)).astype(np.float32)
    calib = rng.standard_normal((B, 4, 4)).astype(np.float32)

    ours = np.asarray(G.orthogonal(jnp.asarray(points), jnp.asarray(calib)))

    tp = torch.from_numpy(points).permute(0, 2, 1)  # [B,3,N]
    tc = torch.from_numpy(calib)
    rot = tc[:, :3, :3]
    trans = tc[:, :3, 3:4]
    theirs = torch.baddbmm(trans, rot, tp).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_perspective_matches_torch(rng):
    B, N = 2, 40
    points = rng.standard_normal((B, N, 3)).astype(np.float32) + 5.0
    calib = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    calib[:, :3, 3] = rng.standard_normal((B, 3)).astype(np.float32)

    ours = np.asarray(G.perspective(jnp.asarray(points), jnp.asarray(calib)))

    tp = torch.from_numpy(points).permute(0, 2, 1)
    tc = torch.from_numpy(calib)
    homo = torch.baddbmm(tc[:, :3, 3:4], tc[:, :3, :3], tp)
    xy = homo[:, :2, :] / homo[:, 2:3, :]
    theirs = torch.cat([xy, homo[:, 2:3, :]], 1).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_in_bounds_mask():
    xyz = jnp.array([[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [1.1, 0.0, 0.0],
                      [0.0, 0.0, -1.2], [-1.0, 0.5, 0.99]]])
    m3 = np.asarray(G.in_bounds_mask(xyz, dims=3))[..., 0]
    np.testing.assert_array_equal(m3[0], [1, 1, 0, 0, 1])
    m2 = np.asarray(G.in_bounds_mask(xyz, dims=2))[..., 0]
    np.testing.assert_array_equal(m2[0], [1, 1, 0, 1, 1])


def test_depth_normalize():
    xyz = jnp.ones((1, 4, 3)) * 2.0
    z = np.asarray(G.depth_normalize(xyz, load_size=1024, z_size=200.0))
    np.testing.assert_allclose(z, 2.0 * 512 / 200.0)
