"""Golden parity tests: ops.resize vs torch F.interpolate / F.avg_pool2d."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rgbd_pifuhd_tpu.ops import resize as R


def to_nchw(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("H,W,out", [(8, 8, (16, 16)), (13, 7, (26, 14)),
                                     (16, 16, (9, 21))])
def test_bilinear_align_corners(rng, H, W, out):
    x = rng.standard_normal((2, H, W, 3)).astype(np.float32)
    ours = np.asarray(R.resize_bilinear_align_corners(jnp.asarray(x), out))
    theirs = to_nhwc(F.interpolate(to_nchw(x), size=out, mode="bilinear",
                                   align_corners=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("H,W", [(8, 8), (13, 7), (32, 32)])
def test_bicubic_2x_align_corners(rng, H, W):
    x = rng.standard_normal((2, H, W, 4)).astype(np.float32)
    ours = np.asarray(R.upsample2x_bicubic(jnp.asarray(x)))
    theirs = to_nhwc(F.interpolate(to_nchw(x), scale_factor=2, mode="bicubic",
                                   align_corners=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_avg_pool_2x2(rng):
    x = rng.standard_normal((2, 16, 16, 5)).astype(np.float32)
    ours = np.asarray(R.avg_pool2d(jnp.asarray(x), window=2, stride=2))
    theirs = to_nhwc(F.avg_pool2d(to_nchw(x), 2, stride=2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_avg_pool_3x3_pad1_no_include_pad(rng):
    x = rng.standard_normal((1, 9, 9, 2)).astype(np.float32)
    ours = np.asarray(R.avg_pool2d(jnp.asarray(x), window=3, stride=2,
                                   padding=1, count_include_pad=False))
    theirs = to_nhwc(F.avg_pool2d(to_nchw(x), 3, stride=2, padding=1,
                                  count_include_pad=False))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_losses_custom_bce_matches_reference_formula(rng):
    import jax
    from rgbd_pifuhd_tpu.ops.losses import custom_bce

    pred = rng.uniform(0, 1, (2, 30, 1)).astype(np.float32)
    gt = (rng.uniform(0, 1, (2, 30, 1)) > 0.5).astype(np.float32)
    gamma = np.array([0.7, 0.3], np.float32)
    w = np.array([1.5, 0.5], np.float32)

    ours = float(custom_bce(jnp.asarray(pred), jnp.asarray(gt),
                            jnp.asarray(gamma), jnp.asarray(w)))

    tp = torch.from_numpy(pred)
    tg = torch.from_numpy(gt)
    x_hat = torch.clamp(tp, 1e-5, 1 - 1e-5)
    g = torch.from_numpy(gamma)[:, None, None]
    loss = -(g * tg * torch.log(x_hat) + (1 - g) * (1 - tg) * torch.log(1 - x_hat))
    tw = torch.from_numpy(w)[:, None, None]
    theirs = float((loss * tw).mean())

    assert abs(ours - theirs) < 1e-6


def test_custom_bce_brock_variant(rng):
    """brock=True rescales gt to [-1, 2] (net_util.py:54-57)."""
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.ops.losses import custom_bce

    pred = jnp.asarray(rng.uniform(0.1, 0.9, (1, 10, 1)).astype(np.float32))
    gt = jnp.asarray((rng.uniform(0, 1, (1, 10, 1)) > 0.5).astype(np.float32))
    gamma = jnp.array([0.5])
    plain = float(custom_bce(pred, gt, gamma))
    brock = float(custom_bce(pred, gt, gamma, brock=True))
    assert np.isfinite(plain) and np.isfinite(brock)
    assert abs(plain - brock) > 1e-6  # genuinely different objective
