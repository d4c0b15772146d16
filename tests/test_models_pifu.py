"""Behavioral tests for CoarsePIFu / MultiResPIFu (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.models import CoarsePIFu, MultiResPIFu, GlobalGenerator
from rgbd_pifuhd_tpu.utils.options import PIFuLevelConfig


def tiny_global(use_normals=False):
    return PIFuLevelConfig(
        num_stack=2, hg_depth=1, hg_dim=8, norm="group", hg_down="ave_pool",
        mlp_dim=(9, 64, 32, 16, 1), mlp_res_layers=(1,), mlp_norm="none",
        merge_layer=2, use_depth=True,
        use_front_normal=use_normals, use_back_normal=use_normals,
        nml_ngf=8, nml_n_downsampling=2, nml_n_blocks=1,
        load_size=64, z_size=200.0,
    )


def tiny_local():
    return PIFuLevelConfig(
        num_stack=1, hg_depth=1, hg_dim=4, norm="group", hg_down="no_down",
        mlp_dim=(20, 32, 16, 1), mlp_res_layers=(1,), mlp_norm="none",
        merge_layer=-1, use_depth=True,
        use_front_normal=False, use_back_normal=False,
        load_size=64, z_size=200.0,
    )


def eye_calib(b):
    return jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))


def test_coarse_forward_and_mask(rng):
    cfg = tiny_global()
    model = CoarsePIFu(cfg)
    B, N = 2, 64
    images = jnp.asarray(rng.standard_normal((B, 64, 64, 6)).astype(np.float32))
    points = jnp.asarray(rng.uniform(-0.9, 0.9, (B, N, 3)).astype(np.float32))
    labels = jnp.asarray((rng.uniform(0, 1, (B, N, 1)) > 0.5).astype(np.float32))

    params = model.init(jax.random.PRNGKey(0), images, points, eye_calib(B),
                        labels)
    err, out = model.apply(params, images, points, eye_calib(B), labels)

    assert out.preds.shape == (cfg.num_stack, B, N, 1)
    assert out.phi.shape[0] == B and out.phi.shape[1] == N
    assert np.isfinite(float(err))
    # predictions are in [0, 1] (sigmoid) and masked
    assert float(out.preds.min()) >= 0.0 and float(out.preds.max()) <= 1.0

    # out-of-bounds points must predict exactly 0
    far_pts = points + 10.0
    feats = model.apply(params, images, method=CoarsePIFu.filter)
    far_out = model.apply(params, feats, far_pts, eye_calib(B),
                          method=CoarsePIFu.query)
    assert float(jnp.abs(far_out.preds).max()) == 0.0


def test_coarse_with_normal_nets(rng):
    cfg = tiny_global(use_normals=True)
    model = CoarsePIFu(cfg)
    B = 1
    images = jnp.asarray(rng.standard_normal((B, 64, 64, 6)).astype(np.float32))
    feats = model.init_with_output(
        jax.random.PRNGKey(0), images, method=CoarsePIFu.filter
    )[0]
    assert feats.nml_front.shape == (B, 64, 64, 3)
    assert feats.nml_back.shape == (B, 64, 64, 3)
    # encoder input = 6 (RGB-D) + 3 + 3 = 12 channels -> check param shape
    assert cfg.in_channels == 12


def test_coarse_calc_normal_unit_length(rng):
    cfg = tiny_global()
    model = CoarsePIFu(cfg)
    B, N = 1, 16
    images = jnp.asarray(rng.standard_normal((B, 64, 64, 6)).astype(np.float32))
    points = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, 3)).astype(np.float32))
    labels = jnp.zeros((B, N, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, points,
                           eye_calib(B), labels)
    feats = model.apply(variables, images, method=CoarsePIFu.filter)
    nml = model.apply(variables, feats, points, eye_calib(B),
                      method=CoarsePIFu.calc_normal)
    assert nml.shape == (B, N, 3)
    norms = np.linalg.norm(np.asarray(nml), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def _build_mr(rng, B1=1, B2=2, N=32):
    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global())
    imgs_l = jnp.asarray(
        rng.standard_normal((B1, B2, 32, 32, 6)).astype(np.float32))
    imgs_g = jnp.asarray(
        rng.standard_normal((B1, 64, 64, 6)).astype(np.float32))
    points = jnp.asarray(
        rng.uniform(-0.9, 0.9, (B1, B2, N, 3)).astype(np.float32))
    calib_l = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, None],
                       (B1, B2, 1, 1))
    calib_g = eye_calib(B1)
    labels = jnp.asarray(
        (rng.uniform(0, 1, (B1, B2, N, 1)) > 0.5).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs_l, imgs_g, points,
                        calib_l, calib_g, labels)
    return model, params, (imgs_l, imgs_g, points, calib_l, calib_g, labels)


def test_multires_forward(rng):
    B1, B2, N = 1, 2, 32
    model, params, args = _build_mr(rng, B1, B2, N)
    err, out = model.apply(params, *args)
    assert "occ_fine" in err and np.isfinite(float(err["occ_fine"]))
    assert out.preds.shape == (B1 * B2, N, 1)
    assert out.preds_low.shape[1] == B1 * B2
    assert out.w.shape == (B1 * B2,)
    assert out.gamma.shape == (B1 * B2,)
    # all points in bounds with identity calib -> w == 1
    np.testing.assert_allclose(np.asarray(out.w), 1.0, rtol=1e-6)


def test_multires_netg_frozen(rng):
    """With train_full_pifu=False the fine loss must not flow into netG."""
    model, params, args = _build_mr(rng)

    def loss_fn(p):
        err, _ = model.apply(p, *args)
        return err["occ_fine"]

    grads = jax.grad(loss_fn)(params)
    g_netG = jax.tree_util.tree_leaves(grads["params"]["netG"])
    g_local = jax.tree_util.tree_leaves(
        {k: v for k, v in grads["params"].items() if k != "netG"})
    assert all(float(jnp.abs(g).max()) == 0.0 for g in g_netG)
    assert any(float(jnp.abs(g).max()) > 0.0 for g in g_local)


def test_multires_calc_normal(rng):
    B1, B2, N = 1, 2, 8
    model, params, args = _build_mr(rng, B1, B2, N)
    imgs_l, imgs_g, points, calib_l, calib_g, _ = args
    g_feats = model.apply(params, imgs_g,
                          method=MultiResPIFu.filter_global)
    l_feats = model.apply(params, imgs_l, g_feats,
                          method=MultiResPIFu.filter_local)
    nml = model.apply(params, l_feats, g_feats, points, calib_l, calib_g,
                      method=MultiResPIFu.calc_normal)
    assert nml.shape == (B1 * B2, N, 3)


_FD_OFFSETS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)


def test_multires_autodiff_normals_match_fd(rng):
    """``field_last`` IS the field behind ``calc_normal``'s fd stencil
    (normal_mode='grad' vs 'fd').

    Two checks:
    1. exact — re-running the 4-tap stencil THROUGH ``field_last`` must
       reproduce ``calc_normal`` bit-close (same ops, same field);
    2. directional — the reverse-mode gradient of ``field_last`` must
       agree with the fd direction where the gradient is strongest.
       Loose bound only: at random tiny-init the field's true gradient is
       ~1e-4, so fd differences sit ~1 decade above the f32 rounding
       floor of the ~0.5-valued sigmoid field — fd itself carries ~10%
       direction noise (grad mode is the *more* exact of the two).
    """
    B1, B2, N, delta = 1, 2, 256, 1e-2
    model, params, args = _build_mr(rng, B1, B2, N)
    imgs_l, imgs_g, _, calib_l, calib_g, _ = args
    points = jnp.asarray(
        rng.uniform(-0.5, 0.5, (B1, B2, N, 3)).astype(np.float32))
    g_feats = model.apply(params, imgs_g,
                          method=MultiResPIFu.filter_global)
    l_feats = model.apply(params, imgs_l, g_feats,
                          method=MultiResPIFu.filter_local)
    fd = np.asarray(model.apply(
        params, l_feats, g_feats, points, calib_l, calib_g,
        method=MultiResPIFu.calc_normal, delta=delta))

    # 1. exact: stencil-of-field_last == calc_normal
    pts_all = (points[:, :, :, None, :]
               + jnp.asarray(delta * _FD_OFFSETS)).reshape(B1, B2, N * 4, 3)
    pred = np.asarray(model.apply(
        params, l_feats, g_feats, pts_all, calib_l, calib_g,
        method=MultiResPIFu.field_last)).reshape(B1 * B2, N, 4)
    sg = -(pred[..., 1:] - pred[..., :1])
    sg /= np.maximum(np.linalg.norm(sg, axis=-1, keepdims=True), 1e-8)
    np.testing.assert_allclose(fd, sg, atol=1e-5)

    # 2. directional: autodiff vs fd on the top-half-magnitude points
    def field(pts):
        return model.apply(params, l_feats, g_feats, pts, calib_l, calib_g,
                           method=MultiResPIFu.field_last).sum()

    g = -np.asarray(jax.grad(field)(points)).reshape(B1 * B2, N, 3)
    mag = np.linalg.norm(g, axis=-1)
    an = g / np.maximum(mag, 1e-12)[..., None]
    sel = mag > np.median(mag)
    cos = (fd * an).sum(axis=-1)[sel]
    assert np.mean(cos) > 0.75
    assert np.mean(cos > 0.9) > 0.6


def test_coarse_autodiff_normals_match_fd(rng):
    cfg = tiny_global()
    model = CoarsePIFu(cfg)
    B, N, delta = 1, 256, 1e-2
    images = jnp.asarray(
        rng.standard_normal((B, 64, 64, 6)).astype(np.float32))
    points = jnp.asarray(
        rng.uniform(-0.5, 0.5, (B, N, 3)).astype(np.float32))
    calibs = eye_calib(B)
    labels = jnp.zeros((B, N, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images, points, calibs,
                        labels)
    feats = model.apply(params, images, method=CoarsePIFu.filter)
    fd = np.asarray(model.apply(params, feats, points, calibs,
                                method=CoarsePIFu.calc_normal, delta=delta))

    # 1. exact: stencil-of-field_last == calc_normal (see multires test)
    pts_all = (points[:, :, None, :]
               + jnp.asarray(delta * _FD_OFFSETS)).reshape(B, N * 4, 3)
    pred = np.asarray(model.apply(
        params, feats, pts_all, calibs,
        method=CoarsePIFu.field_last)).reshape(B, N, 4)
    sg = -(pred[..., 1:] - pred[..., :1])
    sg /= np.maximum(np.linalg.norm(sg, axis=-1, keepdims=True), 1e-8)
    np.testing.assert_allclose(fd, sg, atol=1e-5)

    # 2. directional agreement (loose; fd noise floor, see multires test)
    def field(pts):
        return model.apply(params, feats, pts, calibs,
                           method=CoarsePIFu.field_last).sum()

    g = -np.asarray(jax.grad(field)(points))
    mag = np.linalg.norm(g, axis=-1)
    an = g / np.maximum(mag, 1e-12)[..., None]
    sel = mag > np.median(mag)
    cos = (fd * an).sum(axis=-1)[sel]
    assert np.mean(cos) > 0.75
    assert np.mean(cos > 0.9) > 0.6


def test_global_generator_shapes(rng):
    g = GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2, n_blocks=2)
    x = jnp.zeros((1, 64, 64, 6))
    y, _ = g.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 64, 64, 3)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh head


def test_coarse_perspective_projection(rng):
    """projection_mode='perspective' runs end-to-end through query."""
    import dataclasses
    cfg = dataclasses.replace(tiny_global(), projection_mode="perspective")
    model = CoarsePIFu(cfg)
    B, N = 1, 16
    images = jnp.asarray(rng.standard_normal((B, 64, 64, 6)).astype(np.float32))
    # points in front of the camera (z > 0 for a sane perspective divide)
    points = jnp.asarray(
        rng.uniform(-0.3, 0.3, (B, N, 3)).astype(np.float32)) + jnp.array(
        [0.0, 0.0, 2.0])
    labels = jnp.zeros((B, N, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images, points, eye_calib(B),
                        labels)
    err, out = model.apply(params, images, points, eye_calib(B), labels)
    assert np.isfinite(float(err))
    assert out.preds.shape[-2] == N
