"""Behavior tests for the pix2pixHD zoo beyond GlobalGenerator.

Reference: /root/reference/networks.py:77-129 (LocalEnhancer), 209-244
(Encoder + instance-wise average pooling), 246-336 (discriminators).
Weight-level torch parity is a non-goal here (the reference publishes no
weights and the ConvTranspose padding layout deliberately differs —
models/pix2pix.py docstring); these pin shapes, value ranges and the
instance-pooling semantics the reference implements with Python loops.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.models.pix2pix import (
    Encoder,
    LocalEnhancer,
    NLayerDiscriminator,
    instance_average_pool,
)


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_local_enhancer_shapes_and_range(key, rng):
    m = LocalEnhancer(output_nc=3, ngf=8, n_downsample_global=2,
                      n_blocks_global=2, n_blocks_local=1)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    params = m.init(key, x)
    y = m.apply(params, x)
    # full-resolution output, tanh-bounded (networks.py:127-128)
    assert y.shape == (1, 64, 64, 3)
    assert float(jnp.abs(y).max()) <= 1.0
    assert bool(jnp.isfinite(y).all())


def test_encoder_shapes_and_range(key, rng):
    m = Encoder(output_nc=4, ngf=8, n_downsampling=2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    params = m.init(key, x)
    y = m.apply(params, x)
    assert y.shape == (2, 32, 32, 4)
    assert float(jnp.abs(y).max()) <= 1.0


def test_instance_average_pool_exact():
    """Pooled features must equal the per-instance mean everywhere in the
    region — the semantics of the reference's nested loops
    (networks.py:231-244), computed here with one-hot segment means."""
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 4, 6, 3)).astype(np.float32)
    inst = np.zeros((1, 4, 6), np.int32)
    inst[0, :2] = 0
    inst[0, 2:, :3] = 1
    inst[0, 2:, 3:] = 2
    out = np.asarray(instance_average_pool(
        jnp.asarray(feats), jnp.asarray(inst), num_instances=4))
    for k in range(3):
        region = inst[0] == k
        want = feats[0][region].mean(axis=0)
        np.testing.assert_allclose(out[0][region],
                                   np.broadcast_to(want, out[0][region].shape),
                                   rtol=1e-5, atol=1e-6)
    # pooling is idempotent
    out2 = np.asarray(instance_average_pool(
        jnp.asarray(out), jnp.asarray(inst), num_instances=4))
    np.testing.assert_allclose(out2, out, rtol=1e-5, atol=1e-6)


def test_nlayer_discriminator_feature_pyramid(key, rng):
    m = NLayerDiscriminator(ndf=8, n_layers=3)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    params = m.init(key, x)
    feats = m.apply(params, x)
    # n_layers strided features + pre-final + 1-ch patch logits
    # (networks.py:287-336 getIntermFeat layout)
    assert len(feats) == 3 + 2
    assert feats[-1].shape[-1] == 1
    # ~halving across the strided n_layers features (k4/s2/p2 rounding)
    assert abs(feats[1].shape[1] * 2 - feats[0].shape[1]) <= 2
    assert abs(feats[2].shape[1] * 2 - feats[1].shape[1]) <= 2
    # channel doubling per strided layer (ndf -> 2ndf -> 4ndf)
    assert [f.shape[-1] for f in feats[:3]] == [8, 16, 32]
