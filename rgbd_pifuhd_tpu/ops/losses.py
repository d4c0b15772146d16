"""Loss primitives.

Pure functions over ``[B, N, C]`` (point features) or ``[B, H, W, C]``
(images).  Re-designs of the reference's loss surface:

- ``custom_bce``  = CustomBCELoss (/root/reference/net_util.py:45-66),
  clamped BCE with per-sample inside/outside balance ``gamma`` and optional
  per-sample weight ``w`` (plus the "brock" rescaled variant).
- ``gram_matrix`` / style+content VGG loss building block (networks.py:386-416).
- ``gan_loss_lsgan`` = GANLoss with use_lsgan=True (networks.py:342-384).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def custom_bce(
    pred: jax.Array,
    gt: jax.Array,
    gamma: jax.Array,
    w: jax.Array | None = None,
    brock: bool = False,
    eps: float = 1e-5,
) -> jax.Array:
    """Balanced binary cross-entropy on occupancy predictions.

    Parity with CustomBCELoss.forward (net_util.py:51-66); layouts are
    ``pred/gt: [B, N, C]``, ``gamma/w: [B]`` (broadcast over N, C).

    ``gamma`` weights the inside (gt=1) term, ``1-gamma`` the outside term;
    ``w`` is an optional per-sample weight (the fine model's N/sum(mask)).
    """
    x_hat = jnp.clip(pred, eps, 1.0 - eps)
    g = gamma.reshape(gamma.shape + (1,) * (pred.ndim - gamma.ndim))
    if brock:
        x = 3.0 * gt - 1.0  # rescale to [-1, 2]
        loss = -(g * x * jnp.log(x_hat) + (1.0 - g) * (1.0 - x) * jnp.log(1.0 - x_hat))
    else:
        loss = -(g * gt * jnp.log(x_hat) + (1.0 - g) * (1.0 - gt) * jnp.log(1.0 - x_hat))
    if w is not None:
        wb = w.reshape(w.shape + (1,) * (pred.ndim - w.ndim))
        return jnp.mean(loss * wb)
    return jnp.mean(loss)


def gram_matrix(feat: jax.Array) -> jax.Array:
    """Gram matrix of NHWC features, normalized by C*H*W.

    Parity with networks.py:411-416 (which uses NCHW; values identical).

    Args:
        feat: ``[B, H, W, C]``.

    Returns:
        ``[B, C, C]``.
    """
    B, H, W, C = feat.shape
    f = feat.reshape(B, H * W, C)
    gram = jnp.einsum("bnc,bnd->bcd", f, f) / (C * H * W)
    return gram


def gan_loss_lsgan(pred: jax.Array, target_is_real: bool) -> jax.Array:
    """Least-squares GAN loss on a (possibly multi-scale) discriminator output."""
    target = 1.0 if target_is_real else 0.0
    return jnp.mean((pred - target) ** 2)


def multiscale_gan_loss(preds, target_is_real: bool) -> jax.Array:
    """GANLoss over MultiscaleDiscriminator outputs.

    ``preds`` is a list (scales) of lists (layer outputs); only the final
    layer of each scale enters the loss, matching networks.py:374-384.
    """
    total = 0.0
    for scale_outputs in preds:
        total = total + gan_loss_lsgan(scale_outputs[-1], target_is_real)
    return total
