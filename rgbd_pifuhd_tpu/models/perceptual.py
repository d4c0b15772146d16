"""Framework-native perceptual backbone (no external weights).

The reference's normal-net pretraining loss needs a pretrained VGG16
(/root/reference/networks.py:386-449); this environment has no network
egress, and the measured random-feature fallback is ~5x WORSE than plain
L1 (scripts/vgg_gap_study.py).  This module closes the gap without
downloads: a compact 4-stage conv encoder trained SELF-SUPERVISED
(denoising) on the framework's own synthetic renders, whose stage taps
drive the same content+style perceptual loss shape as VGGLoss.

- ``CompactFeatures``: ~0.3M-param encoder, taps after each stage —
  the drop-in feature model for ``make_perceptual_loss``.
- ``train_backbone``: denoising pretext — reconstruct the clean image
  from a noised input through the tapped encoder + a light decoder;
  the encoder must preserve multi-scale structure to succeed, which is
  exactly what a perceptual metric needs.
- ``find_backbone``/``load_backbone``/``save_backbone``: npz weights
  (committed under assets/perceptual/backbone.npz).

Wiring: train/loop.pretrain_normals auto-discovery order is real VGG16
weights > this committed backbone > plain L1 (the measured ranking,
scripts/vgg_gap_study.py).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

_WIDTHS = (16, 32, 64, 128)

DEFAULT_BACKBONE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "..", "assets", "perceptual", "backbone.npz")


class CompactFeatures(nn.Module):
    """4-stage conv encoder; returns one tap per stage (VGG-tap shaped)."""

    widths: tuple = _WIDTHS

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), padding=1, name=f"conv{i}a")(x)
            x = nn.relu(x)
            x = nn.Conv(w, (3, 3), padding=1, name=f"conv{i}b")(x)
            x = nn.relu(x)
            taps.append(x)
            if i < len(self.widths) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class _DenoiseDecoder(nn.Module):
    """Light decoder for the denoising pretext (training only)."""

    @nn.compact
    def __call__(self, taps):
        x = taps[-1]
        for i in range(len(taps) - 2, -1, -1):
            B, H, W, _ = taps[i].shape
            x = jax.image.resize(x, (B, H, W, x.shape[-1]), "bilinear")
            x = nn.Conv(taps[i].shape[-1], (3, 3), padding=1,
                        name=f"up{i}")(jnp.concatenate([x, taps[i]], -1))
            x = nn.relu(x)
        return nn.Conv(3, (3, 3), padding=1, name="out")(x)


def train_backbone(images: np.ndarray, steps: int = 400,
                   noise_sigma: float = 0.35, lr: float = 1e-3,
                   batch: int = 4, seed: int = 0):
    """Denoising pretext over ``images`` [N, H, W, 3] in [-1, 1]; returns
    the trained CompactFeatures params (decoder discarded)."""
    import optax

    enc, dec = CompactFeatures(), _DenoiseDecoder()
    key = jax.random.PRNGKey(seed)
    x0 = jnp.asarray(images[:1], jnp.float32)
    e_params = enc.init(key, x0)
    d_params = dec.init(key, enc.apply(e_params, x0))
    params = {"enc": e_params, "dec": d_params}
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    data = jnp.asarray(images, jnp.float32)

    @jax.jit
    def step(params, opt_state, key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch,), 0, data.shape[0])
        clean = data[idx]
        noisy = clean + noise_sigma * jax.random.normal(k2, clean.shape)

        def loss_fn(p):
            taps = enc.apply(p["enc"], noisy)
            rec = dec.apply(p["dec"], taps)
            return jnp.mean((rec - clean) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    loss = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    return params["enc"], float(loss)


def save_backbone(path: str, params) -> None:
    flat = {}
    for name, leaf in params["params"].items():
        flat[f"{name}_kernel"] = np.asarray(leaf["kernel"], np.float32)
        flat[f"{name}_bias"] = np.asarray(leaf["bias"], np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_backbone(path: str):
    z = np.load(path)
    params = {}
    for i in range(len(_WIDTHS)):
        for suff in ("a", "b"):
            name = f"conv{i}{suff}"
            params[name] = {"kernel": jnp.asarray(z[f"{name}_kernel"]),
                            "bias": jnp.asarray(z[f"{name}_bias"])}
    return {"params": params}


def find_backbone(path: str | None = None) -> str | None:
    """Committed-backbone discovery: explicit path -> env var -> assets/."""
    for c in (path, os.environ.get("RGBD_PIFUHD_BACKBONE"),
              os.path.normpath(DEFAULT_BACKBONE)):
        if c and os.path.exists(c):
            return c
    return None
