"""VGG16 feature extractor + perceptual (content + style) loss.

Re-design of the reference's Vgg16/VGGLoss (/root/reference/networks.py:
386-449): the normal-net pretraining loss is
``content + 1e5 * style`` where content is the MSE between VGG feature maps
(relu1_2, relu2_2, relu3_3, relu4_3) of prediction and target, and style is
the MSE between Gram matrices of the prediction's features and a style
image's features.

Weights: the reference downloads torchvision's pretrained VGG16; this
environment has no network egress, so ``VGG16Features.load_torch_weights``
imports them from a local ``.pth``/state-dict file when available.  Without
pretrained weights, a seeded random init still yields a valid (weaker)
perceptual metric — random-feature perceptual losses are an established
fallback; the loss surface is documented as such.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.losses import gram_matrix, mse

# convs per VGG16 block (before each maxpool)
_BLOCKS = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512))
# feature taps: relu1_2, relu2_2, relu3_3, relu4_3


class VGG16Features(nn.Module):
    """First four VGG16 conv blocks; returns the four tap activations."""

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_i = 0
        for b, widths in enumerate(_BLOCKS):
            for w in widths:
                x = nn.Conv(w, (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
            taps.append(x)
            if b < len(_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps

    @staticmethod
    def init_params(rng_key=0, image_size: int = 64):
        m = VGG16Features()
        return m.init(
            jax.random.PRNGKey(rng_key),
            jnp.zeros((1, image_size, image_size, 3)),
        )

    @staticmethod
    def load_torch_weights(path: str):
        """Import torchvision vgg16 ``state_dict`` (features.* keys)."""
        import torch

        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        # torchvision layout: features.{0,2,5,7,10,12,14,17,19,21}.weight
        torch_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
        params = {}
        for i, tid in enumerate(torch_ids):
            w = sd[f"features.{tid}.weight"].numpy()  # [out, in, kh, kw]
            b = sd[f"features.{tid}.bias"].numpy()
            params[f"conv{i}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b),
            }
        return {"params": params}

    @staticmethod
    def load_npz_weights(path: str):
        """Import weights from an ``.npz`` with ``conv{i}_kernel`` [kh,kw,
        in,out] / ``conv{i}_bias`` arrays (torch-free interchange format)."""
        import numpy as np

        z = np.load(path)
        params = {}
        for i in range(10):
            params[f"conv{i}"] = {
                "kernel": jnp.asarray(z[f"conv{i}_kernel"]),
                "bias": jnp.asarray(z[f"conv{i}_bias"]),
            }
        return {"params": params}

    @staticmethod
    def find_weights(path: str | None = None) -> str | None:
        """Locate a local pretrained-weights file: explicit ``path`` ->
        the ``RGBD_PIFUHD_VGG16`` env var -> the torch hub cache."""
        import os

        candidates = [path, os.environ.get("RGBD_PIFUHD_VGG16")]
        cache = os.path.expanduser("~/.cache/torch/hub/checkpoints")
        if os.path.isdir(cache):
            candidates += [
                os.path.join(cache, f) for f in sorted(os.listdir(cache))
                if "vgg16" in f.lower()
            ]
        for c in candidates:
            if c and os.path.exists(c):
                return c
        return None

    @staticmethod
    def load_weights(path: str | None = None, rng_key: int = 0):
        """Best-available VGG16 parameters: a located local file
        (.npz or torch .pth), else seeded random init.

        NOTE: random features make a POOR perceptual loss — the measured
        gap (scripts/vgg_gap_study.py) is ~5x worse final normal-map L1
        than plain L1 training, because the 1e5-weighted style term on
        random Gram matrices injects noise.  pretrain_normals therefore
        enables the perceptual term only when real weights are found.
        """
        c = VGG16Features.find_weights(path)
        if c is not None:
            try:
                if c.endswith(".npz"):
                    return VGG16Features.load_npz_weights(c)
                return VGG16Features.load_torch_weights(c)
            except Exception as e:  # corrupt/foreign file
                print(f"[vgg] could not load {c}: {e}")
        return VGG16Features.init_params(rng_key)


def make_perceptual_loss(vgg_params, style_weight: float = 1e5,
                         feature_model=None, weight: float = 1.0):
    """(target, pred, style_image) -> scalar; parity with VGGLoss.forward.

    All images NHWC in [-1, 1] (the reference feeds normalized tensors
    straight in; no ImageNet renormalization — parity kept).

    ``feature_model``: any flax module returning a list of feature taps
    (default VGG16Features) — models/perceptual.CompactFeatures plugs the
    framework-native backbone into the same loss shape.

    ``weight`` scales the WHOLE perceptual term against the trainer's
    fixed 5x L1 (make_normal_train_step).  The measured best for the
    native backbone is 0.3 (scripts/vgg_gap_study.py sweep: final
    normal-map L1 0.0101 vs 0.0117 L1-only at 600 steps); the VGG path
    keeps 1.0 (reference weighting, pretrain_netG.py:159-197).
    """
    vgg = feature_model if feature_model is not None else VGG16Features()

    def loss(x, y, style_im):
        x_f = vgg.apply(vgg_params, x)
        y_f = vgg.apply(vgg_params, y)
        s_f = vgg.apply(vgg_params, style_im)
        content = sum(
            mse(xf, jax.lax.stop_gradient(yf)) for xf, yf in zip(x_f, y_f)
        )
        style = sum(
            mse(gram_matrix(yf), gram_matrix(sf))
            for yf, sf in zip(y_f, s_f)
        )
        return weight * (content + style_weight * style)

    return loss
