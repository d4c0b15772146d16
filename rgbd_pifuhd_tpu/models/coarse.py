"""CoarsePIFu — the coarse (global) pixel-aligned implicit-function model.

Functional re-design of the reference's PIFuNetwNML
(/root/reference/PIFuNetwNML.py:17-257).  Key differences from the torch
original, by design:

- No mutable module state: ``filter`` RETURNS the image features (and
  predicted normal maps); ``query`` takes them as arguments.  Everything is
  jit-friendly pure functions of (params, inputs).
- The per-hourglass-stack query loop is a static unroll; at inference the
  caller passes ``last_only=True`` and only the final stack is evaluated
  (parity with PIFuNetwNML.py:96-97 where eval keeps only the last feature).
- Input channels are consistent (SURVEY.md 2.5.1 fix): the encoder sees
  RGB-D (6) + front normal (3) + back normal (3) = 12 channels, and the
  normal nets see the 6-channel RGB-D stack.

Input layout: images ``[B, H, W, C]``, points ``[B, N, 3]``, calib
``[B, 3or4, 4]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import geometry as geom
from ..ops.losses import custom_bce, mse
from ..utils.options import PIFuLevelConfig
from .blocks import HGFilter
from .mlp import PointMLP
from .pix2pix import GlobalGenerator


class CoarseFeatures(NamedTuple):
    """Everything `filter` produces and `query` consumes."""

    im_feats: jax.Array  # [S, B, h, w, C] stacked hourglass outputs
    normx: jax.Array     # [B, h, w, 128] stem feature
    nml_front: jax.Array | None  # [B, H, W, 3] predicted front normals
    nml_back: jax.Array | None   # [B, H, W, 3] predicted back normals


class CoarseQueryOut(NamedTuple):
    preds: jax.Array   # [S, B, N, 1] per-stack occupancy in [0,1]
    phi: jax.Array     # [B, N, C_phi] merge-layer feature of the last stack
    mask: jax.Array    # [B, N, 1] in-bounds mask


class CoarsePIFu(nn.Module):
    """Coarse PIFu with normal-map conditioning (PIFuNetwNML parity)."""

    cfg: PIFuLevelConfig

    def setup(self):
        c = self.cfg
        dt = None if c.compute_dtype == "float32" else c.compute_dtype
        self.image_filter = HGFilter(
            n_stack=c.num_stack, depth=c.hg_depth, last_channels=c.hg_dim,
            norm=c.norm, down_type=c.hg_down, dtype=dt, remat=c.remat,
            name="image_filter",
        )
        self.mlp = PointMLP(
            filter_channels=c.mlp_dim, merge_layer=c.merge_layer,
            res_layers=c.mlp_res_layers, norm=c.mlp_norm,
            last_op="sigmoid", dtype=dt, name="mlp",
        )
        if c.use_front_normal:
            self.netF = GlobalGenerator(
                output_nc=3, ngf=c.nml_ngf, n_downsampling=c.nml_n_downsampling,
                n_blocks=c.nml_n_blocks, name="netF",
            )
        if c.use_back_normal:
            self.netB = GlobalGenerator(
                output_nc=3, ngf=c.nml_ngf, n_downsampling=c.nml_n_downsampling,
                n_blocks=c.nml_n_blocks, name="netB",
            )

    # ------------------------------------------------------------- filter
    def filter(self, images: jax.Array, train: bool = False,
               last_only: bool = False) -> CoarseFeatures:
        """Run normal prediction + the stacked-hourglass encoder.

        Args:
            images: ``[B, H, W, C_in0]`` RGB(+D) stack in [-1, 1].
        """
        c = self.cfg
        nmls = []
        nml_front = nml_back = None
        if c.use_front_normal:
            nml_front = jax.lax.stop_gradient(self.netF(images))
            nmls.append(nml_front)
        if c.use_back_normal:
            nml_back = jax.lax.stop_gradient(self.netB(images))
            nmls.append(nml_back)
        if nmls:
            images = jnp.concatenate([images] + nmls, axis=-1)

        outs, normx = self.image_filter(images, train)
        if last_only:
            outs = outs[-1:]
        im_feats = jnp.stack(outs, axis=0)
        return CoarseFeatures(im_feats, normx, nml_front, nml_back)

    # -------------------------------------------------------------- query
    def query(
        self,
        feats: CoarseFeatures,
        points: jax.Array,
        calibs: jax.Array,
        train: bool = False,
    ) -> CoarseQueryOut:
        """Evaluate occupancy at world points (PIFuNetwNML.py:99-141).

        project -> in-bounds mask (x, y and z) -> pixel-aligned feature +
        normalized-depth spatial feature -> shared MLP per stack -> masked
        sigmoid predictions.
        """
        c = self.cfg
        xyz = geom.PROJECTIONS[c.projection_mode](points, calibs)
        mask = geom.in_bounds_mask(xyz, dims=3)
        sp_feat = geom.depth_normalize(xyz, c.load_size, c.z_size)
        xy = xyz[..., :2]

        preds = []
        phi = None
        n_stacks = feats.im_feats.shape[0]
        for s in range(n_stacks):
            point_feat = geom.index(feats.im_feats[s], xy)
            pred, phi = self.mlp(
                jnp.concatenate([point_feat, sp_feat], axis=-1), train
            )
            preds.append(mask * pred)
        return CoarseQueryOut(jnp.stack(preds, axis=0), phi, mask)

    # ------------------------------------------------------- calc_normal
    def field_last(
        self,
        feats: CoarseFeatures,
        points: jax.Array,
        calibs: jax.Array,
    ) -> jax.Array:
        """Occupancy from the LAST hourglass stack, unmasked.

        The differentiable scalar field behind autodiff normals
        (``normal_mode='grad'``) — the same quantity ``calc_normal``'s fd
        stencil samples at its four taps.  Returns ``[B, N, 1]``.
        """
        c = self.cfg
        xyz = geom.PROJECTIONS[c.projection_mode](points, calibs)
        sp_feat = geom.depth_normalize(xyz, c.load_size, c.z_size)
        point_feat = geom.index(feats.im_feats[-1], xyz[..., :2])
        pred, _ = self.mlp(jnp.concatenate([point_feat, sp_feat], axis=-1))
        return pred

    def calc_normal(
        self,
        feats: CoarseFeatures,
        points: jax.Array,
        calibs: jax.Array,
        delta: float = 0.1,
    ) -> jax.Array:
        """Finite-difference surface normals (PIFuNetwNML.py:181-220).

        Evaluates the field at p, p+dx, p+dy, p+dz using only the last
        hourglass stack and returns the normalized negative gradient.
        """
        B, N, _ = points.shape
        offsets = jnp.array(
            [[0, 0, 0], [delta, 0, 0], [0, delta, 0], [0, 0, delta]],
            dtype=points.dtype,
        )
        pts_all = (points[:, :, None, :] + offsets).reshape(B, N * 4, 3)

        c = self.cfg
        xyz = geom.PROJECTIONS[c.projection_mode](pts_all, calibs)
        sp_feat = geom.depth_normalize(xyz, c.load_size, c.z_size)
        point_feat = geom.index(feats.im_feats[-1], xyz[..., :2])
        pred, _ = self.mlp(jnp.concatenate([point_feat, sp_feat], axis=-1))
        pred = pred.reshape(B, N, 4)

        grad = pred[..., 1:] - pred[..., :1]  # [B, N, 3]
        nml = -grad
        norm = jnp.linalg.norm(nml, axis=-1, keepdims=True)
        return nml / jnp.maximum(norm, 1e-8)

    # ---------------------------------------------------------- training
    def get_error(
        self,
        out: CoarseQueryOut,
        labels: jax.Array,
        gamma: float | jax.Array,
        loss_type: str = "bce",
    ) -> jax.Array:
        """Average per-stack occupancy loss (PIFuNetwNML.py:230-245).

        ``labels`` are masked by the in-bounds mask before the loss, matching
        PIFuNetwNML.py:119-120.
        """
        labels = out.mask * labels
        B = labels.shape[0]
        gamma_b = jnp.broadcast_to(jnp.asarray(gamma, labels.dtype), (B,))
        total = 0.0
        for s in range(out.preds.shape[0]):
            if loss_type == "bce":
                total = total + custom_bce(out.preds[s], labels, gamma_b)
            else:
                total = total + mse(out.preds[s], labels)
        return total / out.preds.shape[0]

    def __call__(self, images, points, calibs, labels, gamma=0.5,
                 train: bool = True):
        """filter -> query -> loss; the coarse pretraining objective."""
        feats = self.filter(images, train=train)
        out = self.query(feats, points, calibs, train=train)
        err = self.get_error(out, labels, gamma)
        return err, out
