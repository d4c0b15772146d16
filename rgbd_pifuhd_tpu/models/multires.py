"""MultiResPIFu — the fine (multi-resolution) pixel-aligned model.

Functional re-design of the reference's PIFuMRNet
(/root/reference/PIFuMRNet.py:15-288).  The coarse model is a *submodule*
(param subtree ``netG``), matching the reference's checkpoint layout where
``netMR.state_dict()`` embeds netG.

TPU-first re-designs:
- The reference loops a Python ``for i in range(B2)`` over local crop
  windows (PIFuMRNet.py:145-178); here the window axis B2 is folded into the
  batch/point axes, so all windows are one batched computation:
  the coarse field is queried once on points reshaped ``[B1, B2*N, 3]`` and
  local features are sampled with windows folded to ``[B1*B2, N, ...]``.
- Fine supervision uses the FINE intermediate predictions.  (The reference's
  ``get_error`` reads ``preds_low`` — the detached coarse preds — for the
  fine loss, PIFuMRNet.py:268-269, which starves the fine MLP of gradient;
  SURVEY.md 2.5.5 marks this a bug.  We implement the intended behavior.)
- The 2D (x, y only) bounds mask matches PIFuMRNet.py:150-152; the loss
  weights ``w = N / sum(mask)`` and ``gamma = 1 - sum(label)/sum(mask)``
  match PIFuMRNet.py:157-162.

Layouts: local images ``[B1, B2, H, W, C]``, points ``[B1, B2, N, 3]``,
calib_local ``[B1, B2, 4, 4]``, calib_global ``[B1, 4, 4]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import geometry as geom
from ..ops.losses import custom_bce
from ..ops.resize import resize_bilinear_align_corners
from ..utils.options import PIFuLevelConfig
from .blocks import HGFilter
from .coarse import CoarsePIFu, CoarseFeatures
from .mlp import PointMLP


class FineFeatures(NamedTuple):
    im_feats: jax.Array  # [S, B1*B2, h, w, C_local]
    normx: jax.Array
    n_window: int        # static B2


class FineQueryOut(NamedTuple):
    preds: jax.Array         # [B1*B2, N, 1] final fine occupancy
    preds_interm: jax.Array  # [S, B1*B2, N, 1]
    preds_low: jax.Array     # [S_g, B1*B2, N, 1] coarse preds at same points
    labels: jax.Array | None  # masked labels [B1*B2, N, 1]
    w: jax.Array | None       # [B1*B2]
    gamma: jax.Array | None   # [B1*B2]
    mask: jax.Array           # [B1*B2, N, 1]


class MultiResPIFu(nn.Module):
    """Two-level PIFu: frozen-or-joint coarse netG + fine local encoder."""

    cfg: PIFuLevelConfig          # local/fine level config
    cfg_global: PIFuLevelConfig   # coarse level config
    train_full_pifu: bool = False

    def setup(self):
        c = self.cfg
        self.netG = CoarsePIFu(self.cfg_global, name="netG")
        dt = None if c.compute_dtype == "float32" else c.compute_dtype
        self.image_filter = HGFilter(
            n_stack=c.num_stack, depth=c.hg_depth, last_channels=c.hg_dim,
            norm=c.norm, down_type="no_down", dtype=dt, remat=c.remat,
            name="image_filter",
        )
        self.mlp = PointMLP(
            filter_channels=c.mlp_dim, merge_layer=-1,
            res_layers=c.mlp_res_layers, norm=c.mlp_norm,
            last_op="sigmoid", dtype=dt, name="mlp",
        )

    # ------------------------------------------------------ filter_global
    def filter_global(self, images: jax.Array, train: bool = False,
                      last_only: bool = False) -> CoarseFeatures:
        """Coarse encoding of the 512 input (PIFuMRNet.py:71-81).

        Unless ``train_full_pifu``, the coarse features are detached so the
        fine loss cannot backprop into netG.
        """
        feats = self.netG.filter(
            images, train=train and self.train_full_pifu, last_only=last_only
        )
        if not self.train_full_pifu:
            feats = jax.tree.map(
                lambda x: None if x is None else jax.lax.stop_gradient(x),
                feats,
                is_leaf=lambda x: x is None,
            )
        return feats

    # ------------------------------------------------------- filter_local
    def filter_local(
        self,
        images: jax.Array,
        g_feats: CoarseFeatures,
        rects: jax.Array | None = None,
        train: bool = False,
        last_only: bool = False,
    ) -> FineFeatures:
        """Fine encoding of 1024 crops (PIFuMRNet.py:83-117).

        The coarse model's predicted normal maps are bilinearly upsampled to
        the local resolution and concatenated per window.  ``rects``
        ``[B1, B2, 4]`` (x1, y1, x2, y2) selects the crop window inside the
        upsampled normal maps; window size must be static (H, W of images).
        """
        B1, B2, H, W, C = images.shape
        nmls = [
            n for n in (g_feats.nml_front, g_feats.nml_back) if n is not None
        ]
        if nmls:
            nml = jnp.concatenate(nmls, axis=-1)  # [B1, Hg, Wg, 3 or 6]
            if rects is None:
                # full-frame windows: match the local images' resolution
                nml = resize_bilinear_align_corners(nml, (H, W))
                nml_win = jnp.broadcast_to(
                    nml[:, None], (B1, B2) + nml.shape[1:]
                )
            else:
                # crop windows out of the full loadSizeBig normal maps
                big = self.cfg.load_size
                nml = resize_bilinear_align_corners(nml, (big, big))
                # dynamic window crop per (B1, B2): same static H, W
                def crop(m, r):
                    return jax.lax.dynamic_slice(
                        m, (r[1], r[0], 0), (H, W, m.shape[-1])
                    )
                nml_win = jax.vmap(
                    lambda m, rs: jax.vmap(lambda r: crop(m, r))(rs)
                )(nml, rects)
            images = jnp.concatenate([images, nml_win], axis=-1)

        flat = images.reshape(B1 * B2, H, W, images.shape[-1])
        outs, normx = self.image_filter(flat, train)
        if last_only:
            outs = outs[-1:]
        return FineFeatures(jnp.stack(outs, axis=0), normx, B2)

    # -------------------------------------------------------------- query
    def query(
        self,
        l_feats: FineFeatures,
        g_feats: CoarseFeatures,
        points: jax.Array,
        calib_local: jax.Array,
        calib_global: jax.Array,
        labels: jax.Array | None = None,
        train: bool = False,
    ) -> FineQueryOut:
        """Fine occupancy query (PIFuMRNet.py:119-186), window-folded.

        Args:
            points: ``[B1, B2, N, 3]`` world points.
            calib_local: ``[B1, B2, 4, 4]``; calib_global: ``[B1, 4, 4]``.
            labels: optional ``[B1, B2, 1ORc, N]``-style ``[B1, B2, N, 1]``.
        """
        c = self.cfg
        B1, B2, N, _ = points.shape
        if l_feats.im_feats.shape[1] != B1 * B2:
            raise ValueError(
                f"window mismatch: local features hold "
                f"{l_feats.im_feats.shape[1]} windows (B1*B2) but points are "
                f"[{B1}, {B2}, {N}, 3] — encode with the same window count"
            )

        # local projection + 2D mask (x, y only — PIFuMRNet.py:150-152)
        xyz = geom.PROJECTIONS[c.projection_mode](points, calib_local)
        mask = geom.in_bounds_mask(xyz, dims=2)  # [B1, B2, N, 1]

        # coarse query: all windows' points at once against global feats
        pts_flat = points.reshape(B1, B2 * N, 3)
        coarse = self.netG.query(g_feats, pts_flat, calib_global, train=train)
        z_feat = coarse.phi  # [B1, B2*N, C_phi]
        if not self.train_full_pifu:
            z_feat = jax.lax.stop_gradient(z_feat)
        z_feat = z_feat.reshape(B1 * B2, N, -1)
        S_g = coarse.preds.shape[0]
        preds_low = coarse.preds.reshape(S_g, B1 * B2, N, 1)

        mask_flat = mask.reshape(B1 * B2, N, 1)
        xy = xyz[..., :2].reshape(B1 * B2, N, 2)

        preds_interm = []
        for s in range(l_feats.im_feats.shape[0]):
            point_feat = geom.index(l_feats.im_feats[s], xy)
            pred, _ = self.mlp(
                jnp.concatenate([point_feat, z_feat], axis=-1), train
            )
            preds_interm.append(mask_flat * pred)
        preds_interm = jnp.stack(preds_interm, axis=0)

        new_labels = w = gamma = None
        if labels is not None:
            lab = labels.reshape(B1 * B2, N, 1)
            new_labels = mask_flat * lab
            denom = jnp.maximum(mask_flat.sum(axis=(1, 2)), 1.0)  # [B1*B2]
            w = N / denom
            gamma = 1.0 - new_labels.sum(axis=(1, 2)) / denom

        return FineQueryOut(
            preds=preds_interm[-1], preds_interm=preds_interm,
            preds_low=preds_low, labels=new_labels, w=w, gamma=gamma,
            mask=mask_flat,
        )

    # ------------------------------------------------------- calc_normal
    def field_last(
        self,
        l_feats: FineFeatures,
        g_feats: CoarseFeatures,
        points: jax.Array,
        calib_local: jax.Array,
        calib_global: jax.Array,
    ) -> jax.Array:
        """Fine occupancy from the LAST local stack, NO stop-gradients.

        The differentiable scalar field behind autodiff normals
        (``normal_mode='grad'``): exactly the quantity the fd stencil in
        ``calc_normal`` samples at its four taps — last-stack local
        feature + coarse phi — but with the coarse path left
        differentiable so ``jax.grad`` w.r.t. ``points`` carries the same
        z-variation the displaced taps would see.  Returns
        ``[B1*B2, N, 1]``.
        """
        B1, B2, N, _ = points.shape
        xyz = geom.PROJECTIONS[self.cfg.projection_mode](points, calib_local)
        xy = xyz[..., :2].reshape(B1 * B2, N, 2)
        coarse = self.netG.query(
            g_feats, points.reshape(B1, B2 * N, 3), calib_global
        )
        z_feat = coarse.phi.reshape(B1 * B2, N, -1)
        point_feat = geom.index(l_feats.im_feats[-1], xy)
        pred, _ = self.mlp(jnp.concatenate([point_feat, z_feat], axis=-1))
        return pred

    def calc_normal(
        self,
        l_feats: FineFeatures,
        g_feats: CoarseFeatures,
        points: jax.Array,
        calib_local: jax.Array,
        calib_global: jax.Array,
        delta: float = 1e-3,
    ) -> jax.Array:
        """Finite-difference normals from the fine field (PIFuMRNet.py:188-243).

        Returns ``[B1*B2, N, 3]`` unit normals.
        """
        B1, B2, N, _ = points.shape
        offsets = jnp.array(
            [[0, 0, 0], [delta, 0, 0], [0, delta, 0], [0, 0, delta]],
            dtype=points.dtype,
        )
        pts_all = (points[:, :, :, None, :] + offsets).reshape(B1, B2, N * 4, 3)

        xyz = geom.PROJECTIONS[self.cfg.projection_mode](pts_all, calib_local)
        xy = xyz[..., :2].reshape(B1 * B2, N * 4, 2)

        coarse = self.netG.query(
            g_feats, pts_all.reshape(B1, B2 * N * 4, 3), calib_global
        )
        z_feat = jax.lax.stop_gradient(coarse.phi).reshape(B1 * B2, N * 4, -1)

        point_feat = geom.index(l_feats.im_feats[-1], xy)
        pred, _ = self.mlp(jnp.concatenate([point_feat, z_feat], axis=-1))
        pred = pred.reshape(B1 * B2, N, 4)

        nml = -(pred[..., 1:] - pred[..., :1])
        norm = jnp.linalg.norm(nml, axis=-1, keepdims=True)
        return nml / jnp.maximum(norm, 1e-8)

    # ---------------------------------------------------------- training
    def get_error(self, out: FineQueryOut,
                  no_intermediate_loss: bool = False) -> dict:
        """Loss dict (PIFuMRNet.py:253-274, with the preds_low bug fixed)."""
        errors = {}
        if self.train_full_pifu and not no_intermediate_loss:
            e = 0.0
            for s in range(out.preds_low.shape[0]):
                e = e + custom_bce(out.preds_low[s], out.labels, out.gamma,
                                   out.w)
            errors["occ"] = e / out.preds_low.shape[0]
        e = 0.0
        for s in range(out.preds_interm.shape[0]):
            e = e + custom_bce(out.preds_interm[s], out.labels, out.gamma,
                               out.w)
        errors["occ_fine"] = e / out.preds_interm.shape[0]
        return errors

    def __call__(
        self,
        images_local: jax.Array,   # [B1, B2, H, W, C]
        images_global: jax.Array,  # [B1, Hg, Wg, C]
        points: jax.Array,         # [B1, B2, N, 3]
        calib_local: jax.Array,    # [B1, B2, 4, 4]
        calib_global: jax.Array,   # [B1, 4, 4]
        labels: jax.Array,         # [B1, B2, N, 1]
        rects: jax.Array | None = None,
        train: bool = True,
    ):
        """filter_global -> filter_local -> query -> loss (fine training)."""
        g_feats = self.filter_global(images_global, train=train)
        l_feats = self.filter_local(images_local, g_feats, rects, train=train)
        out = self.query(l_feats, g_feats, points, calib_local, calib_global,
                         labels=labels, train=train)
        err = self.get_error(out)
        return err, out
