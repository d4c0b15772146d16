"""FULL-MODEL numerical parity vs torch mirrors of the reference.

The block-level tests (test_models_blocks.py) pin each layer; these pin the
*integration seams* the blocks tests cannot see — the complete
filter->project->grid_sample->z_feat->MLP->mask pipeline — against torch
mirrors built exactly the way the reference composes them:

- ``test_coarse_full_model_parity``: CoarsePIFu.filter + .query vs a torch
  PIFuNetwNML mirror (/root/reference/PIFuNetwNML.py:80-141) with identical
  weights: full stacked-hourglass stem, per-stack MLP passes, the 3D bounds
  mask and the DepthNormalizer z feature.
- ``test_multires_full_model_parity``: MultiResPIFu.filter_local + .query vs
  a torch PIFuMRNet mirror that loops crop windows in Python the way the
  reference does (PIFuMRNet.py:145-178) — proving our window-folded batched
  redesign is semantics-preserving, not just plausible.

This closes BASELINE.md's parity clause ("occupancy fields bit-close to the
PyTorch reference on identical inputs") at the whole-model level.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax.numpy as jnp

from rgbd_pifuhd_tpu.models import CoarsePIFu, MultiResPIFu
from rgbd_pifuhd_tpu.utils.options import PIFuLevelConfig

from test_models_blocks import (
    TConvBlock,
    THourGlass,
    convblock_params,
    hourglass_params,
    t2j_conv,
)


# ------------------------------------------------------------ torch mirrors
class THGFilter(tnn.Module):
    """Torch mirror of the stacked-hourglass encoder (Filter.py:132-228)."""

    def __init__(self, cin, n_stack, depth, last_ch, down_type):
        super().__init__()
        self.n_stack, self.down_type = n_stack, down_type
        self.conv1 = tnn.Conv2d(cin, 64, 7, stride=2, padding=3)
        self.n1 = tnn.GroupNorm(32, 64)
        self.conv2 = TConvBlock(64, 128)
        self.conv3 = TConvBlock(128, 128)
        self.conv4 = TConvBlock(128, 256)
        self.ms = tnn.ModuleList()
        self.top_ms = tnn.ModuleList()
        self.conv_lasts = tnn.ModuleList()
        self.n_lasts = tnn.ModuleList()
        self.ls = tnn.ModuleList()
        self.bls = tnn.ModuleList()
        self.als = tnn.ModuleList()
        for i in range(n_stack):
            self.ms.append(THourGlass(depth, 256))
            self.top_ms.append(TConvBlock(256, 256))
            self.conv_lasts.append(tnn.Conv2d(256, 256, 1))
            self.n_lasts.append(tnn.GroupNorm(32, 256))
            self.ls.append(tnn.Conv2d(256, last_ch, 1))
            if i < n_stack - 1:
                self.bls.append(tnn.Conv2d(256, 256, 1))
                self.als.append(tnn.Conv2d(last_ch, 256, 1))

    def forward(self, x):
        x = TF.relu(self.n1(self.conv1(x)))
        if self.down_type == "ave_pool":
            x = TF.avg_pool2d(self.conv2(x), 2, stride=2)
        else:  # no_down
            x = self.conv2(x)
        normx = x
        x = self.conv4(self.conv3(x))
        previous, outputs = x, []
        for i in range(self.n_stack):
            hg = self.ms[i](previous)
            ll = self.top_ms[i](hg)
            ll = TF.relu(self.n_lasts[i](self.conv_lasts[i](ll)))
            out = self.ls[i](ll)
            outputs.append(out)
            if i < self.n_stack - 1:
                previous = previous + self.bls[i](ll) + self.als[i](out)
        return outputs, normx


class TMLP(tnn.Module):
    """Torch mirror of the point MLP (MLP.py:12-75), with phi capture."""

    def __init__(self, chans, res_layers, merge):
        super().__init__()
        self.res_layers, self.merge = res_layers, merge
        self.convs = tnn.ModuleList()
        self.norms = tnn.ModuleList()
        for i in range(len(chans) - 1):
            cin = chans[i] + (chans[0] if i in res_layers else 0)
            self.convs.append(tnn.Conv1d(cin, chans[i + 1], 1))
            if i != len(chans) - 2:
                self.norms.append(tnn.GroupNorm(32, chans[i + 1]))

    def forward(self, f):
        y, tmpy, phi = f, f, None
        for i, c in enumerate(self.convs):
            y = c(torch.cat([y, tmpy], 1) if i in self.res_layers else y)
            if i != len(self.convs) - 1:
                y = TF.leaky_relu(self.norms[i](y), 0.01)
            if i == self.merge:
                phi = y
        return torch.sigmoid(y), phi


def t_index(feat, uv):
    """Reference ``index`` (BasePIFuNet.py:11-23): feat [B,C,H,W], uv [B,N,2]."""
    g = uv.unsqueeze(2)  # [B, N, 1, 2]
    s = TF.grid_sample(feat, g, mode="bilinear", padding_mode="zeros",
                       align_corners=True)
    return s[..., 0]  # [B, C, N]


def t_orthogonal(points, calib):
    """Reference ``orthogonal`` (BasePIFuNet.py:25-43): points [B,3,N]."""
    rot, trans = calib[:, :3, :3], calib[:, :3, 3:4]
    return torch.baddbmm(trans, rot, points)


# --------------------------------------------------------- param extraction
def hgfilter_params(t: THGFilter):
    p = {
        "conv1": {"kernel": t2j_conv(t.conv1.weight),
                  "bias": jnp.asarray(t.conv1.bias.detach().numpy())},
        "_NormReLU_0": {"n": {
            "scale": jnp.asarray(t.n1.weight.detach().numpy()),
            "bias": jnp.asarray(t.n1.bias.detach().numpy())}},
        "conv2": convblock_params(t.conv2),
        "conv3": convblock_params(t.conv3),
        "conv4": convblock_params(t.conv4),
    }
    for i in range(t.n_stack):
        p[f"m{i}"] = hourglass_params(t.ms[i])
        p[f"top_m_{i}"] = convblock_params(t.top_ms[i])
        p[f"conv_last{i}"] = {
            "kernel": t2j_conv(t.conv_lasts[i].weight),
            "bias": jnp.asarray(t.conv_lasts[i].bias.detach().numpy())}
        p[f"_NormReLU_{i + 1}"] = {"n": {
            "scale": jnp.asarray(t.n_lasts[i].weight.detach().numpy()),
            "bias": jnp.asarray(t.n_lasts[i].bias.detach().numpy())}}
        p[f"l{i}"] = {"kernel": t2j_conv(t.ls[i].weight),
                      "bias": jnp.asarray(t.ls[i].bias.detach().numpy())}
        if i < t.n_stack - 1:
            p[f"bl{i}"] = {"kernel": t2j_conv(t.bls[i].weight),
                           "bias": jnp.asarray(t.bls[i].bias.detach().numpy())}
            p[f"al{i}"] = {"kernel": t2j_conv(t.als[i].weight),
                           "bias": jnp.asarray(t.als[i].bias.detach().numpy())}
    return p


def mlp_params(t: TMLP):
    p, ni = {}, 0
    for i, c in enumerate(t.convs):
        p[f"dense{i}"] = {
            "kernel": jnp.asarray(c.weight.detach().numpy()[:, :, 0].T),
            "bias": jnp.asarray(c.bias.detach().numpy())}
        if i != len(t.convs) - 1:
            n = t.norms[ni]
            p[f"norm{i}"] = {
                "scale": jnp.asarray(n.weight.detach().numpy()),
                "bias": jnp.asarray(n.bias.detach().numpy())}
            ni += 1
    return p


def _randomize(module, scale=0.1):
    with torch.no_grad():
        for q in module.parameters():
            q.copy_(torch.randn_like(q) * scale)
    return module.eval()


def _calib(rng, batch):
    """Non-trivial full-rank calib: scale + small rotation + translation."""
    c = np.zeros((batch, 4, 4), np.float32)
    for b in range(batch):
        th = 0.2 + 0.1 * b
        rz = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0],
                       [0, 0, 1]], np.float32)
        c[b, :3, :3] = rz * np.array([0.9, 0.85, 0.8], np.float32)
        c[b, :3, 3] = rng.uniform(-0.1, 0.1, 3)
        c[b, 3, 3] = 1.0
    return c


# ------------------------------------------------------------------- tests
COARSE_CFG = dict(
    num_stack=2, hg_depth=2, hg_dim=32, hg_down="ave_pool",
    mlp_dim=(33, 64, 32, 1), mlp_res_layers=(1,), merge_layer=1,
    use_front_normal=False, use_back_normal=False,
    load_size=64, z_size=50.0,
)


def _coarse_pair(rng):
    """Build (flax CoarsePIFu, params) + (torch mirror pieces) with shared
    weights, plus a shared input batch."""
    cfg = PIFuLevelConfig(**COARSE_CFG)
    t_filter = _randomize(THGFilter(6, cfg.num_stack, cfg.hg_depth,
                                    cfg.hg_dim, "ave_pool"))
    t_mlp = _randomize(TMLP(list(cfg.mlp_dim), list(cfg.mlp_res_layers),
                            cfg.merge_layer), scale=0.05)
    model = CoarsePIFu(cfg=cfg)
    params = {"params": {"image_filter": hgfilter_params(t_filter),
                         "mlp": mlp_params(t_mlp)}}
    img = rng.standard_normal((2, 64, 64, 6)).astype(np.float32)
    pts = rng.uniform(-1.2, 1.2, (2, 128, 3)).astype(np.float32)
    calib = _calib(rng, 2)
    return cfg, model, params, t_filter, t_mlp, img, pts, calib


def test_coarse_full_model_parity(rng):
    cfg, model, params, t_filter, t_mlp, img, pts, calib = _coarse_pair(rng)

    # ---- flax: filter -> query
    feats = model.apply(params, jnp.asarray(img), method=CoarsePIFu.filter)
    out = model.apply(params, feats, jnp.asarray(pts), jnp.asarray(calib),
                      method=CoarsePIFu.query)

    # ---- torch mirror: the reference's exact composition
    with torch.no_grad():
        t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
        t_outs, _ = t_filter(t_img)
        t_pts = torch.from_numpy(pts).permute(0, 2, 1)       # [B, 3, N]
        t_cal = torch.from_numpy(calib)
        xyz = t_orthogonal(t_pts, t_cal)                     # [B, 3, N]
        in_bb = (xyz >= -1.0) & (xyz <= 1.0)
        t_mask = (in_bb[:, 0] & in_bb[:, 1] & in_bb[:, 2]).float()  # [B, N]
        z_feat = xyz[:, 2:3] * (cfg.load_size // 2) / cfg.z_size
        uv = xyz[:, :2].permute(0, 2, 1)                     # [B, N, 2]
        t_preds, t_phi = [], None
        for s_feat in t_outs:
            pf = t_index(s_feat, uv)                         # [B, C, N]
            y, t_phi = t_mlp(torch.cat([pf, z_feat], 1))
            t_preds.append((t_mask[:, None] * y).numpy())

    # per-stack masked occupancy [S, B, N, 1] vs torch [S][B, 1, N]
    got = np.asarray(out.preds)
    for s in range(got.shape[0]):
        np.testing.assert_allclose(
            got[s][..., 0], t_preds[s][:, 0], rtol=1e-3, atol=2e-3,
            err_msg=f"stack {s} occupancy mismatch")
    # the bounds mask must agree exactly
    np.testing.assert_array_equal(
        np.asarray(out.mask)[..., 0], t_mask.numpy())
    # phi (merge-layer feature) feeds the fine model — must match too
    np.testing.assert_allclose(
        np.asarray(out.phi), t_phi.numpy().transpose(0, 2, 1),
        rtol=1e-2, atol=2e-2)


def test_multires_full_model_parity(rng):
    """Two-level query: our window-folded design vs the reference's
    per-window Python loop (PIFuMRNet.py:145-178), identical weights."""
    cfg_g, model_g, params_g, tg_filter, tg_mlp, img_g, _, calib_g = \
        _coarse_pair(rng)

    cfg_l = PIFuLevelConfig(
        num_stack=1, hg_depth=2, hg_dim=16, hg_down="no_down",
        mlp_dim=(48, 64, 32, 1), mlp_res_layers=(1,), merge_layer=-1,
        use_front_normal=False, use_back_normal=False,
        load_size=64, z_size=50.0,
    )
    tl_filter = _randomize(THGFilter(6, 1, cfg_l.hg_depth, cfg_l.hg_dim,
                                     "no_down"))
    # merge=-1 resolves to len(chans)//2 = 2 (the last layer; phi unused)
    tl_mlp = _randomize(TMLP(list(cfg_l.mlp_dim), list(cfg_l.mlp_res_layers),
                             merge=2), scale=0.05)

    model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)
    params = {"params": {
        "netG": params_g["params"],
        "image_filter": hgfilter_params(tl_filter),
        "mlp": mlp_params(tl_mlp),
    }}

    B1, B2, N = 2, 2, 96
    img_l = rng.standard_normal((B1, B2, 64, 64, 6)).astype(np.float32)
    img_g = rng.standard_normal((B1, 64, 64, 6)).astype(np.float32)
    pts = rng.uniform(-1.2, 1.2, (B1, B2, N, 3)).astype(np.float32)
    calib_g = _calib(rng, B1)
    calib_l = np.stack([_calib(rng, B2) for _ in range(B1)])  # [B1, B2, 4, 4]

    # ---- flax: window-folded two-level query
    g_feats = model.apply(params, jnp.asarray(img_g),
                          method=MultiResPIFu.filter_global)
    l_feats = model.apply(params, jnp.asarray(img_l), g_feats,
                          method=MultiResPIFu.filter_local)
    out = model.apply(params, l_feats, g_feats, jnp.asarray(pts),
                      jnp.asarray(calib_l), jnp.asarray(calib_g),
                      method=MultiResPIFu.query)

    # ---- torch mirror: the reference's per-window loop
    with torch.no_grad():
        tg_outs, _ = tg_filter(torch.from_numpy(img_g).permute(0, 3, 1, 2))
        t_preds = np.zeros((B1, B2, N), np.float32)
        t_masks = np.zeros((B1, B2, N), np.float32)
        for w in range(B2):  # the reference's `for i in range(B2)` loop
            t_imgw = torch.from_numpy(img_l[:, w]).permute(0, 3, 1, 2)
            tl_outs, _ = tl_filter(t_imgw)
            t_pts = torch.from_numpy(pts[:, w]).permute(0, 2, 1)
            xyz_l = t_orthogonal(t_pts, torch.from_numpy(calib_l[:, w]))
            in_bb = (xyz_l[:, :2] >= -1.0) & (xyz_l[:, :2] <= 1.0)
            mask2d = (in_bb[:, 0] & in_bb[:, 1]).float()     # [B1, N]
            # coarse query at the same world points for phi
            xyz_g = t_orthogonal(t_pts, torch.from_numpy(calib_g))
            z_feat = xyz_g[:, 2:3] * (cfg_g.load_size // 2) / cfg_g.z_size
            uv_g = xyz_g[:, :2].permute(0, 2, 1)
            pf_g = t_index(tg_outs[-1], uv_g)
            _, phi = tg_mlp(torch.cat([pf_g, z_feat], 1))
            # fine MLP on [local feature, phi]
            uv_l = xyz_l[:, :2].permute(0, 2, 1)
            pf_l = t_index(tl_outs[-1], uv_l)
            y, _ = tl_mlp(torch.cat([pf_l, phi], 1))
            t_preds[:, w] = (mask2d[:, None] * y).numpy()[:, 0]
            t_masks[:, w] = mask2d.numpy()

    got = np.asarray(out.preds).reshape(B1, B2, N)
    np.testing.assert_allclose(got, t_preds, rtol=1e-3, atol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(out.mask).reshape(B1, B2, N), t_masks)


def _torch_custom_bce(pred, gt, gamma, eps=1e-5):
    """CustomBCELoss mirror (/root/reference/net_util.py:51-66)."""
    x_hat = torch.clamp(pred, eps, 1.0 - eps)
    return -(gamma * gt * torch.log(x_hat)
             + (1.0 - gamma) * (1.0 - gt) * torch.log(1.0 - x_hat)).mean()


def test_coarse_training_gradient_parity(rng):
    """Training DYNAMICS parity: d(loss)/d(params) of the coarse
    pretraining objective (filter -> query -> per-stack CustomBCE mean,
    pretrain_netG.py:315-319) must match the torch mirror's autograd.
    Forward parity alone would not catch a wrong stop_gradient, a
    detached buffer, or masked-label semantics that differ only in
    backward."""
    import jax

    cfg, model, params, t_filter, t_mlp, img, pts, calib = _coarse_pair(rng)
    labels = (rng.uniform(0, 1, (2, 128, 1)) < 0.5).astype(np.float32)
    gamma = 0.5

    # ---- jax: grad of the coarse pretraining loss wrt every param
    def loss_fn(p):
        err, _ = model.apply(p, jnp.asarray(img), jnp.asarray(pts),
                             jnp.asarray(calib), jnp.asarray(labels),
                             gamma, train=False)
        return err

    j_loss, j_grads = jax.value_and_grad(loss_fn)(params)
    j_grads = j_grads["params"]

    # ---- torch mirror: identical composition, autograd backward
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_outs, _ = t_filter(t_img)
    t_pts = torch.from_numpy(pts).permute(0, 2, 1)
    xyz = t_orthogonal(t_pts, torch.from_numpy(calib))
    in_bb = (xyz >= -1.0) & (xyz <= 1.0)
    t_mask = (in_bb[:, 0] & in_bb[:, 1] & in_bb[:, 2]).float()
    z_feat = xyz[:, 2:3] * (cfg.load_size // 2) / cfg.z_size
    uv = xyz[:, :2].permute(0, 2, 1)
    t_labels = torch.from_numpy(labels).permute(0, 2, 1)  # [B, 1, N]
    masked_labels = t_mask[:, None] * t_labels
    total = 0.0
    for s_feat in t_outs:
        pf = t_index(s_feat, uv)
        y, _ = t_mlp(torch.cat([pf, z_feat], 1))
        total = total + _torch_custom_bce(t_mask[:, None] * y,
                                          masked_labels, gamma)
    t_loss = total / len(t_outs)
    t_loss.backward()

    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-5)

    # spot-check gradients at both ends of the network: the stem conv
    # (gradient flowed through every stack, hourglass, and the MLP) and
    # the first/last MLP layers
    checks = [
        (j_grads["image_filter"]["conv1"]["kernel"],
         t_filter.conv1.weight.grad.numpy().transpose(2, 3, 1, 0)),
        (j_grads["image_filter"]["conv1"]["bias"],
         t_filter.conv1.bias.grad.numpy()),
        (j_grads["mlp"]["dense0"]["kernel"],
         t_mlp.convs[0].weight.grad.numpy()[:, :, 0].T),
        (j_grads["mlp"][f"dense{len(t_mlp.convs) - 1}"]["bias"],
         t_mlp.convs[-1].bias.grad.numpy()),
    ]
    for got, want in checks:
        got = np.asarray(got)
        scale = max(np.abs(want).max(), 1e-8)
        np.testing.assert_allclose(got / scale, want / scale,
                                   rtol=1e-3, atol=2e-3)
