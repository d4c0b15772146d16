"""Parity tests for NN blocks vs freshly-built torch mirrors.

We construct small torch modules implementing the documented architecture
(pre-activation residual ConvBlock, recursive hourglass) — the same spec the
reference implements — copy their weights into the flax modules, and demand
numerically matching outputs.  This catches layout, padding, norm-semantics
and upsample mismatches in one shot.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.models import ConvBlock, HourGlass, HGFilter, PointMLP


def t2j_conv(w):  # torch [out,in,kh,kw] -> flax [kh,kw,in,out]
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


# ---------------------------------------------------------------- torch mirrors
class TConvBlock(tnn.Module):
    """Pre-activation residual block: 3 convs -> concat -> +residual."""

    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = tnn.Conv2d(cin, cout // 2, 3, padding=1, bias=False)
        self.c2 = tnn.Conv2d(cout // 2, cout // 4, 3, padding=1, bias=False)
        self.c3 = tnn.Conv2d(cout // 4, cout // 4, 3, padding=1, bias=False)
        self.n1 = tnn.GroupNorm(32, cin)
        self.n2 = tnn.GroupNorm(32, cout // 2)
        self.n3 = tnn.GroupNorm(32, cout // 4)
        if cin != cout:
            self.n4 = tnn.GroupNorm(32, cin)
            self.cd = tnn.Conv2d(cin, cout, 1, bias=False)
        else:
            self.cd = None

    def forward(self, x):
        y1 = self.c1(TF.relu(self.n1(x)))
        y2 = self.c2(TF.relu(self.n2(y1)))
        y3 = self.c3(TF.relu(self.n3(y2)))
        out = torch.cat([y1, y2, y3], 1)
        res = x if self.cd is None else self.cd(TF.relu(self.n4(x)))
        return out + res


def convblock_params(t: TConvBlock):
    p = {
        "_NormReLU_0": {"n": {"scale": jnp.asarray(t.n1.weight.detach().numpy()),
                              "bias": jnp.asarray(t.n1.bias.detach().numpy())}},
        "conv1": {"kernel": t2j_conv(t.c1.weight)},
        "_NormReLU_1": {"n": {"scale": jnp.asarray(t.n2.weight.detach().numpy()),
                              "bias": jnp.asarray(t.n2.bias.detach().numpy())}},
        "conv2": {"kernel": t2j_conv(t.c2.weight)},
        "_NormReLU_2": {"n": {"scale": jnp.asarray(t.n3.weight.detach().numpy()),
                              "bias": jnp.asarray(t.n3.bias.detach().numpy())}},
        "conv3": {"kernel": t2j_conv(t.c3.weight)},
    }
    if t.cd is not None:
        p["_NormReLU_3"] = {"n": {"scale": jnp.asarray(t.n4.weight.detach().numpy()),
                                  "bias": jnp.asarray(t.n4.bias.detach().numpy())}}
        p["down_conv"] = {"kernel": t2j_conv(t.cd.weight)}
    return p


@pytest.mark.parametrize("cin,cout", [(64, 128), (128, 128), (128, 256)])
def test_convblock_parity(rng, cin, cout):
    tm = TConvBlock(cin, cout).eval()
    with torch.no_grad():
        for q in tm.parameters():
            q.copy_(torch.randn_like(q) * 0.2)

    x = rng.standard_normal((2, 16, 16, cin)).astype(np.float32)
    m = ConvBlock(cout, norm="group")
    out = m.apply({"params": convblock_params(tm)}, jnp.asarray(x))

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


class THourGlass(tnn.Module):
    def __init__(self, depth, feats):
        super().__init__()
        self.depth = depth
        self.b1 = TConvBlock(feats, feats)
        self.b2 = TConvBlock(feats, feats)
        if depth > 1:
            self.inner = THourGlass(depth - 1, feats)
        else:
            self.b2_plus = TConvBlock(feats, feats)
        self.b3 = TConvBlock(feats, feats)

    def forward(self, x):
        up1 = self.b1(x)
        low1 = self.b2(TF.avg_pool2d(x, 2, stride=2))
        low2 = self.inner(low1) if self.depth > 1 else self.b2_plus(low1)
        low3 = self.b3(low2)
        up2 = TF.interpolate(low3, scale_factor=2, mode="bicubic",
                             align_corners=True)
        return up1 + up2


def hourglass_params(t: THourGlass):
    p = {"b1": convblock_params(t.b1), "b2": convblock_params(t.b2),
         "b3": convblock_params(t.b3)}
    if t.depth > 1:
        p["inner"] = hourglass_params(t.inner)
    else:
        p["b2_plus"] = convblock_params(t.b2_plus)
    return p


def test_hourglass_parity(rng):
    feats, depth = 128, 2  # GN(32) needs out//4 divisible by 32
    tm = THourGlass(depth, feats).eval()
    with torch.no_grad():
        for q in tm.parameters():
            q.copy_(torch.randn_like(q) * 0.2)

    x = rng.standard_normal((1, 16, 16, feats)).astype(np.float32)
    m = HourGlass(depth, feats, norm="group")
    out = m.apply({"params": hourglass_params(tm)}, jnp.asarray(x))

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- PointMLP
class TMLP(tnn.Module):
    def __init__(self, chans, res_layers):
        super().__init__()
        self.res_layers = res_layers
        self.convs = tnn.ModuleList()
        self.norms = tnn.ModuleList()
        for i in range(len(chans) - 1):
            cin = chans[i] + (chans[0] if i in res_layers else 0)
            self.convs.append(tnn.Conv1d(cin, chans[i + 1], 1))
            if i != len(chans) - 2:
                self.norms.append(tnn.GroupNorm(32, chans[i + 1]))

    def forward(self, f):
        y, tmpy = f, f
        for i, c in enumerate(self.convs):
            y = c(torch.cat([y, tmpy], 1) if i in self.res_layers else y)
            if i != len(self.convs) - 1:
                y = TF.leaky_relu(self.norms[i](y))
        return torch.sigmoid(y)


def test_pointmlp_parity(rng):
    chans = [257, 1024, 512, 256, 128, 1]
    res = [2, 3, 4]
    tm = TMLP(chans, res).eval()
    with torch.no_grad():
        for q in tm.parameters():
            q.copy_(torch.randn_like(q) * 0.05)

    params = {}
    ni = 0
    for i, c in enumerate(tm.convs):
        params[f"dense{i}"] = {
            "kernel": jnp.asarray(c.weight.detach().numpy()[:, :, 0].T),
            "bias": jnp.asarray(c.bias.detach().numpy()),
        }
        if i != len(tm.convs) - 1:
            n = tm.norms[ni]
            params[f"norm{i}"] = {
                "scale": jnp.asarray(n.weight.detach().numpy()),
                "bias": jnp.asarray(n.bias.detach().numpy()),
            }
            ni += 1

    x = rng.standard_normal((2, 300, chans[0])).astype(np.float32)
    m = PointMLP(chans, merge_layer=2, res_layers=tuple(res), norm="group")
    y, phi = m.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 2, 1))
    ref = ref.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
    # phi captured post-activation at layer 2 -> chans[3]=256 features;
    # 16 (local feat) + 256 = 272 = the fine MLP's input width.
    assert phi.shape == (2, 300, 256)


# ---------------------------------------------------------------- HGFilter
def test_hgfilter_shapes():
    m = HGFilter(n_stack=2, depth=2, last_channels=8, norm="group",
                 down_type="ave_pool")
    x = jnp.zeros((1, 64, 64, 12))
    params = m.init(jax.random.PRNGKey(0), x)
    outs, normx = m.apply(params, x)
    assert len(outs) == 2
    assert outs[0].shape == (1, 16, 16, 8)   # stride 4 (7x7/2 + pool)
    assert normx.shape == (1, 16, 16, 128)

    m2 = HGFilter(n_stack=1, depth=2, last_channels=16, norm="group",
                  down_type="no_down")
    params2 = m2.init(jax.random.PRNGKey(0), x)
    outs2, _ = m2.apply(params2, x)
    assert outs2[0].shape == (1, 32, 32, 16)  # stride 2 (no pool)
