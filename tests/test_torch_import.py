"""Torch-checkpoint import: reference state dicts -> flax params, verified
numerically.

The mirrors here register submodules under the reference's EXACT attribute
names (Filter.py:23-185 uses ``add_module('m{}')``, ``bn_end{}``, flat
hourglass levels ``b1_{L}``; MLP.py:23-41 uses ``filters``/``norms``
ModuleLists; networks.py:140-160 builds one ``model`` Sequential), so their
``state_dict()`` keys are byte-identical to what the reference's training
drivers save (train.py:211-212).  Each test converts such a state dict with
utils.torch_import and demands the flax module reproduce the torch forward.
"""

import argparse
import os

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.models import HGFilter, PointMLP, ConvBlock
from rgbd_pifuhd_tpu.models.pix2pix import GlobalGenerator
from rgbd_pifuhd_tpu.utils import torch_import as ti
from rgbd_pifuhd_tpu.utils import checkpoint as ckpt


# ------------------------------------------------- reference-named mirrors
class RefConvBlock(tnn.Module):
    """Filter.py:23-69 with its exact attribute names."""

    def __init__(self, cin, cout, norm="group"):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout // 2, 3, padding=1, bias=False)
        self.conv2 = tnn.Conv2d(cout // 2, cout // 4, 3, padding=1,
                                bias=False)
        self.conv3 = tnn.Conv2d(cout // 4, cout // 4, 3, padding=1,
                                bias=False)
        mk = (lambda ch: tnn.GroupNorm(32, ch)) if norm == "group" \
            else (lambda ch: tnn.BatchNorm2d(ch))
        self.bn1 = mk(cin)
        self.bn2 = mk(cout // 2)
        self.bn3 = mk(cout // 4)
        if cin != cout:
            self.bn4 = mk(cin)
            self.downsample = tnn.Sequential(
                self.bn4, tnn.ReLU(True),
                tnn.Conv2d(cin, cout, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        y1 = self.conv1(TF.relu(self.bn1(x)))
        y2 = self.conv2(TF.relu(self.bn2(y1)))
        y3 = self.conv3(TF.relu(self.bn3(y2)))
        return torch.cat([y1, y2, y3], 1) + res


class RefHourGlass(tnn.Module):
    """Filter.py:71-130: all levels registered FLAT via add_module."""

    def __init__(self, depth, feats, norm="group"):
        super().__init__()
        self.depth = depth
        self._gen(depth, feats, norm)

    def _gen(self, level, feats, norm):
        self.add_module(f"b1_{level}", RefConvBlock(feats, feats, norm))
        self.add_module(f"b2_{level}", RefConvBlock(feats, feats, norm))
        if level > 1:
            self._gen(level - 1, feats, norm)
        else:
            self.add_module(f"b2_plus_{level}",
                            RefConvBlock(feats, feats, norm))
        self.add_module(f"b3_{level}", RefConvBlock(feats, feats, norm))

    def _fwd(self, level, x):
        up1 = self._modules[f"b1_{level}"](x)
        low1 = self._modules[f"b2_{level}"](TF.avg_pool2d(x, 2, stride=2))
        low2 = self._fwd(level - 1, low1) if level > 1 \
            else self._modules[f"b2_plus_{level}"](low1)
        low3 = self._modules[f"b3_{level}"](low2)
        up2 = TF.interpolate(low3, scale_factor=2, mode="bicubic",
                             align_corners=True)
        return up1 + up2

    def forward(self, x):
        return self._fwd(self.depth, x)


class RefFilter(tnn.Module):
    """Filter.py:132-228 with its exact attribute names (ave_pool path)."""

    def __init__(self, n_stack, depth, cin, last_ch, norm="group"):
        super().__init__()
        self.n_stack = n_stack
        self.conv1 = tnn.Conv2d(cin, 64, 7, stride=2, padding=3)
        self.bn1 = tnn.GroupNorm(32, 64) if norm == "group" \
            else tnn.BatchNorm2d(64)
        self.conv2 = RefConvBlock(64, 128, norm)
        self.conv3 = RefConvBlock(128, 128, norm)
        self.conv4 = RefConvBlock(128, 256, norm)
        for i in range(n_stack):
            self.add_module(f"m{i}", RefHourGlass(depth, 256, norm))
            self.add_module(f"top_m_{i}", RefConvBlock(256, 256, norm))
            self.add_module(f"conv_last{i}", tnn.Conv2d(256, 256, 1))
            self.add_module(f"bn_end{i}",
                            tnn.GroupNorm(32, 256) if norm == "group"
                            else tnn.BatchNorm2d(256))
            self.add_module(f"l{i}", tnn.Conv2d(256, last_ch, 1))
            if i < n_stack - 1:
                self.add_module(f"bl{i}", tnn.Conv2d(256, 256, 1))
                self.add_module(f"al{i}", tnn.Conv2d(last_ch, 256, 1))

    def forward(self, x):
        x = TF.relu(self.bn1(self.conv1(x)))
        x = TF.avg_pool2d(self.conv2(x), 2, stride=2)
        normx = x
        previous = self.conv4(self.conv3(x))
        outputs = []
        for i in range(self.n_stack):
            hg = self._modules[f"m{i}"](previous)
            ll = TF.relu(self._modules[f"bn_end{i}"](
                self._modules[f"conv_last{i}"](
                    self._modules[f"top_m_{i}"](hg))))
            out = self._modules[f"l{i}"](ll)
            outputs.append(out)
            if i < self.n_stack - 1:
                previous = (previous + self._modules[f"bl{i}"](ll)
                            + self._modules[f"al{i}"](out))
        return outputs, normx


class RefMLP(tnn.Module):
    """MLP.py:12-75 with its exact attribute names."""

    def __init__(self, chans, res_layers, norm="group"):
        super().__init__()
        self.filters = tnn.ModuleList()
        self.norms = tnn.ModuleList()
        self.res_layers = res_layers
        self.norm = norm
        for i in range(len(chans) - 1):
            cin = chans[i] + (chans[0] if i in res_layers else 0)
            self.filters.append(tnn.Conv1d(cin, chans[i + 1], 1))
            if i != len(chans) - 2 and norm in ("group", "batch"):
                self.norms.append(tnn.GroupNorm(32, chans[i + 1])
                                  if norm == "group"
                                  else tnn.BatchNorm1d(chans[i + 1]))

    def forward(self, f):
        y, tmpy = f, f
        for i, c in enumerate(self.filters):
            y = c(torch.cat([y, tmpy], 1) if i in self.res_layers else y)
            if i != len(self.filters) - 1:
                y = TF.leaky_relu(
                    self.norms[i](y) if self.norm in ("group", "batch")
                    else y, 0.01)
        return torch.sigmoid(y)


def ref_global_generator(cin, cout, ngf, nd, nb):
    """networks.py:131-160 Sequential with norm='instance'."""
    def resblock(dim):
        blk = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3),
            tnn.InstanceNorm2d(dim), tnn.ReLU(True),
            tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3),
            tnn.InstanceNorm2d(dim))
        m = tnn.Module()
        m.conv_block = blk
        m.forward = lambda x, _b=blk: x + _b(x)
        return m

    layers = [tnn.ReflectionPad2d(3), tnn.Conv2d(cin, ngf, 7),
              tnn.InstanceNorm2d(ngf), tnn.ReLU(True)]
    for i in range(nd):
        mult = 2 ** i
        layers += [tnn.Conv2d(ngf * mult, ngf * mult * 2, 3, stride=2,
                              padding=1),
                   tnn.InstanceNorm2d(ngf * mult * 2), tnn.ReLU(True)]
    mult = 2 ** nd
    for _ in range(nb):
        layers += [resblock(ngf * mult)]
    for i in range(nd):
        mult = 2 ** (nd - i)
        layers += [tnn.ConvTranspose2d(ngf * mult, ngf * mult // 2, 3,
                                       stride=2, padding=1,
                                       output_padding=1),
                   tnn.InstanceNorm2d(ngf * mult // 2), tnn.ReLU(True)]
    layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, cout, 7), tnn.Tanh()]
    m = tnn.Module()
    m.model = tnn.Sequential(*layers)
    m.forward = lambda x: m.model(x)
    return m


def _randomize(m, scale=0.15):
    with torch.no_grad():
        for q in m.parameters():
            q.copy_(torch.randn_like(q) * scale)
    return m.eval()


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# ------------------------------------------------------------------- tests
def test_hgfilter_import_group(rng):
    t = _randomize(RefFilter(2, 2, 6, 32, norm="group"))
    sd = {f"image_filter.{k}": v.numpy() for k, v in t.state_dict().items()}
    params, stats = ti.hgfilter_from_sd(sd, "image_filter")
    assert not stats
    x = rng.standard_normal((2, 64, 64, 6)).astype(np.float32)
    m = HGFilter(n_stack=2, depth=2, last_channels=32, norm="group",
                 down_type="ave_pool")
    outs, normx = m.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref_outs, ref_normx = t(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(normx),
                               ref_normx.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(np.asarray(o),
                                   r.permute(0, 2, 3, 1).numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_hgfilter_import_prefixed_keys(rng):
    """State dict keys carry the submodule prefix exactly as saved."""
    t = _randomize(RefFilter(1, 2, 6, 32))
    sd = {f"image_filter.{k}": v.numpy() for k, v in t.state_dict().items()}
    params, _ = ti.hgfilter_from_sd(sd, "image_filter")
    assert "conv1" in params and "m0" in params and "l0" in params
    assert "inner" in params["m0"] and "b2_plus" in params["m0"]["inner"]


def test_convblock_import_batchnorm(rng):
    """BatchNorm checkpoints land affine in params + stats in batch_stats."""
    t = _randomize(RefConvBlock(64, 128, norm="batch"))
    with torch.no_grad():  # non-trivial running stats
        t.bn1.running_mean.uniform_(-0.3, 0.3)
        t.bn1.running_var.uniform_(0.5, 1.5)
        t.bn4.running_mean.uniform_(-0.3, 0.3)
        t.bn4.running_var.uniform_(0.5, 1.5)
    sd = {f"blk.{k}": v.numpy() for k, v in t.state_dict().items()}
    params, stats = ti.convblock_from_sd(sd, "blk")
    assert "mean" in stats["_NormReLU_0"]["n"]
    x = rng.standard_normal((2, 16, 16, 64)).astype(np.float32)
    m = ConvBlock(128, norm="batch")
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(x), False)
    with torch.no_grad():
        ref = t(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-4, atol=2e-4)


def test_mlp_import(rng):
    chans = [19, 64, 32, 1]
    t = _randomize(RefMLP(chans, res_layers=[1]), scale=0.1)
    sd = {f"mlp.{k}": v.numpy() for k, v in t.state_dict().items()}
    params, stats = ti.pointmlp_from_sd(sd, "mlp")
    assert not stats
    x = rng.standard_normal((2, 40, 19)).astype(np.float32)
    m = PointMLP(filter_channels=tuple(chans), merge_layer=1,
                 res_layers=(1,), norm="group", last_op="sigmoid")
    out, _phi = m.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = t(torch.from_numpy(x).permute(0, 2, 1))
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_global_generator_import(rng):
    t = _randomize(ref_global_generator(3, 3, 8, nd=2, nb=2), scale=0.1)
    sd = {f"netF.{k}": v.numpy() for k, v in t.state_dict().items()}
    params = ti.global_generator_from_sd(sd, "netF")
    assert set(params) == {"stem", "down0", "down1", "res0", "res1",
                           "up0", "up1", "head"}
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    m = GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2, n_blocks=2)
    out = m.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = t(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_reconcile_pads_input_channels(rng):
    """3-channel reference netF weights widen to our 6-channel RGB-D stem
    with a zero contribution from the new channels."""
    t = _randomize(ref_global_generator(3, 3, 8, nd=1, nb=1), scale=0.1)
    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    params = ti.global_generator_from_sd(sd, "")
    m = GlobalGenerator(output_nc=3, ngf=8, n_downsampling=1, n_blocks=1)
    x6 = rng.standard_normal((1, 32, 32, 6)).astype(np.float32)
    template = m.init(jax.random.PRNGKey(0), jnp.asarray(x6))["params"]
    padded = ti.reconcile_input_channels(params, template)
    assert padded["stem"]["kernel"].shape == (7, 7, 6, 8)
    out = m.apply({"params": padded}, jnp.asarray(x6))
    with torch.no_grad():
        ref = t(torch.from_numpy(x6[..., :3]).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-4)


def test_reconcile_rejects_other_mismatch(rng):
    t = _randomize(ref_global_generator(3, 3, 8, nd=1, nb=1))
    params = ti.global_generator_from_sd(
        {k: v.numpy() for k, v in t.state_dict().items()}, "")
    m = GlobalGenerator(output_nc=3, ngf=16, n_downsampling=1, n_blocks=1)
    template = m.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 3)))["params"]
    with pytest.raises(ValueError, match="shape mismatch"):
        ti.reconcile_input_channels(params, template)


def test_netmr_checkpoint_end_to_end(tmp_path, rng):
    """A torch.save'd netMR checkpoint (reference train.py:211 format) loads
    transparently through utils.checkpoint.load_checkpoint, maps the
    embedded Namespaces to Options, and the params plug into MultiResPIFu.
    """
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.utils.options import Options, PIFuLevelConfig

    fine = _randomize(RefFilter(1, 2, 6, 16))
    fine_mlp = _randomize(RefMLP([48, 64, 32, 1], res_layers=[1]))
    coarse = _randomize(RefFilter(2, 2, 6, 32))
    coarse_mlp = _randomize(RefMLP([33, 64, 32, 1], res_layers=[1]))
    sd = {}
    for mod, pre in ((fine, "image_filter"), (fine_mlp, "mlp"),
                     (coarse, "netG.image_filter"), (coarse_mlp, "netG.mlp")):
        sd.update({f"{pre}.{k}": v for k, v in mod.state_dict().items()})

    opt_l = argparse.Namespace(
        num_stack=1, hg_depth=2, hg_dim=16, norm="group",
        hg_down="ave_pool", mlp_dim=[48, 64, 32, 1], mlp_res_layers=[1],
        merge_layer=1, loadSize=128, z_size=50.0, learning_rate=5e-4,
        name="ref_exp", resolution=256)
    opt_g = argparse.Namespace(
        num_stack=2, hg_depth=2, hg_dim=32, norm="group",
        hg_down="ave_pool", mlp_dim=[33, 64, 32, 1], mlp_res_layers=[1],
        merge_layer=1, loadSize=128, z_size=50.0, name="ref_exp")
    path = os.path.join(tmp_path, "netMR_latest")
    torch.save({"opt": opt_l, "opt_netG": opt_g, "model_state_dict": sd},
               path)

    state = ckpt.load_checkpoint(path)
    assert state.get("torch_import")
    opt = Options.from_dict(state["opt"])
    assert opt.netMR.num_stack == 1 and opt.netMR.hg_dim == 16
    assert opt.netG.num_stack == 2 and opt.netG.hg_dim == 32
    assert opt.name == "ref_exp" and opt.learning_rate == 5e-4

    cfg_g = PIFuLevelConfig(
        num_stack=2, hg_depth=2, hg_dim=32, mlp_dim=(33, 64, 32, 1),
        mlp_res_layers=(1,), merge_layer=1, use_front_normal=False,
        use_back_normal=False, load_size=128, z_size=50.0)
    cfg_l = PIFuLevelConfig(
        num_stack=1, hg_depth=2, hg_dim=16, hg_down="ave_pool",
        mlp_dim=(48, 64, 32, 1), mlp_res_layers=(1,), merge_layer=1,
        use_front_normal=False, use_back_normal=False, load_size=128,
        z_size=50.0)
    model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)
    eye = jnp.eye(4, dtype=jnp.float32)
    args = (jnp.zeros((1, 1, 32, 32, 6)), jnp.zeros((1, 32, 32, 6)),
            jnp.zeros((1, 1, 8, 3)), eye[None, None], eye[None],
            jnp.zeros((1, 1, 8, 1)))
    template = model.init(jax.random.PRNGKey(0), *args)
    imported = ti.reconcile_input_channels(
        state["params"]["params"], template["params"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.shape(a), np.shape(b)), imported, template["params"])
    # the imported params actually run
    preds = model.apply({"params": imported}, *args)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(preds))


def test_cli_recon_from_torch_checkpoint(tmp_path):
    """The full migration story through the CLI: a reference-format
    torch.save netMR checkpoint + an inference image dir -> run_recon
    -> colored OBJ on disk, with the checkpoint's embedded Namespaces
    driving the model configuration (reconstruction.py:252-269 semantics).
    """
    import cv2

    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    from rgbd_pifuhd_tpu.cli.run_recon import main as recon_main
    from rgbd_pifuhd_tpu.recon.mesh import load_obj

    # reference-format checkpoint: fine(ave_pool, dim 4) over coarse
    # (2-stack, dim 8), mlp_norm 'none' (MLP.py:66-69 path).  Torch's
    # DEFAULT init (seeded) + zeroed final biases: kaiming weights with
    # unit norm scales give the occupancy field real per-point spread
    # straddling 0.5, so the level set provably exists.  (_randomize's
    # all-params ~N(0,0.15) flattens GroupNorm scales toward 0 and lets
    # random biases dominate -> a constant field -> empty mesh.)
    torch.manual_seed(11)
    fine = RefFilter(1, 1, 6, 4).eval()
    fine_mlp = RefMLP([20, 32, 16, 1], res_layers=[1], norm="none").eval()
    coarse = RefFilter(2, 1, 6, 8).eval()
    coarse_mlp = RefMLP([9, 64, 32, 16, 1], res_layers=[1],
                        norm="none").eval()
    with torch.no_grad():
        fine_mlp.filters[-1].bias.zero_()
        coarse_mlp.filters[-1].bias.zero_()
    sd = {}
    for mod, pre in ((fine, "image_filter"), (fine_mlp, "mlp"),
                     (coarse, "netG.image_filter"), (coarse_mlp, "netG.mlp")):
        sd.update({f"{pre}.{k}": v for k, v in mod.state_dict().items()})
    common = dict(hg_depth=1, norm="group", hg_down="ave_pool",
                  mlp_norm="none", loadSize=64, z_size=200.0,
                  use_front_normal=False, use_back_normal=False,
                  name="torchexp")
    opt_l = argparse.Namespace(num_stack=1, hg_dim=4,
                               mlp_dim=[20, 32, 16, 1], mlp_res_layers=[1],
                               merge_layer=1, **common)
    opt_g = argparse.Namespace(num_stack=2, hg_dim=8,
                               mlp_dim=[9, 64, 32, 16, 1],
                               mlp_res_layers=[1], merge_layer=2, **common)
    ckpt_path = os.path.join(tmp_path, "netMR_latest")
    torch.save({"opt": opt_l, "opt_netG": opt_g, "model_state_dict": sd},
               ckpt_path)

    # inference dir (readData layout) from a synthetic render
    root = os.path.join(tmp_path, "traindata")
    generate_synthetic_dataset(root, subjects=("sphere",), size=64,
                               load_size=64)
    img_dir = os.path.join(tmp_path, "test_images")
    os.makedirs(os.path.join(img_dir, "depth"))
    render = cv2.imread(os.path.join(root, "RENDER", "sphere", "0_0_00.jpg"))
    depth = cv2.imread(os.path.join(root, "DEPTH", "sphere", "0_0_00.png"))
    cv2.imwrite(os.path.join(img_dir, "subject.png"), render)
    cv2.imwrite(os.path.join(img_dir, "depth", "depth_subject.png"), depth)
    h, w = render.shape[:2]
    np.savetxt(os.path.join(img_dir, "subject_rect.txt"),
               np.array([[0, 0, w, h]]), fmt="%d")

    results = os.path.join(tmp_path, "results")
    recon_main([
        "--dataroot", img_dir,
        "--load_netMR_checkpoint_path", ckpt_path,
        "--results_path", results, "--resolution", "32",
        "--loadSize", "64", "--name", "torchexp",
    ])
    out_obj = os.path.join(results, "torchexp", "recon",
                           "result_subject_32.obj")
    assert os.path.exists(out_obj)
    v, f, _c = load_obj(out_obj)
    assert len(v) > 0 and len(f) > 0


def test_is_torch_checkpoint_negative(tmp_path):
    p = os.path.join(tmp_path, "x")
    with open(p, "wb") as f:
        f.write(b"\x84\xa6params")  # msgpack map
    assert not ti.is_torch_checkpoint(p)
