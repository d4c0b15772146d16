"""Pin the perceptual-loss auto-selection order and the torch-.pth
VGG16 import path (VERDICT r4 item 7).

Reference: /root/reference/networks.py:419-449 (torchvision
vgg16(pretrained) perceptual), pretrain_netG.py:159-197 (5*L1 + VGG
loss).  The environment ships no pretrained VGG16, so the loader must
keep working against a synthetic torchvision-layout .pth and the
selection must rank vgg16 > l1_only, with the native backbone as
EXPLICIT opt-in ("native") — its single-seed margin did not survive
the 3-seed study (select_perceptual docstring has the numbers).
"""

import os

import numpy as np
import pytest

from rgbd_pifuhd_tpu.models.vgg import VGG16Features
from rgbd_pifuhd_tpu.train import loop as train_loop


def test_auto_selection_order(monkeypatch, tmp_path):
    """auto: vgg16 when weights exist, else l1-only; the native backbone
    is explicit opt-in ("native"); the random-feature VGG is NEVER
    auto-selected (measured ~5-15x worse than L1-only,
    scripts/vgg_gap_study.py)."""
    from rgbd_pifuhd_tpu.models import perceptual as perc_mod

    # no VGG16 weights -> l1_only, no loss fn (NOT the native backbone:
    # its margin is seed noise — 3-seed study in select_perceptual)
    monkeypatch.setattr(VGG16Features, "find_weights",
                        staticmethod(lambda path=None: None))
    loss, label = train_loop.select_perceptual("auto")
    assert label == "l1_only" and loss is None

    # the committed native backbone remains reachable by explicit opt-in
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bpath = os.path.join(repo, "assets", "perceptual", "backbone.npz")
    if os.path.exists(bpath):
        monkeypatch.setattr(perc_mod, "find_backbone", lambda: bpath)
        loss, label = train_loop.select_perceptual("native")
        assert label == "native_backbone" and callable(loss)

    # real VGG16 weights win in auto mode
    monkeypatch.setattr(
        VGG16Features, "find_weights",
        staticmethod(lambda path=None: str(tmp_path / "fake.npz")))
    called = {}
    monkeypatch.setattr(
        VGG16Features, "load_weights",
        staticmethod(lambda path=None, rng_key=0:
                     called.setdefault("k", VGG16Features.init_params(0))))
    loss, label = train_loop.select_perceptual("auto")
    assert label == "vgg16" and callable(loss) and "k" in called

    # explicit off
    loss, label = train_loop.select_perceptual(False)
    assert label == "l1_only" and loss is None


def _synthetic_vgg16_state_dict():
    """torchvision vgg16 features.* layout, tiny random values."""
    torch = pytest.importorskip("torch")
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
             (256, 256), (256, 256), (256, 512), (512, 512), (512, 512)]
    torch_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    g = torch.Generator().manual_seed(0)
    sd = {}
    for (cin, cout), tid in zip(chans, torch_ids):
        sd[f"features.{tid}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * 0.05
        sd[f"features.{tid}.bias"] = torch.randn((cout,), generator=g) * 0.05
    return sd


def test_torch_pth_roundtrip(tmp_path, monkeypatch):
    """load_torch_weights imports a torchvision-layout .pth exactly
    (OIHW -> HWIO transpose), the loaded params drive a forward pass,
    and load_weights finds the file through the RGBD_PIFUHD_VGG16 env
    var (the documented local-weights plug point)."""
    import jax.numpy as jnp
    torch = pytest.importorskip("torch")

    sd = _synthetic_vgg16_state_dict()
    path = str(tmp_path / "vgg16-synthetic.pth")
    torch.save(sd, path)

    params = VGG16Features.load_torch_weights(path)
    w0 = np.asarray(params["params"]["conv0"]["kernel"])
    assert w0.shape == (3, 3, 3, 64)
    np.testing.assert_allclose(
        w0, sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(params["params"]["conv9"]["bias"]),
        sd["features.21.bias"].numpy())

    # the imported params run the real feature extractor (four taps:
    # relu1_2, relu2_2, relu3_3, relu4_3 — models/vgg.py _BLOCKS)
    feats = VGG16Features().apply(params, jnp.zeros((1, 64, 64, 3)))
    assert len(feats) == 4
    assert all(np.all(np.isfinite(np.asarray(f))) for f in feats)

    # env-var discovery path selects the file end-to-end
    monkeypatch.setenv("RGBD_PIFUHD_VGG16", path)
    assert VGG16Features.find_weights() == path
    loaded = VGG16Features.load_weights()
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv0"]["kernel"]), w0)
    # and auto-selection now reports the real thing
    loss, label = train_loop.select_perceptual("auto")
    assert label == "vgg16"
