"""End-to-end training-driver tests on synthetic data (tiny configs)."""

import os

import numpy as np
import pytest

import jax

from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
from rgbd_pifuhd_tpu.utils.options import Options
from tests.test_models_pifu import tiny_global, tiny_local


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data") / "traindata")
    generate_synthetic_dataset(root, subjects=("sphere", "capsule"),
                               size=128, load_size=128)
    return root


def make_opt(root, tmp_path):
    return Options(
        dataroot=root, load_size=128, load_size_big=128, load_size_local=64,
        num_sample_inout=64, sigma=5.0, batch_size=1, num_epoch=1,
        learning_rate=1e-3, netG=tiny_global(), netMR=tiny_local(),
        checkpoints_path=os.path.join(tmp_path, "ckpt"),
        name="t", freq_save=1,
    )


def test_train_fine_reduces_loss(synth_root, tmp_path):
    from rgbd_pifuhd_tpu.train.loop import train_fine
    from rgbd_pifuhd_tpu.utils.logging import load_error_history

    opt = make_opt(synth_root, str(tmp_path))
    params = train_fine(opt, max_steps=2)
    assert params is not None
    # checkpoint written with reference naming
    assert os.path.exists(os.path.join(str(tmp_path), "ckpt",
                                       "t_train_latest"))
    hist = load_error_history("./train_result", "t_netMR")
    assert hist and np.isfinite(hist[-1]).all()


def test_pretrain_coarse_runs(synth_root, tmp_path):
    from rgbd_pifuhd_tpu.train.loop import pretrain_coarse

    opt = make_opt(synth_root, str(tmp_path))
    params = pretrain_coarse(opt, max_steps=2)
    assert "image_filter" in params["params"]


def test_pretrain_guards_zero_step_epochs(synth_root, tmp_path):
    """batch_size > len(dataset) must raise, not silently run zero steps
    and still write an untrained checkpoint (drop_last batching).  Found
    live: a 2-subject-per-batch-short drive wrote `*_latest` having never
    stepped.  train_fine already guarded; coarse/normals must too."""
    import dataclasses

    from rgbd_pifuhd_tpu.train.loop import pretrain_coarse, pretrain_normals

    opt = dataclasses.replace(make_opt(synth_root, str(tmp_path)),
                              batch_size=10_000)
    with pytest.raises(RuntimeError, match="dataset too small"):
        pretrain_coarse(opt, max_steps=1)
    with pytest.raises(RuntimeError, match="dataset too small"):
        pretrain_normals(opt, max_steps=1, use_vgg=False)


def test_pretrain_normals_runs(synth_root, tmp_path):
    from rgbd_pifuhd_tpu.train.loop import pretrain_normals
    import dataclasses

    opt = make_opt(synth_root, str(tmp_path))
    # enable normal nets on the tiny global config
    opt.netG = dataclasses.replace(
        tiny_global(True), nml_ngf=8, nml_n_downsampling=2, nml_n_blocks=1)
    out = pretrain_normals(opt, max_steps=1, use_vgg=False)
    assert "netF" in out and "netB" in out


def test_pretrain_normals_native_backbone_auto(synth_root, tmp_path):
    """use_vgg='auto' with no VGG weights but a committed native backbone
    (assets/perceptual/backbone.npz) must pick the CompactFeatures
    perceptual loss and still train (VERDICT r3 task 5)."""
    import dataclasses

    from rgbd_pifuhd_tpu.models.perceptual import (
        CompactFeatures, find_backbone, load_backbone)
    from rgbd_pifuhd_tpu.train.loop import pretrain_normals

    bpath = find_backbone()
    assert bpath is not None and bpath.endswith("backbone.npz")
    params = load_backbone(bpath)
    feats = CompactFeatures().apply(
        params, np.zeros((1, 32, 32, 3), np.float32))
    assert len(feats) == 4 and feats[0].shape == (1, 32, 32, 16)

    opt = make_opt(synth_root, str(tmp_path))
    opt.netG = dataclasses.replace(
        tiny_global(True), nml_ngf=8, nml_n_downsampling=2, nml_n_blocks=1)
    out = pretrain_normals(opt, max_steps=1, use_vgg="auto")
    assert "netF" in out and "netB" in out


def test_checkpoint_roundtrip_and_opt_restore(synth_root, tmp_path):
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt
    from rgbd_pifuhd_tpu.train.loop import build_multires, \
        init_multires_params
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset

    opt = make_opt(synth_root, str(tmp_path))
    ds = TrainDataset(opt)
    model = build_multires(opt)
    params = init_multires_params(opt, model, ds[0])

    path = os.path.join(str(tmp_path), "ck")
    ckpt.save_checkpoint(path, params, opt, epoch=3)
    state = ckpt.load_checkpoint(path)
    assert state["epoch"] == 3

    # restore-opt semantics: checkpoint wins except the 4 kept fields
    cli = Options(dataroot="/other", resolution=64, results_path="/res",
                  load_size=256, mesh_format="ply", normal_mode="grad")
    restored, opt_g = ckpt.restore_options(cli, state)
    assert restored.dataroot == "/other"          # kept from CLI
    assert restored.resolution == 64              # kept from CLI
    assert restored.num_sample_inout == opt.num_sample_inout  # from ckpt
    assert restored.netG.hg_dim == opt.netG.hg_dim
    # output preferences are CLI-kept too: the (fd/obj-era) checkpoint
    # must not silently override this run's export format / normal mode
    assert restored.mesh_format == "ply"
    assert restored.normal_mode == "grad"

    # params round-trip exactly
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(state["params"])
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))


def test_evaluate_checkpoints_small_dataset(synth_root, tmp_path):
    """An eval set SMALLER than batch_size must still evaluate every item
    and produce a finite metric (previously zero batches -> np.mean([])
    -> NaN silently written to the eval .npy).  Reference eval.py:157-206
    evaluates every item."""
    from rgbd_pifuhd_tpu.train.loop import (
        build_multires, evaluate_checkpoints, init_multires_params)
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt

    opt = make_opt(synth_root, str(tmp_path))
    opt.batch_size = 32  # larger than the 2-subject synthetic eval set
    model = build_multires(opt)
    params = init_multires_params(opt, model, TrainDataset(opt)[0])
    ckpt.save_checkpoint(
        ckpt.epoch_path(opt.checkpoints_path, opt.name, 0),
        params, opt, epoch=0)

    results = evaluate_checkpoints(opt)
    assert 0 in results
    assert np.isfinite(results[0]), results
    errs = np.load(os.path.join(opt.checkpoints_path,
                                "t_eval_epoch_0.npy"))
    assert len(errs) >= 1 and np.isfinite(errs).all()


def test_metrics():
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.utils.metrics import compute_acc, chamfer_l2

    pred = jnp.array([0.9, 0.8, 0.2, 0.1])
    gt = jnp.array([1.0, 0.0, 1.0, 0.0])
    iou, prec, rec = compute_acc(pred, gt)
    assert float(iou) == pytest.approx(1 / 3)
    assert float(prec) == pytest.approx(0.5)
    assert float(rec) == pytest.approx(0.5)

    a = jnp.zeros((10, 3))
    assert float(chamfer_l2(a, a)) == 0.0


def test_train_full_pifu_grads_flow(synth_root, tmp_path, rng=None):
    """With train_full_pifu=True the fine loss must reach netG params."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rgbd_pifuhd_tpu.models import MultiResPIFu

    model = MultiResPIFu(cfg=tiny_local(), cfg_global=tiny_global(),
                         train_full_pifu=True)
    r = np.random.default_rng(0)
    imgs_l = jnp.asarray(r.standard_normal((1, 1, 32, 32, 6)).astype(np.float32))
    imgs_g = jnp.asarray(r.standard_normal((1, 64, 64, 6)).astype(np.float32))
    points = jnp.asarray(r.uniform(-0.9, 0.9, (1, 1, 32, 3)).astype(np.float32))
    calib_l = jnp.eye(4, dtype=jnp.float32)[None, None]
    calib_g = jnp.eye(4, dtype=jnp.float32)[None]
    labels = jnp.asarray((r.uniform(0, 1, (1, 1, 32, 1)) > 0.5).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs_l, imgs_g, points,
                        calib_l, calib_g, labels)

    def loss_fn(p):
        err, _ = model.apply(p, imgs_l, imgs_g, points, calib_l, calib_g,
                             labels)
        return err["occ_fine"] + err.get("occ", 0.0)

    grads = jax.grad(loss_fn)(params)
    g_netG = jax.tree_util.tree_leaves(grads["params"]["netG"])
    assert any(float(jnp.abs(g).max()) > 0.0 for g in g_netG)


def test_calc_error_helper(synth_root, tmp_path):
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.utils.metrics import calc_error
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.train.loop import collate_coarse

    opt = make_opt(synth_root, str(tmp_path))
    ds = TrainDataset(opt)

    def fake_apply(params, batch):
        preds = jnp.full_like(batch["labels"], 0.9)
        return 0.25, preds, batch["labels"]

    loss, iou, prec, rec = calc_error(fake_apply, None, ds, collate_coarse, 1)
    assert loss == 0.25
    assert 0 < iou <= 1 and rec == 1.0  # all-positive predictor


def test_batchnorm_training_updates_stats(synth_root, tmp_path):
    """norm='batch' (the reference default) must train with mutable stats."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rgbd_pifuhd_tpu.models import CoarsePIFu
    from rgbd_pifuhd_tpu.train.trainers import (
        make_coarse_train_step, make_optimizer)

    cfg = dataclasses.replace(tiny_global(), norm="batch")
    model = CoarsePIFu(cfg)
    r = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(r.standard_normal((2, 64, 64, 6)).astype(np.float32)),
        "points": jnp.asarray(r.uniform(-0.5, 0.5, (2, 32, 3)).astype(np.float32)),
        "calibs": jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1)),
        "labels": jnp.zeros((2, 32, 1), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["points"], batch["calibs"], batch["labels"])
    assert "batch_stats" in variables

    tx = make_optimizer("rmsprop", 1e-3)
    opt_state = tx.init(variables["params"])
    step = jax.jit(make_coarse_train_step(model, tx, gamma=0.5))

    before = jax.tree_util.tree_leaves(variables["batch_stats"])[0].copy()
    variables, opt_state, m = step(variables, opt_state, batch)
    after = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_alternating_curriculum_smoke(synth_root, tmp_path):
    """altertrain parity: one cycle of normals -> coarse -> fine on tiny
    configs with normal nets enabled."""
    import dataclasses
    from rgbd_pifuhd_tpu.train.loop import train_alternating

    opt = make_opt(synth_root, str(tmp_path))
    opt.netG = dataclasses.replace(
        tiny_global(True), nml_ngf=8, nml_n_downsampling=2, nml_n_blocks=1)
    params = train_alternating(opt, cycles=1, nml_epochs=1, coarse_epochs=1,
                               fine_epochs=1, max_steps=1)
    assert "netG" in params["params"]
    assert "netF" in params["params"]["netG"]


def test_gan_normal_training_step(synth_root, tmp_path):
    """GAN-mode normal training: G and D both update, losses finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rgbd_pifuhd_tpu.models.pix2pix import (
        GlobalGenerator, MultiscaleDiscriminator)
    from rgbd_pifuhd_tpu.train.trainers import (
        make_gan_normal_train_step, make_optimizer)

    gen = GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2, n_blocks=1)
    disc = MultiscaleDiscriminator(ndf=8, n_layers=2, num_D=2)
    r = np.random.default_rng(0)
    images = jnp.asarray(r.standard_normal((1, 64, 64, 6)).astype(np.float32))
    target = jnp.asarray(r.standard_normal((1, 64, 64, 3)).astype(np.float32))

    g_params = gen.init(jax.random.PRNGKey(0), images)
    d_params = disc.init(jax.random.PRNGKey(1),
                         jnp.concatenate([images, target], -1))

    def disc_apply(p, imgs, maps):
        return disc.apply(p, jnp.concatenate([imgs, maps], -1))

    tx_g = make_optimizer("adam", 1e-3)
    tx_d = make_optimizer("adam", 1e-3)
    step = jax.jit(make_gan_normal_train_step(
        lambda p, x: gen.apply(p, x), disc_apply, tx_g, tx_d))

    g_state, d_state = tx_g.init(g_params), tx_d.init(d_params)
    before_g = jax.tree_util.tree_leaves(g_params)[0].copy()
    before_d = jax.tree_util.tree_leaves(d_params)[0].copy()
    batch = {"images": images, "target": target}
    g_params, d_params, g_state, d_state, m = step(
        g_params, d_params, g_state, d_state, batch)
    assert np.isfinite(float(m["g_loss"])) and np.isfinite(float(m["d_loss"]))
    assert not np.allclose(np.asarray(before_g),
                           np.asarray(jax.tree_util.tree_leaves(g_params)[0]))
    assert not np.allclose(np.asarray(before_d),
                           np.asarray(jax.tree_util.tree_leaves(d_params)[0]))


def test_continue_train_resumes_checkpoint(synth_root, tmp_path):
    """--continue_train must load netMR_latest params (reference
    train.py:127-137 semantics)."""
    import jax
    import numpy as np
    from rgbd_pifuhd_tpu.train.loop import train_fine
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt

    opt = make_opt(synth_root, str(tmp_path))
    p1 = train_fine(opt, max_steps=1)
    saved = ckpt.load_checkpoint(
        ckpt.latest_path(opt.checkpoints_path, opt.name))["params"]

    opt.continue_train = True
    # run zero steps: returned params must equal the checkpoint exactly
    p2 = train_fine(opt, max_steps=0)
    a = jax.tree_util.tree_leaves(saved)
    b = jax.tree_util.tree_leaves(p2)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_profiler_trace_writes(tmp_path):
    import jax.numpy as jnp
    from rgbd_pifuhd_tpu.utils.logging import profile_trace

    d = str(tmp_path / "trace")
    with profile_trace(d):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    assert os.path.isdir(d) and os.listdir(d)


def test_orbax_checkpoint_roundtrip(synth_root, tmp_path):
    import jax
    import numpy as np
    from rgbd_pifuhd_tpu.utils import checkpoint as ckpt
    from rgbd_pifuhd_tpu.train.loop import (build_multires,
                                            init_multires_params)
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset

    opt = make_opt(synth_root, str(tmp_path))
    ds = TrainDataset(opt)
    model = build_multires(opt)
    params = init_multires_params(opt, model, ds[0])

    path = os.path.join(str(tmp_path), "orbax_ck")
    ckpt.save_checkpoint_orbax(path, params, opt, epoch=7)
    state = ckpt.load_checkpoint_orbax(path, params)
    assert state["epoch"] == 7
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(state["params"])
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    restored, _ = ckpt.restore_options(opt, state)
    assert restored.num_sample_inout == opt.num_sample_inout
