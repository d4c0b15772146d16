"""Epoch-driven training drivers.

Parity map (SURVEY.md sections 2.2/3):
- ``train_fine``          = reference train.py:62-247 (netMR training)
- ``pretrain_coarse``     = pretrain_netG.train_netG (py:231-344)
- ``pretrain_normals``    = pretrain_netG.train_nml  (py:68-229)
- ``train_alternating``   = altertrain.py:11-38 curriculum
- ``evaluate_checkpoints``= eval.py:61-222

All steps are jitted once and reused; with a device mesh the batch is
sharded over 'data' (the data parallelism the reference never enabled).
Checkpoints keep the reference's latest/epoch-N naming and embed the full
option namespaces.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..data.datasets import TrainDataset, EvalDataset
from ..parallel.distributed import is_primary, shard_host_batch
from ..models.coarse import CoarsePIFu
from ..models.multires import MultiResPIFu
from ..models.pix2pix import GlobalGenerator
from ..models.vgg import VGG16Features, make_perceptual_loss
from ..utils import checkpoint as ckpt
from ..utils.logging import TrainLogger
from ..utils.options import Options
from .trainers import (
    make_coarse_train_step,
    make_fine_train_step,
    make_lr_schedule,
    make_normal_train_step,
    make_optimizer,
    shard_train_step,
)


# ------------------------------------------------------------------ collate
def collate_fine(items: list[dict]) -> dict:
    """Dataset items -> fine-training batch (B1 = len(items), B2 = 1)."""
    return {
        "images_local": jnp.stack([i["img"] for i in items]),
        "images_global": jnp.stack([i["img_512"] for i in items]),
        "points": jnp.stack([i["samples"][None] for i in items]),
        "calib_local": jnp.stack([i["calib_local"][None] for i in items]),
        "calib_global": jnp.stack([i["calib"] for i in items]),
        "labels": jnp.stack([i["labels"][None] for i in items]),
    }


def collate_coarse(items: list[dict]) -> dict:
    return {
        "images": jnp.stack([i["img_512"] for i in items]),
        "points": jnp.stack([i["samples"] for i in items]),
        "calibs": jnp.stack([i["calib"] for i in items]),
        "labels": jnp.stack([i["labels"] for i in items]),
    }


def make_collate_normals(target_key: str, style_key: str) -> Callable:
    """Batch for netF/netB pretraining (input image, GT map, style image)."""

    def collate(items: list[dict]) -> dict:
        return {
            "images": jnp.stack([i["img"][0] for i in items]),
            "target": jnp.stack([i[target_key] for i in items]),
            "style": jnp.stack([i[style_key] for i in items]),
        }

    return collate


def _batches(dataset, batch_size: int, collate: Callable, seed: int,
             shuffle: bool = True, num_threads: int = 2,
             drop_last: bool = True):
    """Shuffled, background-prefetched batches (DataLoader equivalent)."""
    from ..data.prefetch import prefetch_batches

    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    yield from prefetch_batches(dataset, batch_size, collate, order,
                                num_threads=num_threads,
                                drop_last=drop_last)


# -------------------------------------------------------------- fine train
def build_multires(opt: Options) -> MultiResPIFu:
    return MultiResPIFu(cfg=opt.netMR, cfg_global=opt.netG,
                        train_full_pifu=opt.train_full_pifu)


def init_multires_params(opt: Options, model: MultiResPIFu, item: dict):
    calib = jnp.asarray(item["calib"], jnp.float32)
    return model.init(
        jax.random.PRNGKey(opt.seed),
        jnp.asarray(item["img"])[None],
        jnp.asarray(item["img_512"])[None],
        jnp.asarray(item["samples"])[None, None],
        jnp.asarray(item["calib_local"], jnp.float32)[None, None],
        calib[None],
        jnp.asarray(item["labels"])[None, None],
    )


def train_fine(opt: Options, mesh=None, max_steps: int | None = None,
               use_crop: bool = False, params=None) -> Any:
    """netMR training driver (reference train.py parity)."""
    dataset = TrainDataset(opt, use_crop=use_crop, seed=opt.seed)
    if len(dataset) < opt.batch_size:
        raise RuntimeError(f"dataset too small: {len(dataset)}")
    model = build_multires(opt)

    if params is None:
        params = init_multires_params(opt, model, dataset[0])
        if opt.load_netG_checkpoint_path:
            g = ckpt.load_checkpoint(opt.load_netG_checkpoint_path)
            sub = g["params"]["params"]
            if g.get("torch_import"):
                # reference .pth import: widen 3-ch netF/netB stems etc.
                # against the freshly-initialized netG subtree
                from ..utils.torch_import import reconcile_input_channels
                sub = reconcile_input_channels(
                    sub, params["params"]["netG"])
            params["params"]["netG"] = sub
        if opt.continue_train:
            path = (
                ckpt.epoch_path(opt.checkpoints_path, opt.name,
                                opt.resume_epoch)
                if opt.resume_epoch >= 0
                else ckpt.latest_path(opt.checkpoints_path, opt.name)
            )
            if os.path.exists(path):
                params = ckpt.load_checkpoint(path)["params"]

    steps_per_epoch = max(len(dataset) // opt.batch_size, 1)
    sched = make_lr_schedule(opt.learning_rate, opt.schedule, opt.gamma,
                             steps_per_epoch)
    tx = make_optimizer(opt.optimizer, sched)
    opt_state = tx.init(params["params"])

    step_fn = make_fine_train_step(model, tx)
    step = (shard_train_step(step_fn, mesh) if mesh is not None
            else jax.jit(step_fn))

    logger = TrainLogger(f"{opt.name}_netMR")
    global_step = 0
    for epoch in range(opt.num_epoch):
        for batch in _batches(dataset, opt.batch_size, collate_fine,
                              opt.seed + epoch):
            if max_steps is not None and global_step >= max_steps:
                break
            if mesh is not None:  # multi-host: keep this process's slice
                batch = shard_host_batch(mesh, batch)
            with logger.timer.phase("net"):
                params, opt_state, metrics = step(params, opt_state, batch)
                loss = float(metrics["loss"])
            logger.record(loss)
            if global_step % opt.freq_show == 0 and is_primary():
                logger.log_iter(epoch, global_step, steps_per_epoch
                                * opt.num_epoch, loss,
                                float(sched(global_step)))
            global_step += 1
            if max_steps is not None and global_step >= max_steps:
                break
        if is_primary():
            logger.save_epoch_errors(epoch)
            ckpt.save_checkpoint(
                ckpt.latest_path(opt.checkpoints_path, opt.name), params,
                opt, opt_netG=opt, epoch=epoch)
            if epoch % opt.freq_save == 0:
                ckpt.save_checkpoint(
                    ckpt.epoch_path(opt.checkpoints_path, opt.name, epoch),
                    params, opt, opt_netG=opt, epoch=epoch)
        if max_steps is not None and global_step >= max_steps:
            break
    return params


# ----------------------------------------------------------- coarse pretrain
def pretrain_coarse(opt: Options, mesh=None, max_steps: int | None = None,
                    params=None) -> Any:
    dataset = TrainDataset(opt, seed=opt.seed)
    if len(dataset) < opt.batch_size:
        # drop_last batching would otherwise run ZERO steps and still
        # write an untrained checkpoint (same guard as train_fine)
        raise RuntimeError(
            f"dataset too small: {len(dataset)} items < batch_size "
            f"{opt.batch_size}")
    model = CoarsePIFu(opt.netG)
    item = dataset[0]
    if params is None:
        params = model.init(
            jax.random.PRNGKey(opt.seed),
            jnp.asarray(item["img_512"])[None],
            jnp.asarray(item["samples"])[None],
            jnp.asarray(item["calib"], jnp.float32)[None],
            jnp.asarray(item["labels"])[None],
        )
    steps_per_epoch = max(len(dataset) // opt.batch_size, 1)
    sched = make_lr_schedule(opt.learning_rate, opt.schedule, opt.gamma,
                             steps_per_epoch)
    tx = make_optimizer(opt.optimizer, sched)
    opt_state = tx.init(params["params"])
    step_fn = make_coarse_train_step(model, tx, gamma=opt.gamma
                                     if opt.gamma < 1 else 0.5)
    step = (shard_train_step(step_fn, mesh) if mesh is not None
            else jax.jit(step_fn))

    logger = TrainLogger(f"{opt.name}_netG")
    global_step = 0
    for epoch in range(opt.num_epoch):
        for batch in _batches(dataset, opt.batch_size, collate_coarse,
                              opt.seed + epoch):
            if max_steps is not None and global_step >= max_steps:
                break
            if mesh is not None:  # multi-host: keep this process's slice
                batch = shard_host_batch(mesh, batch)
            with logger.timer.phase("net"):
                params, opt_state, metrics = step(params, opt_state, batch)
                loss = float(metrics["loss"])
            logger.record(loss)
            if global_step % opt.freq_show == 0 and is_primary():
                logger.log_iter(epoch, global_step,
                                steps_per_epoch * opt.num_epoch, loss,
                                float(sched(global_step)))
            global_step += 1
            if max_steps is not None and global_step >= max_steps:
                break
        if is_primary():
            logger.save_epoch_errors(epoch)
            ckpt.save_checkpoint(
                ckpt.latest_path(opt.checkpoints_path, f"{opt.name}_netG"),
                params, opt, epoch=epoch)
        if max_steps is not None and global_step >= max_steps:
            break
    return params


# ----------------------------------------------------------- normal pretrain
def select_perceptual(use_vgg: bool | str = "auto", seed: int = 0):
    """Pick the normal-pretraining perceptual loss; returns (loss, label).

    "auto" follows the measured ranking (scripts/vgg_gap_study.py):
    real pretrained VGG16 weights if found locally, else plain L1
    (label "l1_only", loss None).  The framework-native backbone
    (assets/perceptual/backbone.npz) is EXPLICIT opt-in via
    ``use_vgg="native"``: round 4's single-seed +13.6% margin did NOT
    reproduce — the 3-seed study (--seeds 0 1 2, 600 steps) measured
    native vs L1-only at -4.8% / +6.1% / +20.3% (mean 0.0079 vs
    0.0074), i.e. parity-to-worse within seed noise, so L1 is the
    honest no-weights default.  The random-feature VGG fallback stays
    ~5-15x WORSE than L1-only (the 1e5-weighted style loss on random
    Gram matrices injects noise) and is never auto-selected.  True
    forces the VGG-shaped perceptual on (random features when no
    weights exist); False disables it.  The ordering is pinned by
    tests/test_perceptual_select.py.
    """
    if use_vgg == "auto":
        if VGG16Features.find_weights() is not None:
            return (make_perceptual_loss(
                VGG16Features.load_weights(rng_key=seed)), "vgg16")
        return None, "l1_only"
    if use_vgg == "native":
        from ..models.perceptual import (
            CompactFeatures, find_backbone, load_backbone)
        bpath = find_backbone()
        if bpath:
            return (make_perceptual_loss(
                load_backbone(bpath), style_weight=1e2,
                feature_model=CompactFeatures(), weight=0.3),
                "native_backbone")
        return None, "l1_only"
    if use_vgg:
        return (make_perceptual_loss(
            VGG16Features.load_weights(rng_key=seed)), "vgg16_forced")
    return None, "l1_only"


def pretrain_normals(opt: Options, coarse_params=None,
                     max_steps: int | None = None,
                     use_vgg: bool | str = "auto", mesh=None) -> Any:
    """Train netF and netB (pretrain_netG.train_nml parity).

    Returns coarse-model params with the trained netF/netB subtrees.
    ``use_vgg``: "auto" (default) picks the perceptual feature model by
    the measured ranking (scripts/vgg_gap_study.py): real pretrained
    VGG16 weights if found locally, else plain L1 (the native backbone's
    single-seed margin did not survive the 3-seed study — see
    select_perceptual).  "native" opts into the committed framework-
    native backbone (assets/perceptual/backbone.npz).  True forces
    real-VGG-shaped perceptual on (random features if no weights),
    False disables perceptual.
    """
    dataset = TrainDataset(opt, load_mesh=False, seed=opt.seed)
    if len(dataset) < opt.batch_size:
        raise RuntimeError(
            f"dataset too small: {len(dataset)} items < batch_size "
            f"{opt.batch_size}")
    gen = GlobalGenerator(output_nc=3, ngf=opt.netG.nml_ngf,
                          n_downsampling=opt.netG.nml_n_downsampling,
                          n_blocks=opt.netG.nml_n_blocks)
    item = dataset[0]
    images = jnp.asarray(item["img"][0])[None]  # [1, H, W, 6]

    perceptual, choice = select_perceptual(use_vgg, seed=opt.seed)
    print(f"[pretrain_normals] perceptual loss: {choice}")

    out_params = {"params": dict(coarse_params["params"])} if coarse_params \
        else None
    results = {}
    for net_name, target_key, style_key in (
        ("netF", "imF", "Fstyle"), ("netB", "imB", "Bstyle"),
    ):
        if out_params is not None and net_name in out_params["params"]:
            params = {"params": out_params["params"][net_name]}
        else:
            params = gen.init(jax.random.PRNGKey(opt.seed), images)
        tx = make_optimizer("adam", opt.learning_rate)
        opt_state = tx.init(params)
        step_fn = make_normal_train_step(
            lambda p, x: gen.apply(p, x), tx, perceptual)
        step = (shard_train_step(step_fn, mesh) if mesh is not None
                else jax.jit(step_fn))

        collate = make_collate_normals(target_key, style_key)
        montage_batch = collate([dataset[0]])  # fixed montage subject
        logger = TrainLogger(f"{opt.name}_{net_name}")
        global_step = 0
        for epoch in range(opt.num_epoch):
            # prefetched, batched loader (same as train_fine/pretrain_coarse)
            for batch in _batches(dataset, opt.batch_size, collate,
                                  opt.seed + epoch):
                if mesh is not None:  # multi-host: this process's slice
                    batch = shard_host_batch(mesh, batch)
                with logger.timer.phase("net"):
                    params, opt_state, m = step(params, opt_state, batch)
                logger.record(float(m["loss"]))
                global_step += 1
                if max_steps is not None and global_step >= max_steps:
                    break
            if is_primary():
                logger.save_epoch_errors(epoch)
                if epoch % opt.freq_save == 0:
                    _save_normal_montage(opt, gen, params, montage_batch,
                                         net_name, epoch)
            if max_steps is not None and global_step >= max_steps:
                break
        results[net_name] = params
        if out_params is not None:
            out_params["params"][net_name] = params["params"]

    if out_params is not None:
        if is_primary():
            ckpt.save_checkpoint(
                ckpt.latest_path(opt.checkpoints_path, f"{opt.name}_netG"),
                out_params, opt, epoch=0)
        return out_params
    return results


def _save_normal_montage(opt, gen, params, batch, net_name, epoch) -> None:
    """input | predicted | target side-by-side PNG each save epoch
    (reference pretrain_netG.py:212-224)."""
    try:
        import cv2
    except ImportError:
        return
    fake = gen.apply(params, batch["images"])
    panels = [np.asarray(batch["images"][0])[..., :3],
              np.asarray(fake[0]), np.asarray(batch["target"][0])]
    img = np.concatenate(panels, axis=1) * 0.5 + 0.5
    out_dir = os.path.join("./train_result", f"{opt.name}_{net_name}")
    os.makedirs(out_dir, exist_ok=True)
    cv2.imwrite(os.path.join(out_dir, f"sample_epoch_{epoch}.png"),
                (img[:, :, ::-1] * 255).clip(0, 255).astype(np.uint8))


# ------------------------------------------------------------- alternating
def train_alternating(opt: Options, cycles: int = 10,
                      nml_epochs: int = 5, coarse_epochs: int = 5,
                      fine_epochs: int = 10, max_steps=None) -> Any:
    """altertrain.py curriculum: {normals -> coarse -> fine(crops)} x cycles."""
    import dataclasses

    coarse_params = None
    fine_params = None
    for cycle in range(cycles):
        o = dataclasses.replace(opt, num_epoch=nml_epochs)
        coarse_params = coarse_params or pretrain_coarse(
            dataclasses.replace(opt, num_epoch=0), max_steps=0)
        coarse_params = pretrain_normals(o, coarse_params,
                                         max_steps=max_steps)
        o = dataclasses.replace(opt, num_epoch=coarse_epochs)
        coarse_params = pretrain_coarse(o, params=coarse_params,
                                        max_steps=max_steps)
        o = dataclasses.replace(opt, num_epoch=fine_epochs)
        model = build_multires(o)
        ds = TrainDataset(o, seed=o.seed)
        if fine_params is None:
            fine_params = init_multires_params(o, model, ds[0])
        fine_params["params"]["netG"] = coarse_params["params"]
        fine_params = train_fine(o, use_crop=True, params=fine_params,
                                 max_steps=max_steps)
    return fine_params


# ------------------------------------------------------------------ eval
def evaluate_checkpoints(opt: Options, max_items: int | None = None,
                         mesh=None) -> dict:
    """eval.py parity: forward-only loss over saved epoch checkpoints.

    Batches are background-prefetched (the same ``_batches`` loader the
    trainers use) and, given a device mesh, sharded on the subject axis
    over 'data' — the eval driver scales like the train step.  EVERY item
    is evaluated exactly once (reference eval.py:157-206): the final
    partial batch is yielded shrunk (one extra jit compile) and the
    per-epoch metric is the item-weighted mean.  A dataset smaller than
    the device count falls back to unsharded evaluation rather than
    silently yielding zero batches.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    dataset = EvalDataset(opt)
    model = build_multires(opt)
    results = {}

    def fwd_fn(p, b):
        err, _ = model.apply(
            p, b["images_local"], b["images_global"], b["points"],
            b["calib_local"], b["calib_global"], b["labels"], train=False)
        return err["occ_fine"]

    n = min(len(dataset), max_items or len(dataset))
    if mesh is not None and n >= mesh.devices.size:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        fwd = jax.jit(fwd_fn, in_shardings=(repl, data),
                      out_shardings=repl)
        batch_size = max(opt.batch_size, mesh.devices.size)
        batch_size -= batch_size % mesh.devices.size
        # the sharded step needs a device-divisible batch: the remainder
        # (< devices after the clamp below) runs through an unsharded jit
        fwd_tail = jax.jit(fwd_fn)
    else:
        fwd = fwd_tail = jax.jit(fwd_fn)
        batch_size = max(min(opt.batch_size, n), 1)

    divisor = mesh.devices.size if (mesh is not None
                                    and fwd is not fwd_tail) else 1
    epoch = 0
    while True:
        path = ckpt.epoch_path(opt.checkpoints_path, opt.name, epoch)
        if not os.path.exists(path):
            break
        params = ckpt.load_checkpoint(path)["params"]
        errs, weights = [], []
        count = 0
        for batch in _batches(dataset, batch_size, collate_fine,
                              seed=0, shuffle=False, drop_last=False):
            if count >= n:
                break
            bsz = int(batch["labels"].shape[0])
            bsz = min(bsz, n - count)
            if bsz < batch["labels"].shape[0]:  # max_items mid-batch clamp
                batch = {k: v[:bsz] for k, v in batch.items()}
            use_sharded = bsz % divisor == 0 and fwd is not fwd_tail
            if use_sharded:  # multi-host: keep this process's slice
                batch = shard_host_batch(mesh, batch)
            use = fwd if use_sharded or fwd is fwd_tail else fwd_tail
            errs.append(float(use(params, batch)))
            weights.append(bsz)
            count += bsz
        if not errs:
            raise RuntimeError(f"eval dataset is empty ({opt.dataroot})")
        results[epoch] = float(np.average(errs, weights=weights))
        if is_primary():
            np.save(os.path.join(opt.checkpoints_path,
                                 f"{opt.name}_eval_epoch_{epoch}.npy"),
                    np.asarray(errs))
        epoch += opt.freq_save
    return results
