"""Optimizers and jitted train steps.

Parity targets:
- fine training: RMSprop(lr=1e-3) on the full netMR tree with frozen netG
  (zero grads through stop_gradient), loss = Err(occ:fine)
  (/root/reference/train.py:141,188-191; PIFuMRNet loss semantics with the
  preds_interm fix, SURVEY.md 2.5.5)
- coarse pretrain: RMSprop on CoarsePIFu with CustomBCE(gamma)
  (pretrain_netG.py:282,315-319)
- normal pretrain: Adam(0.5, 0.999) separately on netF and netB with
  loss = 5*L1 + perceptual (VGG content + style) (pretrain_netG.py:122-123,
  159-197); the perceptual term is pluggable (models/vgg.py provides it).
- step LR decay at schedule epochs by gamma (train.py adjust_learning_rate).

Data parallelism: ``shard_train_step`` jits a step with params replicated
and the batch sharded on its leading axis over the mesh's 'data' axis; XLA
inserts the gradient psum over ICI automatically.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.coarse import CoarsePIFu
from ..models.multires import MultiResPIFu
from ..ops.losses import l1


def make_lr_schedule(base_lr: float, schedule_epochs: Sequence[int],
                     gamma: float, steps_per_epoch: int):
    """Piecewise-constant step decay (reference adjust_learning_rate)."""
    boundaries = {
        int(e) * steps_per_epoch: gamma for e in schedule_epochs
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(kind: str, lr, **kwargs) -> optax.GradientTransformation:
    if kind == "rmsprop":
        # torch.optim.RMSprop defaults: alpha=0.99, eps=1e-8 (train.py:141)
        return optax.rmsprop(lr, decay=0.99, eps=1e-8, **kwargs)
    if kind == "adam":
        # pretrain_netG.py:122 uses Adam(betas=(0.5, 0.999))
        return optax.adam(lr, b1=kwargs.pop("b1", 0.5),
                          b2=kwargs.pop("b2", 0.999), **kwargs)
    raise ValueError(f"unknown optimizer {kind!r}")


def _split_vars(variables):
    """-> (params subtree, other collections, has_batch_stats)."""
    extra = {k: v for k, v in variables.items() if k != "params"}
    return variables["params"], extra, "batch_stats" in extra


def make_fine_train_step(model: MultiResPIFu,
                         tx: optax.GradientTransformation) -> Callable:
    """One fine-training step; loss = mean over fine intermediate preds.

    Handles both stateless norms (group) and BatchNorm (mutable
    'batch_stats' collection, the reference's norm='batch' default).
    Gradients/optimizer apply to the 'params' collection only.
    """

    def step(variables, opt_state, batch):
        params, extra, has_bs = _split_vars(variables)

        def loss_fn(p):
            v = {"params": p, **extra}
            if has_bs:
                (err, out), mut = model.apply(
                    v, batch["images_local"], batch["images_global"],
                    batch["points"], batch["calib_local"],
                    batch["calib_global"], batch["labels"], train=True,
                    mutable=["batch_stats"],
                )
            else:
                err, out = model.apply(
                    v, batch["images_local"], batch["images_global"],
                    batch["points"], batch["calib_local"],
                    batch["calib_global"], batch["labels"], train=True,
                )
                mut = {}
            total = err["occ_fine"]
            if "occ" in err:
                total = total + err["occ"]
            return total, (err, mut)

        (loss, (err, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        variables = {"params": params, **extra, **mut}
        metrics = {"loss": loss, **{k: v for k, v in err.items()}}
        return variables, opt_state, metrics

    return step


def make_coarse_train_step(model: CoarsePIFu,
                           tx: optax.GradientTransformation,
                           gamma: float = 0.5) -> Callable:
    """One coarse-pretraining step (CustomBCE over hourglass stacks)."""

    def step(variables, opt_state, batch):
        params, extra, has_bs = _split_vars(variables)

        def loss_fn(p):
            v = {"params": p, **extra}
            if has_bs:
                (err, _), mut = model.apply(
                    v, batch["images"], batch["points"], batch["calibs"],
                    batch["labels"], gamma, train=True,
                    mutable=["batch_stats"],
                )
                return err, mut
            err, _ = model.apply(
                v, batch["images"], batch["points"], batch["calibs"],
                batch["labels"], gamma, train=True,
            )
            return err, {}

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, **extra, **mut}, opt_state, {"loss": loss}

    return step


def make_normal_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    perceptual_fn: Callable | None = None,
    l1_weight: float = 5.0,
) -> Callable:
    """One normal-net (netF or netB) pretraining step.

    loss = l1_weight * L1(fake, target) + perceptual(target, fake, style)
    (reference pretrain_netG.py:159-197).  ``apply_fn(params, images) ->
    predicted normal map``; ``perceptual_fn(x, y, style) -> scalar`` is the
    VGG content+style loss (or None for L1-only).
    """

    def step(params, opt_state, batch):
        def loss_fn(p):
            fake = apply_fn(p, batch["images"])
            loss = l1_weight * l1(fake, batch["target"])
            if perceptual_fn is not None:
                loss = loss + perceptual_fn(batch["target"], fake,
                                            batch["style"])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return step


def shard_train_step(step_fn: Callable, mesh: Mesh,
                     axis: str = "data") -> Callable:
    """Jit a train step with batch sharded over the mesh's data axis.

    params/opt_state replicated; every array in ``batch`` sharded on its
    leading (B1) axis.  XLA turns the mean-loss gradient into a psum over
    ICI — the framework's data parallelism.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, data),
        out_shardings=(repl, repl, repl),
    )


def make_gan_normal_train_step(
    gen_apply: Callable,
    disc_apply: Callable,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    perceptual_fn: Callable | None = None,
    l1_weight: float = 5.0,
    gan_weight: float = 1.0,
) -> Callable:
    """Adversarial normal-map training (beyond-reference option).

    The reference defines GANLoss and the multiscale discriminators
    (networks.py:61-72,342-384) but never wires them into a driver; this
    step makes them usable: the generator minimizes
    ``l1_weight*L1 + perceptual + gan_weight*lsgan(D(input, fake), real=1)``
    and the discriminator the standard lsgan real/fake objective on
    (input, map) pairs.

    ``disc_apply(params, images, maps) -> list[list[feat]]`` (multiscale).
    """
    from ..ops.losses import multiscale_gan_loss

    def step(g_params, d_params, g_state, d_state, batch):
        def g_loss_fn(gp):
            fake = gen_apply(gp, batch["images"])
            loss = l1_weight * l1(fake, batch["target"])
            if perceptual_fn is not None:
                loss = loss + perceptual_fn(batch["target"], fake,
                                            batch["style"])
            d_out = disc_apply(d_params, batch["images"], fake)
            loss = loss + gan_weight * multiscale_gan_loss(d_out, True)
            return loss, fake

        (g_loss, fake), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params)
        g_updates, g_state = tx_g.update(g_grads, g_state, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        def d_loss_fn(dp):
            real_out = disc_apply(dp, batch["images"], batch["target"])
            fake_out = disc_apply(dp, batch["images"],
                                  jax.lax.stop_gradient(fake))
            return 0.5 * (multiscale_gan_loss(real_out, True)
                          + multiscale_gan_loss(fake_out, False))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
        d_updates, d_state = tx_d.update(d_grads, d_state, d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        return g_params, d_params, g_state, d_state, {
            "g_loss": g_loss, "d_loss": d_loss}

    return step
