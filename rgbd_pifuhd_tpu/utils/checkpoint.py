"""Checkpoint save/load.

Parity with the reference's torch.save dict checkpoints
(/root/reference/train.py:208-212, reconstruction.py:252-269): a checkpoint
bundles ``{'opt', 'opt_netG', 'params', 'epoch'}``; inference restores the
ENTIRE option namespace from the checkpoint, overriding CLI flags except
dataroot / resolution / results_path / load_size.

Format: one msgpack file (flax.serialization) — single-file like torch.save,
no directory trees.  Naming parity: ``<name>_train_latest`` and
``<name>_train_epoch_<N>`` (reference train.py:208-212 uses
``netMR_latest``/``netMR_epoch_N`` under checkpoints/<name>/; recon loads
``%s/%s_train_latest`` — we follow the recon reader's convention).
Optimizer state may be included (the reference never checkpoints it;
SURVEY.md section 5 notes this as a gap we close).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
from flax import serialization

from .options import Options


def save_checkpoint(
    path: str,
    params: Any,
    opt: Options,
    opt_netG: Options | None = None,
    epoch: int = 0,
    opt_state: Any = None,
) -> None:
    import json

    # msgpack cannot serialize tuples; JSON round-trip turns them into
    # lists (Options.from_dict converts back to tuples on restore)
    payload = {
        "params": params,
        "opt": json.loads(json.dumps(opt.to_dict())),
        "opt_netG": json.loads(json.dumps((opt_netG or opt).to_dict())),
        "epoch": epoch,
    }
    if opt_state is not None:
        payload["opt_state"] = opt_state
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.msgpack_serialize(_to_pure(payload))
    with open(path, "wb") as f:
        f.write(data)


def load_checkpoint(path: str) -> dict:
    from .torch_import import is_torch_checkpoint

    if is_torch_checkpoint(path):
        # a PyTorch reference checkpoint (train.py:211-212 /
        # pretrain_netG.py:227 format, or a raw state_dict save):
        # convert in place so --load_*_checkpoint_path accepts either
        from .torch_import import load_reference_checkpoint

        return load_reference_checkpoint(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload


def restore_options(cli_opt: Options, ckpt: dict) -> tuple[Options, Options]:
    """Checkpoint opts override CLI except the four kept fields."""
    if not ckpt.get("opt"):
        # raw torch state_dict saves (pretrain_netG.py:98 style) embed no
        # options: keep the CLI configuration as-is
        return cli_opt, cli_opt
    opt = cli_opt.restore_from_checkpoint_dict(ckpt["opt"])
    opt_netG = Options.from_dict(ckpt["opt_netG"])
    return opt, opt_netG


def _to_pure(tree):
    """Convert jax arrays to numpy for msgpack."""
    import jax

    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, tree
    )


def latest_path(checkpoints_path: str, name: str) -> str:
    return os.path.join(checkpoints_path, f"{name}_train_latest")


def epoch_path(checkpoints_path: str, name: str, epoch: int) -> str:
    return os.path.join(checkpoints_path, f"{name}_train_epoch_{epoch}")


# ------------------------------------------------------------- orbax backend
def save_checkpoint_orbax(path: str, params: Any, opt: Options,
                          opt_netG: Options | None = None,
                          epoch: int = 0) -> None:
    """Directory-based Orbax checkpoint (production alternative to the
    single-file msgpack format; async-capable, sharding-aware)."""
    import json
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), _to_pure(params))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({
            "opt": json.loads(json.dumps(opt.to_dict())),
            "opt_netG": json.loads(json.dumps((opt_netG or opt).to_dict())),
            "epoch": epoch,
        }, f)


def load_checkpoint_orbax(path: str, params_like: Any) -> dict:
    """Restore an Orbax checkpoint; ``params_like`` supplies the tree
    structure/shapes (e.g. a freshly-initialized variables pytree)."""
    import json
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"),
                               _to_pure(params_like))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return {"params": params, **meta}
