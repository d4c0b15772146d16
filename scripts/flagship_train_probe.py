"""Flagship-scale training-step probe on the real TPU chip.

Measures ONE make_fine_train_step at the flagship configuration
(4-stack/256-ch coarse encoder, full-res fine encoder, both normal nets)
for the two training image regimes:

- crop-512: the reference's actual fine-training input (512^2 crop windows,
  train.py:159-204 with use_crop; loadSizeLocal=512)
- full-1024: the uncropped 1024^2 local window (upper bound)

Reports compile time, steady-state step time, and device peak memory, with
and without hourglass rematerialization.  Results belong in
docs/PERFORMANCE.md.

Run: python scripts/flagship_train_probe.py [--local 512] [--remat]
"""

import argparse
import dataclasses
import time

import numpy as np


def probe(local_size: int, remat: bool, dtype: str = "bfloat16",
          n_points: int = 512, steps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _configs
    from rgbd_pifuhd_tpu.models import MultiResPIFu
    from rgbd_pifuhd_tpu.train.trainers import (
        make_fine_train_step, make_optimizer)

    cfg_g, cfg_l, _, _ = _configs(tiny=False)
    cfg_g = dataclasses.replace(cfg_g, remat=remat, compute_dtype=dtype)
    cfg_l = dataclasses.replace(cfg_l, remat=remat, compute_dtype=dtype)
    model = MultiResPIFu(cfg=cfg_l, cfg_global=cfg_g)

    rng = np.random.default_rng(0)
    f32 = np.float32
    eye = jnp.eye(4, dtype=jnp.float32)
    batch = {
        "images_local": jnp.asarray(rng.standard_normal(
            (1, 1, local_size, local_size, 6)).astype(f32)),
        "images_global": jnp.asarray(rng.standard_normal(
            (1, 512, 512, 6)).astype(f32)),
        "points": jnp.asarray(rng.uniform(
            -0.9, 0.9, (1, 1, n_points, 3)).astype(f32)),
        "calib_local": eye[None, None],
        "calib_global": eye[None],
        "labels": jnp.asarray((rng.uniform(
            0, 1, (1, 1, n_points, 1)) > 0.5).astype(f32)),
    }

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["images_local"],
        batch["images_global"], batch["points"], batch["calib_local"],
        batch["calib_global"], batch["labels"])
    n_params = sum(x.size for x in jax.tree.leaves(params))

    tx = make_optimizer("rmsprop", 1e-3)
    opt_state = tx.init(params["params"])
    step = jax.jit(make_fine_train_step(model, tx))

    # AOT-compile so XLA's own memory analysis is available: the axon
    # backend exposes no runtime memory_stats(), but the compiler's
    # buffer-assignment totals (args + temps + output) are exactly the
    # HBM the executable reserves — a PROOF of fit, not an observation.
    t0 = time.time()
    compiled = step.lower(params, opt_state, batch).compile()
    compile_s = time.time() - t0
    mem = {}
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            args_gb = ma.argument_size_in_bytes / 1e9
            temp_gb = ma.temp_size_in_bytes / 1e9
            out_gb = ma.output_size_in_bytes / 1e9
            alias_gb = getattr(ma, "alias_size_in_bytes", 0) / 1e9
            mem = {
                "hlo_args_GB": round(args_gb, 2),
                "hlo_temp_GB": round(temp_gb, 2),
                "hlo_output_GB": round(out_gb, 2),
                # donated/aliased buffers are counted in both args and
                # output; the reserve is args + temps + (out - aliased)
                "hlo_total_GB": round(
                    args_gb + temp_gb + max(out_gb - alias_gb, 0.0), 2),
            }
    except Exception as e:  # noqa: BLE001 — backend-dependent API
        mem = {"hlo_mem_error": str(e)[:120]}

    # NOTE: on the tunneled axon backend block_until_ready does NOT wait
    # for execution — only a data readback synchronizes.  Every timing
    # below forces a scalar readback (float()).
    t0 = time.time()
    params2, opt_state2, metrics = compiled(params, opt_state, batch)
    float(metrics["loss"])
    first_step_s = time.time() - t0

    times = []
    for _ in range(steps):
        t0 = time.time()
        params2, opt_state2, metrics = compiled(params2, opt_state2, batch)
        float(metrics["loss"])
        times.append(time.time() - t0)

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 1e9
    return {
        "local": local_size, "remat": remat, "dtype": dtype,
        "params_M": round(n_params / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "first_step_s": round(first_step_s, 3),
        "step_s": round(float(np.median(times)), 4),
        "peak_mem_GB": round(peak, 2),
        **mem,
        "loss": round(float(metrics["loss"]), 4),
        "device": str(jax.devices()[0]),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--local", type=int, default=512)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    print(probe(args.local, args.remat, args.dtype))
