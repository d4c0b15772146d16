"""Quantify the random-feature perceptual fallback (VERDICT round-1 item 7).

The reference's normal-net pretraining loss is 5*L1 + VGG16 perceptual
(content + style) with torchvision's PRETRAINED weights
(/root/reference/networks.py:386-449, pretrain_netG.py:159-197).  This
environment has no network egress and ships no VGG16 checkpoint, so
models/vgg.py falls back to a seeded random-feature perceptual loss.

This study measures what the fallback costs: train the normal generator
(netF role) on a synthetic dataset under
  (a) L1 only
  (b) 5*L1 + random-feature perceptual (the shipped fallback)
and report the final normal-map L1 against ground truth.  If (b) ~ (a),
the fallback is at least harmless; pretrained weights (load via
VGG16Features.load_torch_weights when a .pth exists) can only improve on
whichever is better.

When the committed framework-native backbone exists
(assets/perceptual/backbone.npz, models/perceptual.py) a third arm
  (c) 5*L1 + 0.3 * native-backbone perceptual (the shipped auto default)
is measured too.  Measured at 600 steps (the shipped defaults): l1_only
0.0117, native_backbone 0.0101 (-13.6%), random_vgg 0.1146 (+595%) — a
weight sweep showed 0.3 best (1.0: 0.0113, 0.1: 0.0109, 0.03: 0.0107);
at 300 steps the native arm has not yet converged and reads ~10% WORSE
than L1-only, so the default horizon matters.

Run: python scripts/vgg_gap_study.py [--steps 600]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(steps: int = 600, size: int = 64, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import dataclasses
    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    from rgbd_pifuhd_tpu.data.datasets import TrainDataset
    from rgbd_pifuhd_tpu.models.pix2pix import GlobalGenerator
    from rgbd_pifuhd_tpu.models.vgg import (
        VGG16Features, make_perceptual_loss)
    from rgbd_pifuhd_tpu.train.trainers import (
        make_normal_train_step, make_optimizer)
    from rgbd_pifuhd_tpu.utils.options import Options

    root = os.path.join(tempfile.gettempdir(), "vgg_gap_data")
    if not os.path.isdir(os.path.join(root, "gen")):
        generate_synthetic_dataset(root, subjects=("sphere", "capsule"),
                                   size=size, load_size=2 * size)
    opt = Options(dataroot=root, load_size=2 * size, load_size_big=size,
                  load_size_local=size, num_sample_inout=8, sigma=5.0)
    ds = TrainDataset(opt, load_mesh=False, seed=0)
    items = [ds[i] for i in range(len(ds))]

    def batch_of(i):
        it = items[i % len(items)]
        return {
            "images": jnp.asarray(it["img"][0])[None],
            "target": jnp.asarray(it["imF"])[None],
            "style": jnp.asarray(it["Fstyle"])[None],
        }

    from rgbd_pifuhd_tpu.models.perceptual import (
        CompactFeatures, find_backbone, load_backbone)

    arms = [("l1_only", None), ("random_vgg", "random")]
    bpath = find_backbone()
    if bpath:
        arms.append(("native_backbone", "native"))

    results = {}
    for label, perc_kind in arms:
        gen = GlobalGenerator(output_nc=3, ngf=16, n_downsampling=2,
                              n_blocks=2)
        params = gen.init(jax.random.PRNGKey(seed), batch_of(0)["images"])
        perceptual = None
        if perc_kind == "random":
            vgg_params = VGG16Features.init_params(seed)
            perceptual = make_perceptual_loss(vgg_params)
        elif perc_kind == "native":
            # trained compact backbone, content-dominant weighting (the
            # 1e5 style weight is VGG-Gram-scale specific; measured best
            # for the native features)
            perceptual = make_perceptual_loss(
                load_backbone(bpath), style_weight=1e2,
                feature_model=CompactFeatures(), weight=0.3)
        tx = make_optimizer("adam", 2e-4)
        opt_state = tx.init(params)
        step = jax.jit(make_normal_train_step(
            lambda p, x: gen.apply(p, x), tx, perceptual))
        for s in range(steps):
            params, opt_state, m = step(params, opt_state, batch_of(s))
        # final metric: plain normal-map L1 over all items (both losses
        # are judged on the SAME scale-independent metric)
        l1s = []
        for i in range(len(items)):
            b = batch_of(i)
            fake = gen.apply(params, b["images"])
            l1s.append(float(jnp.abs(fake - b["target"]).mean()))
        results[label] = round(float(np.mean(l1s)), 4)
        print(f"{label}: final normal-map L1 = {results[label]}")

    results["relative_gap_pct"] = round(
        100.0 * (results["random_vgg"] - results["l1_only"])
        / max(results["l1_only"], 1e-9), 1)
    if "native_backbone" in results:
        results["native_vs_l1_pct"] = round(
            100.0 * (results["native_backbone"] - results["l1_only"])
            / max(results["l1_only"], 1e-9), 1)
    print(results)
    return results


def run_seeds(steps: int, size: int, seeds) -> dict:
    """VERDICT r4 item 7: the native-backbone margin must reproduce
    across seeds, not ride one lucky initialization."""
    per_seed = {s: run(steps, size, s) for s in seeds}
    agg = {"per_seed": per_seed}
    for key in ("l1_only", "native_backbone", "random_vgg"):
        vals = [r[key] for r in per_seed.values() if key in r]
        if vals:
            agg[f"{key}_mean"] = round(float(np.mean(vals)), 4)
    if "native_backbone_mean" in agg:
        agg["native_wins_all_seeds"] = all(
            r.get("native_backbone", 1e9) < r["l1_only"]
            for r in per_seed.values())
    print(agg)
    return agg


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    args = ap.parse_args()
    if len(args.seeds) > 1:
        run_seeds(args.steps, args.size, args.seeds)
    else:
        run(args.steps, args.size, args.seeds[0])
