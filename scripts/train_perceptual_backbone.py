"""Train + commit the framework-native perceptual backbone.

Closes the pretrained-VGG16 gap (VERDICT round-3 task 5) without external
downloads: trains models/perceptual.CompactFeatures with a denoising
pretext on the framework's OWN synthetic renders + GT normal maps, and
writes the ~1 MB weights to assets/perceptual/backbone.npz where
pretrain_normals auto-discovers them (after real VGG16, before L1-only).

Measure the effect with scripts/vgg_gap_study.py (the 'native_backbone'
arm must beat 'l1_only' on the final normal-map L1 for the default to be
justified — the measured result lives in docs/PERFORMANCE.md).

Run on CPU (~2 min): python scripts/train_perceptual_backbone.py
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(root: str, crop: int = 64, n_crops: int = 96,
                 seed: int = 0) -> np.ndarray:
    """[N, crop, crop, 3] training crops in [-1, 1] from the synthetic
    tree's renders, composites and GT normal maps."""
    import cv2

    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset

    if not os.path.isdir(os.path.join(root, "RENDER", "bumpy")):
        generate_synthetic_dataset(
            root, subjects=("sphere", "capsule", "bumpy"), size=128,
            load_size=128, seed=seed)
    paths = []
    for sub in ("sphere", "capsule", "bumpy"):
        for d, names in (("RENDER", ("0_0_00.jpg", "180_0_00.jpg")),
                         ("NORM", ("0_0_00.png", "180_0_00.png"))):
            paths += [os.path.join(root, d, sub, n) for n in names]
    gen_dir = os.path.join(root, "gen")
    paths += [os.path.join(gen_dir, f) for f in sorted(os.listdir(gen_dir))]
    imgs = []
    for p in paths:
        im = cv2.imread(p)
        if im is not None:
            imgs.append(im[:, :, ::-1].astype(np.float32) / 127.5 - 1.0)
    rng = np.random.default_rng(seed)
    crops = []
    for k in range(n_crops):
        im = imgs[k % len(imgs)]
        y = int(rng.integers(0, im.shape[0] - crop + 1))
        x = int(rng.integers(0, im.shape[1] - crop + 1))
        crops.append(im[y:y + crop, x:x + crop])
    return np.stack(crops)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "perceptual", "backbone.npz"))
    ap.add_argument("--dataroot", default=os.path.join(
        tempfile.gettempdir(), "rgbd_backbone_data"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from rgbd_pifuhd_tpu.models.perceptual import (
        save_backbone, train_backbone)

    corpus = build_corpus(args.dataroot)
    print(f"corpus: {corpus.shape}")
    params, loss = train_backbone(corpus, steps=args.steps)
    save_backbone(args.out, params)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"saved {args.out} ({n / 1e3:.0f}k params, "
          f"final denoise mse {loss:.4f})")


if __name__ == "__main__":
    main()
