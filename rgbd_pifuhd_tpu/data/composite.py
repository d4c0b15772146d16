"""Background compositing for training images.

Parity with the reference's transback.py:25-110: composite each rendered
person (white/masked background) over random background photos, writing the
``gen/`` images the TrainDataset consumes.  Backgrounds come from any
directory of images (the reference uses COCO val2017).
"""

from __future__ import annotations

import os

import numpy as np


def composite_over_backgrounds(
    dataroot: str,
    background_dir: str | None = None,
    per_subject: int = 1,
    seed: int = 0,
) -> list[str]:
    """RENDER/<s>/0_0_00.jpg + MASK -> gen/<s>_<i>.png composites.

    With no background_dir, synthesizes smooth random backgrounds (the
    hermetic path used by tests and the synthetic generator).
    Returns the written file paths.
    """
    import cv2

    rng = np.random.default_rng(seed)
    render_dir = os.path.join(dataroot, "RENDER")
    mask_dir = os.path.join(dataroot, "MASK")
    gen_dir = os.path.join(dataroot, "gen")
    os.makedirs(gen_dir, exist_ok=True)

    bgs = []
    if background_dir and os.path.isdir(background_dir):
        bgs = [
            os.path.join(background_dir, f)
            for f in sorted(os.listdir(background_dir))
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        ]

    written = []
    for subject in sorted(os.listdir(render_dir)):
        rp = os.path.join(render_dir, subject, "0_0_00.jpg")
        mp = os.path.join(mask_dir, subject, "0_0_00.png")
        if not (os.path.exists(rp) and os.path.exists(mp)):
            continue
        render = cv2.imread(rp)
        mask = cv2.imread(mp, cv2.IMREAD_GRAYSCALE) > 127
        H, W = render.shape[:2]
        for i in range(per_subject):
            if bgs:
                bg = cv2.imread(bgs[int(rng.integers(len(bgs)))])
                bg = cv2.resize(bg, (W, H))
            else:
                bg = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                bg = cv2.GaussianBlur(bg, (31, 31), 0)
            comp = np.where(mask[:, :, None], render, bg)
            out = os.path.join(gen_dir, f"{subject}_{i}.png")
            cv2.imwrite(out, comp)
            written.append(out)
    return written
