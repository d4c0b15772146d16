"""Inference dataset reader.

Parity with the reference's readDataset (/root/reference/readData.py:32-128):
scans ``dataroot`` for images that have a sibling ``<name>_rect.txt`` and a
``depth/depth_<name>.png``, crops the person rect (zero-padded), builds the
NDC transform, resizes to 512 (global) and load_size (local), and returns a
data dict.  The RGB-D stack is pre-concatenated ([H, W, 6], NHWC) since the
framework's models take the joined stack (train.py:173-174 does the concat
in the reference driver).

calib = diag(1, -1, 1, 1) (y-flip, readData.py:90-92);
calib_world = rect NDC transform (readData.py:73-81).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from .preprocessing import (
    addrect,
    normalize_image,
    rect_to_ndc_transform,
    resize_image,
)

_IMG_EXT = (".jpg", ".jpeg", ".png")


class InferenceDataset:
    def __init__(self, dataroot: str, load_size: int = 1024,
                 projection: str = "orthogonal"):
        self.root = dataroot
        self.load_size = load_size
        self.projection_mode = projection
        files = sorted(os.listdir(dataroot)) if os.path.isdir(dataroot) else []
        self.items = []
        for f in files:
            stem, ext = os.path.splitext(f)
            if ext.lower() not in _IMG_EXT:
                continue
            rect = os.path.join(dataroot, f"{stem}_rect.txt")
            if os.path.exists(rect):
                self.items.append((os.path.join(dataroot, f), rect, stem))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, index: int) -> dict[str, Any]:
        import cv2

        img_path, rect_path, name = self.items[index]
        depth_path = os.path.join(self.root, "depth", f"depth_{name}.png")

        im = cv2.imread(img_path)[:, :, ::-1]          # BGR -> RGB
        depth = cv2.imread(depth_path)
        if depth is None:
            depth = np.zeros_like(im)
        else:
            depth = depth[:, :, ::-1]
        h, w = im.shape[:2]

        rects = np.loadtxt(rect_path, dtype=np.int64)
        if rects.ndim == 1:
            rects = rects[None]
        rect = rects[0]

        im = addrect(im, rect)
        depth = addrect(depth, rect)
        trans_mat = rect_to_ndc_transform(rect, w, h, flip_y=False)

        def stack(size):
            rgb = normalize_image(resize_image(np.ascontiguousarray(im), size))
            dep = normalize_image(
                resize_image(np.ascontiguousarray(depth), size))
            return np.concatenate([rgb, dep], axis=-1)  # [H, W, 6]

        img = stack(self.load_size)
        img_512 = stack(512)

        calib = np.identity(4, dtype=np.float32)
        calib[1, 1] = -1.0

        return {
            "name": name,
            "img": img[None],            # [B2=1, H, W, 6]
            "img_512": img_512[None],    # [1, 512, 512, 6]
            "calib": calib,
            "calib_world": trans_mat.astype(np.float32),
            "b_min": np.array([-1.0, -1.0, -1.0]),
            "b_max": np.array([1.0, 1.0, 1.0]),
        }
