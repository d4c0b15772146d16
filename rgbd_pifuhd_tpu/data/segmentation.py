"""Person segmentation / foreground cropping.

The reference calls the Baidu AIP cloud ``bodySeg`` API
(/root/reference/crop_img.py:20-41) to cut the person out of an input
photo.  This environment (and most production deployments) cannot depend on
a third-party HTTP service, so this module provides:

- ``segment_person_grabcut`` — a local, dependency-free foreground
  segmentation using OpenCV GrabCut seeded by the person rect (the same
  rect file the inference reader already uses);
- ``crop_people`` — drop-in equivalent of the reference's function: returns
  the foreground composited on white (crop_img.py:39 sets non-person
  pixels to 255);
- ``ExternalSegmenter`` — the plug-point for a cloud/model segmenter with
  the same ``(image) -> mask`` contract, for deployments that have one.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def segment_person_grabcut(img: np.ndarray, rect=None,
                           iters: int = 3) -> np.ndarray:
    """Foreground mask [H, W] bool via GrabCut seeded by ``rect``.

    rect = (x, y, w, h); defaults to the central 80% of the frame.
    """
    import cv2

    H, W = img.shape[:2]
    if rect is None:
        rect = (int(W * 0.1), int(H * 0.05), int(W * 0.8), int(H * 0.9))
    mask = np.zeros((H, W), np.uint8)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    try:
        cv2.grabCut(np.ascontiguousarray(img[:, :, :3]), mask, tuple(rect),
                    bgd, fgd, iters, cv2.GC_INIT_WITH_RECT)
    except cv2.error:
        out = np.zeros((H, W), bool)
        x, y, w, h = rect
        out[y:y + h, x:x + w] = True
        return out
    return (mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)


def crop_people(img_path: str, rect=None,
                segmenter: Callable | None = None,
                background: int = 255) -> np.ndarray:
    """Foreground image on a flat background (crop_img.crop_people parity:
    crop_img.py:39 fills non-person pixels with 255/white; pass
    ``background=0`` for the black fill TrainDataset-style tooling uses)."""
    import cv2

    img = cv2.imread(img_path)
    seg = segmenter or segment_person_grabcut
    mask = seg(img, rect)
    out = img.copy()
    out[~mask] = background
    return out


class ExternalSegmenter:
    """Adapter for an external segmentation service/model.

    Mirrors the reference's AipBodyAnalysis usage shape: construct with a
    callable that maps an encoded image to a [H, W] float foreground score,
    call with an image path.  Kept as the integration seam; no network code
    lives in the framework.
    """

    def __init__(self, score_fn: Callable[[np.ndarray], np.ndarray],
                 threshold: float = 0.5):
        self.score_fn = score_fn
        self.threshold = threshold

    def __call__(self, img: np.ndarray, rect=None) -> np.ndarray:
        return self.score_fn(img) > self.threshold
