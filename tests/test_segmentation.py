"""Person segmentation (data/segmentation) — GrabCut quality + parity.

Reference: crop_img.py:20-41 calls the Baidu bodySeg cloud API; the local
GrabCut replacement must actually segment (not just echo the rect), and
crop_people must match the reference's white-background composite
(crop_img.py:39 fills non-person pixels with 255).

The full 27-case study lives in scripts/segmentation_iou_study.py
(measured mean IoU 0.992 / min 0.967 — recorded in docs/PARITY.md);
this test pins one fast case well above the rect-only baseline.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rgbd_pifuhd_tpu.data.segmentation import (  # noqa: E402
    ExternalSegmenter, crop_people, segment_person_grabcut)


def _scene(size=160, seed=0):
    """Disk subject over blurred-noise background + GT mask + loose rect."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((size, size), bool)
    yy, xx = np.mgrid[:size, :size]
    gt[(yy - size // 2) ** 2 + (xx - size // 2) ** 2 < (size // 4) ** 2] = True
    bg = cv2.GaussianBlur(
        rng.integers(0, 255, (size, size, 3), dtype=np.uint8), (31, 31), 0)
    fg = np.zeros_like(bg)
    fg[:, :] = (40, 180, 220)
    img = np.where(gt[:, :, None], fg, bg)
    r = size // 4
    rect = (size // 2 - r - 8, size // 2 - r - 8, 2 * r + 16, 2 * r + 16)
    return img, gt, rect


def _iou(a, b):
    return np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)


def test_grabcut_beats_rect_baseline():
    img, gt, rect = _scene()
    pred = segment_person_grabcut(img, rect)
    rect_mask = np.zeros_like(gt)
    rect_mask[rect[1]:rect[1] + rect[3], rect[0]:rect[0] + rect[2]] = True
    assert _iou(pred, gt) > 0.95
    assert _iou(pred, gt) > _iou(rect_mask, gt) + 0.2


def test_crop_people_white_background(tmp_path):
    img, gt, rect = _scene()
    p = str(tmp_path / "in.png")
    cv2.imwrite(p, img)
    out = crop_people(p, rect)
    # reference parity: non-person pixels are 255 (crop_img.py:39)
    border = out[:4, :4].reshape(-1, 3)
    assert (border == 255).all()
    # subject interior survives
    c = out[out.shape[0] // 2, out.shape[1] // 2]
    assert not (c == 255).all()


def test_external_segmenter_seam(tmp_path):
    img, gt, rect = _scene()
    p = str(tmp_path / "in.png")
    cv2.imwrite(p, img)
    seg = ExternalSegmenter(lambda im: gt.astype(np.float32))
    out = crop_people(p, rect, segmenter=seg, background=0)
    assert (out[~gt] == 0).all()
    assert _iou((out.sum(-1) > 0), gt) > 0.99
