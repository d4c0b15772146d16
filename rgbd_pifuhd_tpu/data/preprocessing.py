"""Image preprocessing shared by the training and inference readers.

Parity targets: addrect zero-pad cropping (/root/reference/readData.py:15-29,
TrainDataset.py:34-49) and the rect->NDC calibration transform
(readData.py:73-81, TrainDataset.py:229-236).

Images here are NumPy HWC uint8/float; conversion to the framework's
[-1, 1] float NHWC happens in ``normalize_image``.
"""

from __future__ import annotations

import numpy as np


def addrect(img: np.ndarray, rect) -> np.ndarray:
    """Crop ``rect=(x, y, w, h)`` out of ``img`` with zero padding.

    Out-of-frame regions are black, exactly like the reference's
    cv2.copyMakeBorder + slice implementation.
    """
    x, y, w, h = [int(v) for v in rect]
    H, W = img.shape[:2]
    out_shape = (h, w) + img.shape[2:]
    out = np.zeros(out_shape, dtype=img.dtype)

    src_x0, src_y0 = max(x, 0), max(y, 0)
    src_x1, src_y1 = min(x + w, W), min(y + h, H)
    if src_x1 > src_x0 and src_y1 > src_y0:
        dst_x0, dst_y0 = src_x0 - x, src_y0 - y
        out[dst_y0:dst_y0 + (src_y1 - src_y0),
            dst_x0:dst_x0 + (src_x1 - src_x0)] = (
            img[src_y0:src_y1, src_x0:src_x1]
        )
    return out


def rect_to_ndc_transform(rect, img_w: int, img_h: int,
                          flip_y: bool = False) -> np.ndarray:
    """4x4 NDC transform for a person-rect crop (readData.py:73-81).

    ``flip_y=False`` matches the inference reader (trans_mat[1,3] positive,
    readData.py:80); ``flip_y=True`` matches the train-crop variant
    (TrainDataset.py:235).
    """
    x, y, w, h = [int(v) for v in rect]
    trans = np.identity(4)
    scale_im2ndc = 1.0 / float(img_w // 2)
    scale = img_w / w
    trans *= scale
    trans[3, 3] = 1.0
    trans[0, 3] = -scale * (x + w // 2 - img_w // 2) * scale_im2ndc
    sy = -1.0 if flip_y else 1.0
    trans[1, 3] = sy * scale * (y + h // 2 - img_h // 2) * scale_im2ndc
    return trans


def normalize_image(img: np.ndarray) -> np.ndarray:
    """HWC uint8/float[0,255] -> float32 HWC in [-1, 1].

    Equivalent of ToTensor + Normalize(0.5, 0.5) (readData.py:45-48), kept
    in HWC (the framework is NHWC; no CHW transpose).
    """
    img = np.asarray(img, dtype=np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return img * 2.0 - 1.0


def resize_image(img: np.ndarray, size: int) -> np.ndarray:
    """Resize HWC to (size, size) with OpenCV bilinear (reader parity)."""
    import cv2

    return cv2.resize(img, (size, size))
