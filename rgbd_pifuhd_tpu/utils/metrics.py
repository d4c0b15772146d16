"""Occupancy evaluation metrics.

Parity with the reference's latent (never-wired) helpers compute_acc /
calc_error (/root/reference/traindata/lib/net_util.py:130-210): IoU,
precision, recall of thresholded occupancy — here they are first-class and
jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_acc(pred: jax.Array, gt: jax.Array, thresh: float = 0.5):
    """-> (IoU, precision, recall) over thresholded occupancy.

    Shapes: any matching; thresholded elementwise.
    """
    p = pred > thresh
    g = gt > thresh
    inter = jnp.sum(p & g)
    union = jnp.sum(p | g)
    vol_p = jnp.sum(p)
    vol_g = jnp.sum(g)
    iou = inter / jnp.maximum(union, 1)
    prec = inter / jnp.maximum(vol_p, 1)
    rec = inter / jnp.maximum(vol_g, 1)
    return iou, prec, rec


def chamfer_l2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Symmetric Chamfer distance between point sets [N,3] / [M,3].

    Used for mesh-quality eval against ground-truth surfaces (the reference
    has no geometric eval; this closes that gap).  O(N*M) — use subsampled
    point sets.
    """
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))


def calc_error(model_apply, params, dataset, collate, num_tests: int,
               thresh: float = 0.5):
    """Dataset-level average (loss, IoU, precision, recall).

    Parity with the reference's calc_error (traindata/lib/net_util.py:
    156-183): forward the first ``num_tests`` items and average.
    ``model_apply(params, batch) -> (loss, preds, labels)``.
    """
    import numpy as np

    rows = []
    n = min(num_tests, len(dataset))
    for i in range(n):
        batch = collate([dataset[i]])
        loss, preds, labels = model_apply(params, batch)
        iou, prec, rec = compute_acc(preds, labels, thresh)
        rows.append([float(loss), float(iou), float(prec), float(rec)])
    return tuple(np.mean(rows, axis=0))
