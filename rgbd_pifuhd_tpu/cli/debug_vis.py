"""Calibration / sampling debug visualization.

Parity with the reference's scratch test.py:38-81: loads the first
TrainDataset item, orthographically projects its sampled points, and
scatter-plots them over the input image to eyeball calibration; can also
dump the samples as a colored PLY.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", default="./debug_vis.png")
    p.add_argument("--ply", default=None)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from ..data.datasets import TrainDataset
    from ..ops import geometry as G
    from ..utils.options import Options

    opt = Options(dataroot=args.dataroot, num_sample_inout=300, sigma=5.0)
    ds = TrainDataset(opt)
    item = ds[args.index]

    pts = jnp.asarray(item["samples"])[None]
    ndc = np.asarray(G.orthogonal(pts, jnp.asarray(item["calib"])[None]))[0]
    labels = item["labels"][:, 0]
    print(f"subject={item['name']} samples={len(labels)} "
          f"inside={labels.mean():.2f} "
          f"ndc range x[{ndc[:,0].min():.2f},{ndc[:,0].max():.2f}] "
          f"y[{ndc[:,1].min():.2f},{ndc[:,1].max():.2f}]")

    if args.ply:
        from ..recon.mesh import save_occupancy_samples_ply
        save_occupancy_samples_ply(args.ply, item["samples"], labels)
        print("wrote", args.ply)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        img = item["img_512"][..., :3] * 0.5 + 0.5
        h, w = img.shape[:2]
        px = (ndc[:, 0] + 1) * 0.5 * (w - 1)
        py = (ndc[:, 1] + 1) * 0.5 * (h - 1)
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.imshow(img)
        ax.scatter(px[labels > 0.5], py[labels > 0.5], s=2, c="r",
                   label="inside")
        ax.scatter(px[labels <= 0.5], py[labels <= 0.5], s=2, c="g",
                   label="outside")
        ax.legend()
        fig.savefig(args.out, dpi=110)
        print("wrote", args.out)
    except ImportError:
        print("matplotlib unavailable; skipped plot")


if __name__ == "__main__":
    main()
