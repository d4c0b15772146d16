"""Synthetic dataset generation CLI (offline data tooling, layer L7).

python -m rgbd_pifuhd_tpu.cli.gen_data --out ./traindata --size 512
"""

from __future__ import annotations

import argparse

from ..data.synthetic import generate_synthetic_dataset


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--load_size", type=int, default=1024)
    p.add_argument("--subjects", nargs="+", default=["sphere", "capsule"])
    p.add_argument("--obj_dir", default=None,
                   help="render real OBJ subjects instead of analytic ones")
    p.add_argument("--yaw_step", type=int, default=180,
                   help="4 reproduces the reference's full sweep")
    p.add_argument("--use_prt", action="store_true",
                   help="SH/PRT diffuse shading (slower)")
    p.add_argument("--backgrounds", default=None,
                   help="background image dir for gen/ composites")
    args = p.parse_args(argv)

    if args.obj_dir:
        from ..data.render_dataset import render_dataset
        from ..data.composite import composite_over_backgrounds

        views = render_dataset(args.out, args.obj_dir, args.size,
                               args.load_size, args.yaw_step, args.use_prt)
        composite_over_backgrounds(args.out, args.backgrounds)
        print(f"rendered {views} into {args.out}")
    else:
        generate_synthetic_dataset(args.out, tuple(args.subjects), args.size,
                                   args.load_size)
        print(f"wrote synthetic dataset to {args.out}")


if __name__ == "__main__":
    main()
