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
    args = p.parse_args(argv)
    generate_synthetic_dataset(args.out, tuple(args.subjects), args.size,
                               args.load_size)
    print(f"wrote synthetic dataset to {args.out}")


if __name__ == "__main__":
    main()
