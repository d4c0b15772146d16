"""The flagship production flow, end to end on tiny configs:

synthetic data -> fine training -> checkpoint -> inference images with
rect/depth files -> run_recon CLI (checkpoint restore-opt semantics) ->
colored OBJ on disk.

This is the reference's run_train.py + run_recon.py user journey
(SURVEY.md section 3.1/3.2) executed hermetically.
"""

import os

import numpy as np
import pytest


def test_train_checkpoint_recon_cli(tmp_path):
    import cv2
    import dataclasses
    import jax

    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    from rgbd_pifuhd_tpu.train.loop import train_fine
    from rgbd_pifuhd_tpu.utils.options import Options
    from rgbd_pifuhd_tpu.cli.run_recon import main as recon_main
    from rgbd_pifuhd_tpu.recon.mesh import load_obj
    from tests.test_models_pifu import tiny_global, tiny_local

    root = str(tmp_path / "traindata")
    generate_synthetic_dataset(root, subjects=("sphere",), size=64,
                               load_size=64)

    # --- train one step and checkpoint (reference train.py flow)
    opt = Options(
        dataroot=root, load_size=64, load_size_big=64, load_size_local=64,
        num_sample_inout=32, sigma=5.0, batch_size=1, num_epoch=1,
        netG=tiny_global(), netMR=tiny_local(),
        checkpoints_path=str(tmp_path / "ckpt"), name="prod", freq_save=1,
        resolution=32,
    )
    train_fine(opt, max_steps=1)
    ckpt_path = str(tmp_path / "ckpt" / "prod_train_latest")
    assert os.path.exists(ckpt_path)

    # --- build an inference dir: image + rect + depth (readData layout)
    img_dir = str(tmp_path / "test_images")
    os.makedirs(os.path.join(img_dir, "depth"))
    render = cv2.imread(os.path.join(root, "RENDER", "sphere", "0_0_00.jpg"))
    depth = cv2.imread(os.path.join(root, "DEPTH", "sphere", "0_0_00.png"))
    cv2.imwrite(os.path.join(img_dir, "subject.png"), render)
    cv2.imwrite(os.path.join(img_dir, "depth", "depth_subject.png"), depth)
    h, w = render.shape[:2]
    np.savetxt(os.path.join(img_dir, "subject_rect.txt"),
               np.array([[0, 0, w, h]]), fmt="%d")

    # --- reconstruct via the CLI with checkpoint restore-opt semantics
    results = str(tmp_path / "results")
    recon_main([
        "--dataroot", img_dir,
        "--load_netMR_checkpoint_path", ckpt_path,
        "--results_path", results,
        "--resolution", "32",
        "--loadSize", "64",
        "--name", "prod",
        "--use_color", "1",
    ])

    out_obj = os.path.join(results, "prod", "recon", "result_subject_32.obj")
    assert os.path.exists(out_obj)
    v, f, c = load_obj(out_obj)
    assert len(v) > 0 and len(f) > 0 and c is not None
    # image colors are sampled from [-1,1] data then mapped to [0,1]
    assert 0.0 <= c.min() and c.max() <= 1.0
