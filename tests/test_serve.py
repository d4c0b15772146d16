"""The resident serving entry point: load once, reconstruct per stdin
request, JSON line per mesh, errors never kill the process."""

import json
import os
import subprocess
import sys

import numpy as np


def _make_inference_dir(tmp_path, root, stems=("subject",)):
    import cv2

    img_dir = str(tmp_path / "imgs")
    os.makedirs(os.path.join(img_dir, "depth"))
    render = cv2.imread(os.path.join(root, "RENDER", "sphere", "0_0_00.jpg"))
    depth = cv2.imread(os.path.join(root, "DEPTH", "sphere", "0_0_00.png"))
    h, w = render.shape[:2]
    for stem in stems:
        cv2.imwrite(os.path.join(img_dir, f"{stem}.png"), render)
        cv2.imwrite(os.path.join(img_dir, "depth", f"depth_{stem}.png"),
                    depth)
        np.savetxt(os.path.join(img_dir, f"{stem}_rect.txt"),
                   np.array([[0, 0, w, h]]), fmt="%d")
    return img_dir


def test_serve_loop_requests_and_errors(tmp_path):
    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    from rgbd_pifuhd_tpu.train.loop import train_fine
    from rgbd_pifuhd_tpu.utils.options import Options
    from tests.test_models_pifu import tiny_global, tiny_local

    root = str(tmp_path / "traindata")
    generate_synthetic_dataset(root, subjects=("sphere",), size=64,
                               load_size=64)
    opt = Options(
        dataroot=root, load_size=64, load_size_big=64, load_size_local=64,
        num_sample_inout=32, sigma=5.0, batch_size=1, num_epoch=1,
        netG=tiny_global(), netMR=tiny_local(),
        checkpoints_path=str(tmp_path / "ckpt"), name="srv", freq_save=1,
        resolution=32,
    )
    train_fine(opt, max_steps=1)
    ckpt_path = str(tmp_path / "ckpt" / "srv_train_latest")
    img_dir = _make_inference_dir(tmp_path, root, stems=("subject", "zwei"))

    # drive the whole CLI in a subprocess over the stdin/stdout protocol
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from rgbd_pifuhd_tpu.cli.serve import main\n"
        f"main(['--load_netMR_checkpoint_path', {ckpt_path!r},\n"
        f"      '--results_path', {str(tmp_path / 'results')!r},\n"
        "      '--resolution', '32', '--loadSize', '64',\n"
        "      '--name', 'srv'])\n")
    requests = (
        f"{tmp_path}/nonexistent\n"        # error: keeps serving
        f"{img_dir}::wrongstem\n"          # error: keeps serving
        f"{img_dir}::subject\n"            # ok: single subject
        f"{img_dir}\n"                     # ok: whole dir -> two-slot
        "quit\n")                          #     pipelined multi-subject
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        ["/root/repo", os.environ.get("PYTHONPATH", "")]))
    res = subprocess.run([sys.executable, "-c", code], input=requests,
                         capture_output=True, text=True, timeout=900,
                         env=env, cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]

    lines = [json.loads(ln) for ln in res.stdout.splitlines()
             if ln.startswith("{")]
    assert lines[0]["ready"] is True
    errs = [m for m in lines if "error" in m]
    oks = [m for m in lines if "mesh" in m]
    assert len(errs) == 2 and len(oks) == 3
    assert "nonexistent" in errs[0]["request"]
    assert oks[0]["name"] == "subject"          # per-stem request
    assert {m["name"] for m in oks[1:]} == {"subject", "zwei"}  # whole dir
    for m in oks:
        assert m["verts"] > 0 and os.path.exists(m["mesh"])
        assert m["mesh"].endswith(f"result_{m['name']}_32.obj")
