"""Smoke tests for the diagnostic CLI tools."""

import os

import numpy as np
import pytest


def test_plot_error_cli(tmp_path, capsys):
    from rgbd_pifuhd_tpu.cli.plot_error import main
    from rgbd_pifuhd_tpu.utils.logging import TrainLogger

    logger = TrainLogger("demo_netG", out_dir=str(tmp_path))
    for v in np.linspace(0.5, 0.1, 20):
        logger.record(float(v))
    logger.save_epoch_errors(0)

    main(["--out_dir", str(tmp_path), "--name", "demo",
          "--save", os.path.join(tmp_path, "loss.png")])
    out = capsys.readouterr().out
    assert "netG" in out and "20 iters" in out


def test_debug_vis_cli(tmp_path, capsys):
    from rgbd_pifuhd_tpu.data.synthetic import generate_synthetic_dataset
    from rgbd_pifuhd_tpu.cli.debug_vis import main

    root = os.path.join(tmp_path, "td")
    generate_synthetic_dataset(root, subjects=("sphere",), size=64,
                               load_size=64)
    ply = os.path.join(tmp_path, "s.ply")
    main(["--dataroot", root, "--ply", ply,
          "--out", os.path.join(tmp_path, "vis.png")])
    out = capsys.readouterr().out
    assert "subject=sphere" in out
    assert os.path.exists(ply)


def test_print_options(capsys):
    from rgbd_pifuhd_tpu.utils.options import Options, print_options

    opt = Options(resolution=128)
    print_options(opt)
    out = capsys.readouterr().out
    assert "resolution" in out and "[default: 512]" in out


def test_persistent_cache_enable(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at an on-disk dir, is idempotent,
    and honors the off switch (best-effort: never raises)."""
    import jax
    import rgbd_pifuhd_tpu.utils.jax_cache as jc

    monkeypatch.setattr(jc, "_ENABLED", False)
    monkeypatch.setenv("RGBD_PIFUHD_JAX_CACHE", "off")
    assert jc.enable_persistent_cache() is None

    monkeypatch.delenv("RGBD_PIFUHD_JAX_CACHE")
    target = str(tmp_path / "jaxcache")
    got = jc.enable_persistent_cache(target)
    assert got == target and os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    # idempotent: second call returns the already-enabled dir
    assert jc.enable_persistent_cache(str(tmp_path / "other")) == target


def test_bench_watchdog_shim(monkeypatch):
    """bench._run_watchdog is a thin consumer of utils/watchdog: cmd=None
    means "supervise this bench" and implies probe=True (the real bench
    child talks to the tunnel); an explicit cmd defaults to probe=False.
    The machinery itself is pinned by tests/test_watchdog.py."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        import bench
    finally:
        sys.path.remove("/root/repo")
    from rgbd_pifuhd_tpu.utils import watchdog

    calls = []
    monkeypatch.setattr(
        watchdog, "run_watchdog",
        lambda cmd, retry_sleep=30.0, probe=False:
            calls.append((cmd, probe)))
    bench._run_watchdog()
    bench._run_watchdog(cmd=["echo", "hi"])
    bench._run_watchdog(cmd=["echo", "hi"], probe=True)
    assert calls[0][0][-1].endswith("bench.py") and calls[0][1] is True
    assert calls[1] == (["echo", "hi"], False)
    assert calls[2] == (["echo", "hi"], True)


def test_bench_imports_cleanly():
    """Fast-lane smoke: bench.py must import (parse + module level) in a
    clean subprocess — a syntax-level regression in the bench can never
    again only be caught at driver time."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import bench; assert callable(bench._run_watchdog); "
         "assert callable(bench.main)"],
        cwd="/root/repo", capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr


def test_run_recon_demo_trained(tmp_path):
    """--demo-trained: hermetic checkpoint-restore + recon from the
    committed trained-tiny model; the mesh must be a real closed surface
    (capsule), not an untrained-field noise shell."""
    from rgbd_pifuhd_tpu.cli.run_recon import main
    from rgbd_pifuhd_tpu.recon.mesh import load_obj

    main(["--demo-trained", "--resolution", "64",
          "--results_path", str(tmp_path)])
    out = os.path.join(tmp_path, "pifuhd", "recon", "result_capsule_64.obj")
    verts, faces, _ = load_obj(out)
    assert len(verts) > 1000 and len(faces) > 1000
    # capsule: tall in y, tube-like in xz (radius spread well under radius)
    ext = verts.max(0) - verts.min(0)
    assert ext[1] > 1.5 * ext[0] and ext[1] > 1.5 * ext[2]
