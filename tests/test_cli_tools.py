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


def test_bench_watchdog(tmp_path, monkeypatch, capsys):
    """The bench watchdog must kill a hung child at the deadline, retry
    once, and pass the child's exit status through.  Exercised with a
    stub child: first run hangs (slept past the deadline), second run
    writes a marker and exits 0."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        import bench
    finally:
        sys.path.remove("/root/repo")

    marker = tmp_path / "ran_twice"
    stub = tmp_path / "child.py"
    stub.write_text(
        "import os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    sys.exit(0)\n"
        "open(m, 'w').close()\n"
        "time.sleep(60)\n")
    # generous deadline: on a loaded single-core sandbox the child python
    # can take >10 s just to start (observed when a TPU training run and
    # a CPU experiment shared the core); it must have written the marker
    # (its first statement) before the kill or the retry re-hangs
    monkeypatch.setenv("BENCH_DEADLINE_S", "20")

    with pytest.raises(SystemExit) as ei:
        bench._run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert ei.value.code == 0
    assert "backend hang" in capsys.readouterr().err

    # every attempt hanging -> red exit with a message
    marker2 = tmp_path / "never"
    stub.write_text("import time\ntime.sleep(60)\n")
    with pytest.raises(SystemExit) as ei:
        bench._run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert "all attempts" in str(ei.value.code)


def test_watchdog_progress_aware(tmp_path, monkeypatch, capsys):
    """The silence-based kill rule: a child that keeps PRINTING stays
    alive past the silence window (a healthy slow run must never be
    killed — the 2026-08-19 flap showed established connections keep
    working while new processes block), and its stdout is piped through
    to the parent (the driver reads the JSON line there).  A child that
    goes quiet dies at the silence deadline, not the total deadline."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        import bench
    finally:
        sys.path.remove("/root/repo")

    # chatty child: prints every 1 s for 6 s, then the "JSON" line
    stub = tmp_path / "chatty.py"
    stub.write_text(
        "import time\n"
        "for i in range(6):\n"
        "    print(f'heartbeat {i}', flush=True)\n"
        "    time.sleep(1)\n"
        "print('{\"metric\": \"ok\"}', flush=True)\n")
    monkeypatch.setenv("BENCH_DEADLINE_S", "60")
    monkeypatch.setenv("BENCH_SILENCE_S", "4")
    with pytest.raises(SystemExit) as ei:
        bench._run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert ei.value.code == 0
    out = capsys.readouterr().out
    assert '{"metric": "ok"}' in out and "heartbeat 5" in out

    # quiet child: one line then silence — killed by the SILENCE rule
    # (4 s) long before the 60 s total deadline, on every attempt
    stub.write_text("print('starting', flush=True)\n"
                    "import time\ntime.sleep(60)\n")
    t0 = __import__("time").time()
    with pytest.raises(SystemExit) as ei:
        bench._run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert "all attempts" in str(ei.value.code)
    assert __import__("time").time() - t0 < 55  # 3 x ~5 s, not 3 x 60 s
    assert "silent for 4s" in capsys.readouterr().err


def test_watchdog_deadline_yields_to_progress(tmp_path, monkeypatch, capsys):
    """A child emitting fresh heartbeats OUTLIVES the total deadline (the
    2026-08-20 crawl stretched a healthy run past 2400 s and the fixed
    deadline killed it seconds before its final JSON); only the hard cap
    (BENCH_HARD_CAP_S, default 3x deadline) bounds a progressing run."""
    import sys
    import time as _time
    sys.path.insert(0, "/root/repo")
    try:
        import bench
    finally:
        sys.path.remove("/root/repo")

    # prints every 0.5 s forever: past deadline (3 s) but never stale
    stub = tmp_path / "slowpoke.py"
    stub.write_text(
        "import time\n"
        "for i in range(120):\n"
        "    print(f'beat {i}', flush=True)\n"
        "    time.sleep(0.5)\n")
    monkeypatch.setenv("BENCH_DEADLINE_S", "3")
    monkeypatch.setenv("BENCH_SILENCE_S", "60")
    monkeypatch.setenv("BENCH_HARD_CAP_S", "8")
    t0 = _time.time()
    with pytest.raises(SystemExit) as ei:
        bench._run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    elapsed = _time.time() - t0
    assert "all attempts" in str(ei.value.code)
    err = capsys.readouterr().err
    assert "hard cap" in err and "stale" not in err
    # each attempt lived to the 8 s cap, well past the 3 s deadline
    assert elapsed > 8.0


def test_wait_for_tunnel(monkeypatch, capsys):
    """The watchdog's probe gate: a hung tunnel (probe timeouts) delays
    the attempt until a probe succeeds; an exhausted probe budget
    proceeds anyway (the attempt deadline still bounds the run)."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        import bench
    finally:
        sys.path.remove("/root/repo")

    # recovers on the third probe: two sleeps, then proceed
    seq = iter([False, False, True])
    sleeps = []
    monkeypatch.setattr(bench, "_tunnel_alive", lambda t=150.0: next(seq))
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    bench._wait_for_tunnel(budget_s=1000.0, sleep_s=10.0)
    assert sleeps == [10.0, 10.0]
    assert "tunnel hung" in capsys.readouterr().err

    # budget too small for even one wait: return without sleeping
    monkeypatch.setattr(bench, "_tunnel_alive", lambda t=150.0: False)
    sleeps.clear()
    bench._wait_for_tunnel(budget_s=5.0, sleep_s=10.0)
    assert sleeps == []
    assert "proceeding under the attempt deadline" in \
        capsys.readouterr().err


def test_watchdog_probe_gate(tmp_path, monkeypatch, capsys):
    """probe=True runs the tunnel-probe gate before EVERY attempt through
    the REAL _run_watchdog (the r4 regression shipped because the only
    probe-path test monkeypatched the watchdog away): a hung child is
    killed, and the retry probes the tunnel again before re-launching."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        import bench
    finally:
        sys.path.remove("/root/repo")

    probes = []
    monkeypatch.setattr(bench, "_wait_for_tunnel",
                        lambda budget_s, **k: probes.append(budget_s))
    monkeypatch.setenv("BENCH_PROBE_WAIT_S", "123")
    monkeypatch.setenv("BENCH_DEADLINE_S", "15")

    marker = tmp_path / "second_attempt"
    stub = tmp_path / "child.py"
    stub.write_text(
        "import os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    sys.exit(0)\n"
        "open(m, 'w').close()\n"
        "time.sleep(60)\n")
    with pytest.raises(SystemExit) as ei:
        bench._run_watchdog([sys.executable, str(stub)], retry_sleep=0.0,
                            probe=True)
    assert ei.value.code == 0
    assert probes == [123.0, 123.0]   # gate ran per attempt, not once
    # default: an explicit cmd (tests, train children) skips the gate
    probes.clear()
    stub.write_text("import sys; sys.exit(0)\n")
    with pytest.raises(SystemExit):
        bench._run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert probes == []


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
