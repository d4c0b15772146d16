"""Unit tests for the supervision module (rgbd_pifuhd_tpu/utils/watchdog.py).

These drive the REAL run_watchdog with stub child scripts — the round-4
regression shipped precisely because the only probe-path test
monkeypatched the watchdog away, so every kill rule here is exercised
end-to-end: silence, deadline-yields-to-progress, hard cap, probe gate,
retry, and exit-status passthrough.
"""

import sys

import pytest

from rgbd_pifuhd_tpu.utils import watchdog


def test_kills_hung_child_and_retries(tmp_path, monkeypatch, capsys):
    """A hung child dies at the deadline, the run retries, and the
    child's exit status passes through."""
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
    # can take >10 s just to start; it must have written the marker (its
    # first statement) before the kill or the retry re-hangs
    monkeypatch.setenv("BENCH_DEADLINE_S", "20")

    with pytest.raises(SystemExit) as ei:
        watchdog.run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert ei.value.code == 0
    assert "backend hang" in capsys.readouterr().err

    # every attempt hanging -> red exit with a message
    stub.write_text("import time\ntime.sleep(60)\n")
    with pytest.raises(SystemExit) as ei:
        watchdog.run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert "all attempts" in str(ei.value.code)


def test_silence_rule_is_progress_aware(tmp_path, monkeypatch, capsys):
    """A child that keeps PRINTING stays alive past the silence window
    and its stdout is piped through (the driver reads the JSON line
    there); a child that goes quiet dies at the silence deadline, not
    the total deadline."""
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
        watchdog.run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert ei.value.code == 0
    out = capsys.readouterr().out
    assert '{"metric": "ok"}' in out and "heartbeat 5" in out

    # quiet child: one line then silence — killed by the SILENCE rule
    # (4 s) long before the 60 s total deadline, on every attempt
    stub.write_text("print('starting', flush=True)\n"
                    "import time\ntime.sleep(60)\n")
    t0 = __import__("time").time()
    with pytest.raises(SystemExit) as ei:
        watchdog.run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert "all attempts" in str(ei.value.code)
    assert __import__("time").time() - t0 < 55  # 3 x ~5 s, not 3 x 60 s
    assert "silent for 4s" in capsys.readouterr().err


def test_deadline_yields_to_progress(tmp_path, monkeypatch, capsys):
    """A child emitting fresh heartbeats OUTLIVES the total deadline;
    only the hard cap (BENCH_HARD_CAP_S, default 3x deadline) bounds a
    progressing run."""
    import time as _time

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
        watchdog.run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    elapsed = _time.time() - t0
    assert "all attempts" in str(ei.value.code)
    err = capsys.readouterr().err
    assert "hard cap" in err and "stale" not in err
    # each attempt lived to the 8 s cap, well past the 3 s deadline
    assert elapsed > 8.0


def test_wait_for_tunnel(monkeypatch, capsys):
    """The probe gate: a hung tunnel (probe timeouts) delays the attempt
    until a probe succeeds; an exhausted probe budget proceeds anyway
    (the attempt deadline still bounds the run)."""
    # recovers on the third probe: two sleeps, then proceed
    seq = iter([False, False, True])
    sleeps = []
    monkeypatch.setattr(watchdog, "tunnel_alive", lambda t=150.0: next(seq))
    monkeypatch.setattr(watchdog.time, "sleep", sleeps.append)
    watchdog.wait_for_tunnel(budget_s=1000.0, sleep_s=10.0)
    assert sleeps == [10.0, 10.0]
    assert "tunnel hung" in capsys.readouterr().err

    # budget too small for even one wait: return without sleeping
    monkeypatch.setattr(watchdog, "tunnel_alive", lambda t=150.0: False)
    sleeps.clear()
    watchdog.wait_for_tunnel(budget_s=5.0, sleep_s=10.0)
    assert sleeps == []
    assert "proceeding under the attempt deadline" in \
        capsys.readouterr().err


def test_probe_gate_runs_per_attempt(tmp_path, monkeypatch):
    """probe=True runs the tunnel gate before EVERY attempt through the
    real run_watchdog: a hung child is killed and the retry probes the
    tunnel again before re-launching.  Default (probe=False) never
    probes."""
    probes = []
    monkeypatch.setattr(watchdog, "wait_for_tunnel",
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
        watchdog.run_watchdog([sys.executable, str(stub)], retry_sleep=0.0,
                              probe=True)
    assert ei.value.code == 0
    assert probes == [123.0, 123.0]   # gate ran per attempt, not once

    probes.clear()
    stub.write_text("import sys; sys.exit(0)\n")
    with pytest.raises(SystemExit):
        watchdog.run_watchdog([sys.executable, str(stub)], retry_sleep=0.0)
    assert probes == []


def test_default_deadline_grows_when_training(tmp_path, monkeypatch):
    """No flagship checkpoint + in-bench training enabled -> 4200 s;
    checkpoint present (or training disabled) -> 2400 s."""
    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv("RGBD_PIFUHD_FLAGSHIP_CKPT", str(ckpt))
    monkeypatch.delenv("BENCH_TRAIN_FLAGSHIP", raising=False)
    assert watchdog.default_deadline_s() == 4200.0
    monkeypatch.setenv("BENCH_TRAIN_FLAGSHIP", "0")
    assert watchdog.default_deadline_s() == 2400.0
    monkeypatch.setenv("BENCH_TRAIN_FLAGSHIP", "1")
    ckpt.write_text("x")
    assert watchdog.default_deadline_s() == 2400.0
