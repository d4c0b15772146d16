"""Progress-aware child-process supervision for benchmark/training runs.

The device tunnel on this class of host fails in ways no in-process
mechanism can catch: a blocked jax call never returns to Python, so no
signal handler or timeout fires (observed 2026-08-18: a 256x256 matmul
readback blocked >240 s).  The only robust supervisor is a PARENT process
that watches a child's output stream and SIGKILLs its process group.

This module owns that machinery; ``bench.py`` (and
``scripts/train_bench_flagship.py --supervised``) are thin consumers.  It
lives in the package — not the bench script — so a syntax-level
regression in the bench's measurement code can never take the supervisor
down with it, and the unit tests pin the module directly
(tests/test_watchdog.py).

Kill rules, in order (each layer exists because the previous one failed
in the field):

1. RETRIES on error are not enough — a hung tunnel RAISES nothing.
2. A fixed total deadline kills healthy-but-slow runs: on 2026-08-19 the
   tunnel flapped on a ~10-60 min cadence; connections ESTABLISHED
   before a flap keep working, so the deadline killed a healthy attempt
   and its replacement then blocked on the flapped tunnel.
3. SILENCE is the primary kill rule: no output line for
   ``BENCH_SILENCE_S`` (children emit heartbeats at every phase) means a
   real hang.
4. The total deadline remains a backstop, but YIELDS to fresh progress
   (2026-08-20: a crawling tunnel stretched timed rounds to ~45 s each
   and the fixed deadline killed the run seconds before its final JSON)
   — past the deadline a kill requires output stale >300 s as well.
5. ``BENCH_HARD_CAP_S`` (default 3x deadline) bounds even a
   heartbeat-emitting run absolutely.

Environment knobs: BENCH_DEADLINE_S, BENCH_SILENCE_S, BENCH_HARD_CAP_S,
BENCH_PROBE_WAIT_S; see run_watchdog.
"""

from __future__ import annotations

import os
import time


def tunnel_alive(timeout_s: float = 150.0) -> bool:
    """True iff a tiny device readback completes within ``timeout_s``.

    The probe runs in a disposable subprocess: SIGKILL always lands,
    whereas an in-process probe blocked inside a jax call could never be
    cancelled.
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((128, 128)); print(float((x @ x).sum()))")
    child = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, start_new_session=True)
    try:
        return child.wait(timeout=timeout_s) == 0
    except subprocess.TimeoutExpired:
        import signal
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except OSError:
            child.kill()
        child.wait()
        return False


def wait_for_tunnel(budget_s: float, probe_timeout_s: float = 150.0,
                    sleep_s: float = 180.0) -> None:
    """Block until the tunnel answers a probe, up to ``budget_s``.

    On budget exhaustion the caller proceeds anyway — the per-attempt
    deadline still bounds a hung run; this just stops a known-hung tunnel
    from burning attempts back-to-back.
    """
    import sys

    t0 = time.time()
    while not tunnel_alive(probe_timeout_s):
        waited = time.time() - t0
        if waited + sleep_s > budget_s:
            print(f"[bench] tunnel probe still hanging after {waited:.0f}s;"
                  " proceeding under the attempt deadline", file=sys.stderr)
            return
        print(f"[bench] tunnel hung (tiny readback > {probe_timeout_s:.0f}"
              f"s); retrying probe in {sleep_s:.0f}s", file=sys.stderr)
        time.sleep(sleep_s)


def default_deadline_s() -> float:
    """Per-attempt deadline: 2400 s covers a bench run against an existing
    flagship checkpoint; when the checkpoint must be TRAINED in-bench
    (~1800 s on this chip before the first timed pass), a 2400 s attempt
    is guaranteed to die mid-bench and waste its training on the retry,
    so the deadline grows to 4200 s.  BENCH_DEADLINE_S overrides."""
    ckpt = os.environ.get(
        "RGBD_PIFUHD_FLAGSHIP_CKPT",
        os.path.expanduser(  # keep in sync with train_bench_flagship.DEFAULT_OUT
            "~/.cache/rgbd_pifuhd_tpu/flagship/ckpt"))
    trains = (not os.path.exists(ckpt)
              and os.environ.get("BENCH_TRAIN_FLAGSHIP", "1") == "1")
    return 4200.0 if trains else 2400.0


def _pump(stream, sink, stamp):
    """Forward child output line-by-line, stamping last-activity time."""
    for line in iter(stream.readline, ""):
        sink.write(line)
        sink.flush()
        stamp[0] = time.time()
    stream.close()


def run_watchdog(cmd, retry_sleep: float = 30.0, probe: bool = False,
                 attempts: int = 3) -> None:
    """Run ``cmd`` in a child process under progress-aware supervision.

    Pipes the child's stdout/stderr through (a driver still reads any
    JSON line from parent stdout), kills the child's whole process group
    when a kill rule fires (see module docstring), retries up to
    ``attempts`` times, and finally re-raises the child's exit status as
    SystemExit.  ``probe=True`` gates EVERY attempt on a live tunnel
    probe (``wait_for_tunnel``) — pass it for children that talk to the
    device; retries after a tunnel flap must wait for the tunnel to
    answer again.

    Always raises SystemExit (child rc, or a message when every attempt
    hung).
    """
    import subprocess
    import sys
    import threading

    probe_budget = float(os.environ.get("BENCH_PROBE_WAIT_S", "1500"))
    env = dict(os.environ, BENCH_CHILD="1", PYTHONUNBUFFERED="1")
    for attempt in range(1, attempts + 1):
        if probe and probe_budget > 0:
            wait_for_tunnel(probe_budget)
        # re-evaluated per attempt: attempt 1 may have finished training
        # and saved the checkpoint before dying mid-bench — attempt 2
        # then needs only the tighter no-training deadline
        deadline = float(os.environ.get("BENCH_DEADLINE_S", "0")) \
            or (default_deadline_s() if probe else 2400.0)
        silence = float(os.environ.get("BENCH_SILENCE_S", "0")) \
            or min(900.0, deadline)
        stale = min(300.0, silence)
        hard_cap = float(os.environ.get("BENCH_HARD_CAP_S", "0")) \
            or 3.0 * deadline
        child = subprocess.Popen(cmd, env=env, start_new_session=True,
                                 stdout=subprocess.PIPE,
                                 stderr=subprocess.PIPE, text=True)
        stamp = [time.time()]
        t0 = time.time()
        pumps = [
            threading.Thread(target=_pump, daemon=True,
                             args=(child.stdout, sys.stdout, stamp)),
            threading.Thread(target=_pump, daemon=True,
                             args=(child.stderr, sys.stderr, stamp)),
        ]
        for t in pumps:
            t.start()
        timed_out = None
        while child.poll() is None:
            now = time.time()
            if now - stamp[0] > silence:
                timed_out = f"silent for {silence:.0f}s"
                break
            if now - t0 > deadline and now - stamp[0] > stale:
                timed_out = (f"no result after {deadline:.0f}s with output "
                             f"stale for {now - stamp[0]:.0f}s")
                break
            if now - t0 > hard_cap:
                timed_out = f"no result after hard cap {hard_cap:.0f}s"
                break
            time.sleep(1.0)
        if timed_out is not None:
            import signal
            print(f"[bench] {timed_out} "
                  f"(attempt {attempt}/{attempts}): backend hang — "
                  f"killing run",
                  file=sys.stderr)
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except OSError:
                child.kill()
            child.wait()
            for t in pumps:
                t.join(timeout=10.0)
            if attempt == attempts:
                raise SystemExit(
                    "bench: backend hung through all attempts") from None
            time.sleep(retry_sleep)
            continue
        rc = child.wait()
        for t in pumps:
            t.join(timeout=10.0)
        raise SystemExit(rc)
