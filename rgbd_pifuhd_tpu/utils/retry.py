"""Transient-failure classification + retry for tunnel/backend errors.

The remote-compile link can drop mid-request (observed: BENCH_r02 died in
``jax.jit(model.init)`` on "read body: response body closed before all
bytes were read") — such errors are environmental, not code faults, and
callers retry them.  Anything not matching the signatures re-raises
immediately.
"""

from __future__ import annotations

import time

TRANSIENT_SIGNATURES = (
    "remote_compile", "response body", "INTERNAL", "UNAVAILABLE",
    "DEADLINE_EXCEEDED", "Connection reset", "Socket closed")


def is_transient(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(t in s for t in TRANSIENT_SIGNATURES)


def run_with_retry(fn, attempts: int = 3, label: str = ""):
    """Retry ``fn`` on transient backend/tunnel errors with a short pause."""
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by is_transient
            if k + 1 >= attempts or not is_transient(e):
                raise
            import sys
            print(f"[bench] transient backend error in {label or 'step'} "
                  f"(attempt {k + 1}/{attempts}): {e}", file=sys.stderr)
            time.sleep(5.0 * (k + 1))
