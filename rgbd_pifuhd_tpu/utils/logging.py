"""Observability: timers, training logs, error histories, profiler hooks.

The reference logs Name/Epoch/iter/Err/LR/dataT/netT/ETA format strings and
saves per-epoch loss arrays as .npy (/root/reference/train.py:193-214);
plot_error.py plots them offline.  This module is the framework-native
version, plus jax.profiler tracing the reference lacks (SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


class Timer:
    """Accumulating phase timer: with t.phase('data'): ..."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        return self.totals.get(name, 0.0) / max(self.counts.get(name, 0), 1)

    def summary(self) -> str:
        return " ".join(
            f"{k}:{self.mean(k)*1e3:.0f}ms" for k in sorted(self.totals)
        )


class TrainLogger:
    """Reference-style iteration logs + error history persistence."""

    def __init__(self, name: str, out_dir: str = "./train_result"):
        self.name = name
        self.out_dir = out_dir
        self.errors: list[float] = []
        self.timer = Timer()
        os.makedirs(out_dir, exist_ok=True)

    def log_iter(self, epoch: int, it: int, total: int, err: float,
                 lr: float, extra: str = "") -> None:
        data_t = self.timer.mean("data")
        net_t = self.timer.mean("net")
        eta = (total - it) * (data_t + net_t)
        print(
            f"Name: {self.name} | Epoch: {epoch} | {it}/{total} | "
            f"Err: {err:.6f} | LR: {lr:.6f} | dataT: {data_t:.3f} | "
            f"netT: {net_t:.3f} | ETA: {int(eta // 60):02d}:{int(eta % 60):02d}"
            f" {extra}"
        )

    def record(self, err: float) -> None:
        self.errors.append(float(err))

    def save_epoch_errors(self, epoch: int) -> None:
        """train_result/<name>/error_epoch_<N>.npy (train.py:213-214)."""
        d = os.path.join(self.out_dir, self.name)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f"error_epoch_{epoch}.npy"),
                np.asarray(self.errors))


def load_error_history(out_dir: str, name: str) -> list[np.ndarray]:
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        return []
    files = sorted(
        (f for f in os.listdir(d) if f.startswith("error_epoch_")),
        key=lambda f: int(f[len("error_epoch_"):-4]),
    )
    return [np.load(os.path.join(d, f)) for f in files]


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
