"""Persistent XLA compilation cache for the long-lived entry points.

First compiles of the flagship computations cost 20-120 s through the
dev tunnel (and real seconds even on a local TPU host); every CLI
invocation, bench run, and driver check pays them again because each is
a fresh process.  JAX ships a persistent on-disk compilation cache that
makes the second process skip straight to execution — this module turns
it on with conservative thresholds.

The reference has no analog (PyTorch eager pays no compile), so this is
pure TPU-runtime engineering: call ``enable_persistent_cache()`` before
the first ``jit`` executes.  Safe to call multiple times; never raises
(a read-only HOME or an unsupported backend degrades to no cache, not a
crash).
"""

from __future__ import annotations

import os

_ENABLED = False


def _host_fingerprint() -> str:
    """Short digest of what makes XLA:CPU AOT artifacts host-specific.

    The persistent cache stores CPU AOT results compiled against the
    build host's exact feature set; loading them on a host with
    different features logs cpu_aot_loader errors and risks SIGILL.
    Keying the default cache dir by (jax version, machine, cpuinfo
    flags) gives each distinct host its own cache instead.
    """
    import hashlib
    import platform

    parts = [platform.machine(), platform.python_version()]
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:  # noqa: BLE001
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache and return its path.

    Resolution order: explicit ``path`` arg, ``RGBD_PIFUHD_JAX_CACHE``
    env var, ``~/.cache/rgbd_pifuhd_tpu/jax-<host-fingerprint>``.  Set
    the env var to ``0`` or ``off`` to disable entirely.
    """
    global _ENABLED
    env = os.environ.get("RGBD_PIFUHD_JAX_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return None
    if _ENABLED:
        return _ENABLED if isinstance(_ENABLED, str) else None
    cache_dir = (path or env
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "rgbd_pifuhd_tpu",
                                 f"jax-{_host_fingerprint()}"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took >=1s to compile, regardless of size:
        # the flagship encoders/evaluators are the target, and over the
        # tunnel even mid-size kernels cost whole seconds
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is best-effort by design
        return None
    _ENABLED = cache_dir
    return cache_dir
