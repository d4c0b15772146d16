"""Flop accounting for MFU reporting.

BASELINE.md's primary-metric clause asks for perf claims backed by counted
flops, not prose.  Two counters:

- ``mlp_flops_per_point``: analytic MAC count of the per-point occupancy
  MLP chain (models/mlp.py — Dense layers with optional residual input
  concats), the quantity that multiplies by the number of grid points the
  evaluator actually runs.
- ``lowered_flops``: XLA's own HLO flop estimate of a jitted computation
  (client-side lowering + cost analysis; no device execution), used for
  the conv-heavy encode pass whose shapes are impractical to enumerate by
  hand.

``device_peak_flops`` maps jax device kinds to published bf16 peaks so the
bench can report MFU = achieved / peak.
"""

from __future__ import annotations


def mlp_flops_per_point(cfg) -> float:
    """MACs*2 of one PointMLP forward for ONE point.

    Layer ``i`` maps ``in_i -> mlp_dim[i+1]`` where ``in_i`` is
    ``mlp_dim[i]`` plus the original input width when ``i`` is a residual
    layer (models/mlp.py: res_layers concat the layer-0 input).  Dense
    flops dominate; norms/activations are O(width) and ignored.
    """
    dims = list(cfg.mlp_dim)
    res = set(cfg.mlp_res_layers or ())
    flops = 0.0
    for i in range(len(dims) - 1):
        fan_in = dims[i] + (dims[0] if i in res else 0)
        flops += 2.0 * fan_in * dims[i + 1]
    return flops


def two_level_query_flops_per_point(cfg_fine, cfg_global) -> float:
    """Per-point MLP flops of one two-level field query: every query runs
    the coarse MLP (for phi at the merge layer) AND the fine MLP
    (models/multires.py query)."""
    return mlp_flops_per_point(cfg_fine) + mlp_flops_per_point(cfg_global)


def lowered_flops(jitted, *args, **kwargs) -> float | None:
    """XLA HLO flop estimate of ``jitted(*args)``; None when the client
    does not expose cost analysis.  Lowering traces on the client — no
    device execution or compilation happens."""
    try:
        ca = jitted.lower(*args, **kwargs).cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0]
        return float(ca["flops"])
    except Exception:  # noqa: BLE001 — backend/version dependent API
        return None


# Published peak dense bf16 matmul throughput per chip, FLOP/s.
# v5 lite == v5e.  Sources: cloud.google.com/tpu/docs/system-architectures.
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def device_peak_flops(device) -> float | None:
    """bf16 peak FLOP/s for a jax device (by ``device_kind`` prefix match,
    longest match wins), or None for unknown kinds."""
    kind = str(getattr(device, "device_kind", device))
    best = None
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name) and (best is None or len(name) > best[0]):
            best = (len(name), peak)
    return best[1] if best else None
