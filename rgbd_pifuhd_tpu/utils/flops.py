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
    """XLA HLO flop estimate of ``jitted(*args)``; falls back to a
    jaxpr-level matmul/conv MAC count when the client does not expose
    cost analysis (the tunneled axon backend returns None from
    ``lower().cost_analysis()``).  Lowering/tracing happens on the
    client — no device execution or compilation."""
    try:
        ca = jitted.lower(*args, **kwargs).cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0]
        return float(ca["flops"])
    except Exception:  # noqa: BLE001 — backend/version dependent API
        pass
    try:
        return jaxpr_flops(jitted, *args, **kwargs)
    except Exception:  # noqa: BLE001 — same contract: None, never raise
        return None


def _math_prod(xs) -> float:
    out = 1.0
    for x in xs:
        out *= float(x)
    return out


def jaxpr_flops(fn, *args, **kwargs) -> float:
    """Matmul + conv MAC*2 count from the traced jaxpr of ``fn(*args)``.

    Backend-independent twin of XLA's "flops" cost analysis for the ops
    that carry ~all encoder flops: ``dot_general`` and
    ``conv_general_dilated``.  Elementwise/norm/reduction ops are O(n)
    next to these and ignored — same convention XLA's own counter uses
    for MFU math.  Recurses through call/closed-call primitives (pjit,
    remat, custom_vjp, scan — scan multiplies by trip count).
    """
    import jax

    closed = jax.make_jaxpr(
        (fn.__wrapped__ if hasattr(fn, "__wrapped__") else fn))(
        *args, **kwargs)
    return _jaxpr_flops_inner(closed.jaxpr)


def _jaxpr_flops_inner(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            lhs = eqn.invars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            batch = _math_prod(lhs[d] for d in lb)
            contract = _math_prod(lhs[d] for d in lc)
            m = _math_prod(lhs[d] for d in range(len(lhs))
                           if d not in set(lc) | set(lb))
            n = _math_prod(rhs[d] for d in range(len(rhs))
                           if d not in set(rc) | set(rb))
            total += 2.0 * batch * m * n * contract
        elif name == "conv_general_dilated":
            dn = eqn.params["dimension_numbers"]
            rhs = eqn.invars[1].aval.shape
            out = eqn.outvars[0].aval.shape
            k_spatial = _math_prod(rhs[d] for d in dn.rhs_spec[2:])
            cin_per_group = rhs[dn.rhs_spec[1]]
            total += 2.0 * _math_prod(out) * cin_per_group * k_spatial
        else:
            # recurse into inner jaxprs (pjit/remat/scan/cond/custom_*)
            trip = float(eqn.params.get("length", 1)) \
                if name == "scan" else 1.0
            for key in ("jaxpr", "call_jaxpr"):
                inner = eqn.params.get(key)
                if inner is not None:
                    total += trip * _jaxpr_flops_inner(
                        getattr(inner, "jaxpr", inner))
            if name == "cond":
                total += max(
                    (_jaxpr_flops_inner(b.jaxpr)
                     for b in eqn.params.get("branches", ())),
                    default=0.0)
    return total


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
