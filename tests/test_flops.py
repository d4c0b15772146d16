"""utils/flops.py: analytic MLP MAC counts cross-checked against XLA's
own HLO flop estimate, and the peak-flops table lookup."""

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_pifuhd_tpu.models.mlp import PointMLP
from rgbd_pifuhd_tpu.utils.flops import (
    device_peak_flops,
    lowered_flops,
    mlp_flops_per_point,
    two_level_query_flops_per_point,
)
from rgbd_pifuhd_tpu.utils.options import PIFuLevelConfig


def test_mlp_flops_match_xla_count():
    """The analytic count equals XLA's HLO flop estimate for the Dense
    chain (norm='none': the remaining ops are O(width) activations that
    XLA counts too, so allow 1%)."""
    cfg = PIFuLevelConfig(mlp_dim=(17, 64, 32, 1), mlp_res_layers=(1, 2),
                          mlp_norm="none")
    mlp = PointMLP(filter_channels=cfg.mlp_dim,
                   res_layers=cfg.mlp_res_layers, norm="none")
    n_pts = 256
    x = jnp.ones((1, n_pts, cfg.mlp_dim[0]), jnp.float32)
    params = mlp.init(jax.random.PRNGKey(0), x)

    fwd = jax.jit(lambda p, x: mlp.apply(p, x)[0])
    xla = lowered_flops(fwd, params, x)
    if xla is None:  # cost analysis unavailable on this client
        return
    analytic = mlp_flops_per_point(cfg) * n_pts
    # XLA additionally counts bias adds + activations (O(width*n) — a
    # larger fraction at these small widths), so analytic is a floor
    # within 10% of XLA's count
    assert analytic <= xla <= analytic * 1.10, (analytic, xla)


def test_mlp_flops_res_layer_widens_fan_in():
    base = PIFuLevelConfig(mlp_dim=(8, 4, 1), mlp_res_layers=(),
                           mlp_norm="none")
    res = PIFuLevelConfig(mlp_dim=(8, 4, 1), mlp_res_layers=(1,),
                          mlp_norm="none")
    # layer 1 fan-in grows from 4 to 4+8
    assert (mlp_flops_per_point(res) - mlp_flops_per_point(base)
            == 2 * 8 * 1)


def test_two_level_sum():
    a = PIFuLevelConfig(mlp_dim=(8, 4, 1), mlp_res_layers=())
    b = PIFuLevelConfig(mlp_dim=(6, 3, 1), mlp_res_layers=())
    assert two_level_query_flops_per_point(a, b) == \
        mlp_flops_per_point(a) + mlp_flops_per_point(b)


def test_device_peak_lookup():
    class D:
        device_kind = "TPU v5 lite"

    assert device_peak_flops(D()) == 197e12

    class D2:
        device_kind = "TPU v5p chip"

    # longest-prefix match: v5p (459), not v5 (197)
    assert device_peak_flops(D2()) == 459e12

    class Unknown:
        device_kind = "GPU A100"

    assert device_peak_flops(Unknown()) is None


def test_lowered_flops_matmul():
    f = jax.jit(lambda x: x @ x)
    got = lowered_flops(f, jnp.ones((32, 32)))
    if got is None:
        return
    assert got >= 2 * 32 * 32 * 32 * 0.99


def test_jaxpr_flops_matches_xla_conv_count():
    """jaxpr_flops (the backend-independent fallback used when
    lower().cost_analysis() returns None — the tunneled axon client
    does) agrees with XLA's conv+matmul count within 10%."""
    import flax.linen as nn

    from rgbd_pifuhd_tpu.utils.flops import jaxpr_flops

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            # VALID padding: XLA's counter excludes multiplies against
            # SAME-padding zeros, which at tiny test sizes skews the
            # comparison by the border fraction; production encode
            # images are 512-1024^2 where that skew is <1%
            x = nn.Conv(16, (3, 3), strides=(2, 2), padding="VALID")(x)
            x = nn.relu(x)
            x = nn.Conv(32, (3, 3), feature_group_count=2,
                        padding="VALID")(x)
            return nn.Dense(8)(x.reshape(x.shape[0], -1))

    m = M()
    x = jnp.ones((2, 16, 16, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x: m.apply(p, x))
    got = jaxpr_flops(f, params, x)
    xla = None
    try:
        ca = f.lower(params, x).cost_analysis()
        xla = float(ca["flops"]) if ca else None
    except Exception:
        pass
    assert got > 0
    if xla:
        assert abs(got - xla) / xla < 0.10, (got, xla)


def test_jaxpr_flops_counts_through_scan_and_pjit():
    from rgbd_pifuhd_tpu.utils.flops import jaxpr_flops

    w = jnp.ones((32, 32))

    @jax.jit
    def f(x):
        def body(c, _):
            return c @ w, None
        out, _ = jax.lax.scan(body, x, None, length=5)
        return out

    x = jnp.ones((4, 32))
    # 5 scan iterations x [4,32]x[32,32] matmuls
    assert jaxpr_flops(f, x) == 5 * 2 * 4 * 32 * 32
