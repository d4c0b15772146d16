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
