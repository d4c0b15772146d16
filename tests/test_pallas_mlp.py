"""Pallas fused MLP vs the flax PointMLP (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbd_pifuhd_tpu.models.mlp import PointMLP
from rgbd_pifuhd_tpu.ops.pallas_mlp import (
    fused_point_mlp,
    mlp_weights_from_params,
)


@pytest.mark.parametrize("chans,res", [
    ((257, 1024, 512, 256, 128, 1), (2, 3, 4)),   # coarse MLP shape
    ((272, 512, 256, 128, 1), (1, 2)),            # fine MLP shape
])
def test_fused_mlp_matches_pointmlp(rng, chans, res):
    N = 300
    x = rng.standard_normal((1, N, chans[0])).astype(np.float32) * 0.3
    m = PointMLP(chans, merge_layer=2, res_layers=res, norm="none",
                 last_op="sigmoid")
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_ref, _ = m.apply(params, jnp.asarray(x))

    weights = mlp_weights_from_params(params["params"], len(chans) - 1)
    y = fused_point_mlp(jnp.asarray(x[0]), weights, res_layers=res,
                        block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref[0]),
                               rtol=1e-5, atol=1e-6)


def test_fused_mlp_ragged_n(rng):
    """N not a multiple of the block size."""
    chans, res = (16, 64, 32, 1), (1,)
    N = 333
    x = rng.standard_normal((1, N, chans[0])).astype(np.float32)
    m = PointMLP(chans, res_layers=res, norm="none", last_op="sigmoid")
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    y_ref, _ = m.apply(params, jnp.asarray(x))
    weights = mlp_weights_from_params(params["params"], len(chans) - 1)
    y = fused_point_mlp(jnp.asarray(x[0]), weights, res_layers=res,
                        block=256, interpret=True)
    assert y.shape == (N, 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref[0]),
                               rtol=1e-5, atol=1e-6)
