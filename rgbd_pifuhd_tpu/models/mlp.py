"""Per-point occupancy MLP head.

Re-design of the reference MLP (/root/reference/MLP.py:12-75): the
reference expresses it as Conv1d(kernel=1) over [B, C, N]; on TPU the same
computation is a chain of Dense layers over the channel axis of [B, N, C] —
each layer is one big [B*N, C_in] x [C_in, C_out] matmul that tiles directly
onto the MXU and shards trivially along the point axis N.

Semantics parity:
- ``res_layers``: layers whose input is concat(y, original_input)
  (MLP.py:31-36, 61-64).
- ``merge_layer``: the post-activation feature captured as ``phi``
  (MLP.py:25, 70-71); if <= 0, defaults to n_layers // 2.
- between-layer: norm (group32 / batch / none) then leaky_relu(0.01)
  (MLP.py:65-69); no norm/activation after the last layer.
- ``last_op='sigmoid'`` maps logits to occupancy in [0, 1].
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .blocks import conv_init, make_norm


class PointMLP(nn.Module):
    """MLP over per-point features [B, N, C_in] -> ([B, N, C_out], phi)."""

    filter_channels: Sequence[int]  # including input channel count
    merge_layer: int = 0
    res_layers: Sequence[int] = ()
    norm: str = "group"
    last_op: str | None = "sigmoid"
    dtype: str | None = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, feature, train: bool = False):
        n_layers = len(self.filter_channels) - 1
        merge = (
            self.merge_layer
            if self.merge_layer > 0
            else len(self.filter_channels) // 2
        )
        y = feature
        phi = None
        for i in range(n_layers):
            inp = (
                jnp.concatenate([y, feature], axis=-1)
                if i in self.res_layers
                else y
            )
            y = nn.Dense(
                self.filter_channels[i + 1],
                name=f"dense{i}",
                kernel_init=conv_init,
                dtype=self.dtype,
            )(inp)
            if i != n_layers - 1:
                if self.norm in ("group", "batch"):
                    layer = make_norm(self.norm, f"norm{i}")
                    if self.norm == "batch":
                        y = layer(y, use_running_average=not train)
                    else:
                        y = layer(y)
                y = nn.leaky_relu(y, negative_slope=0.01)
            if i == merge:
                phi = y
        if self.last_op == "sigmoid":
            y = nn.sigmoid(y.astype(jnp.float32))
        elif self.last_op == "tanh":
            y = jnp.tanh(y.astype(jnp.float32))
        return y, phi
