"""Stacked-hourglass encoder building blocks (flax.linen, NHWC).

TPU-first re-design of the reference's L1 blocks
(/root/reference/Filter.py:12-228):

- ``ConvBlock``  — pre-activation residual block producing out/2 + out/4 +
  out/4 channels concatenated (Filter.py:23-69).
- ``HourGlass``  — recursive hourglass; down = 2x2 avg-pool, up = bicubic 2x
  align_corners=True (Filter.py:71-130).  Depth is a static Python int, so
  the recursion unrolls at trace time into a fully fusable XLA graph.
- ``HGFilter``   — stacked hourglass encoder with intermediate supervision
  and al/bl feedback (Filter.py:132-228).

Deliberate divergences from the reference (documented per SURVEY.md 2.5):
- the ``conv64``/``conv128`` down paths are implemented correctly (the
  reference's comparison bug at Filter.py:192 made them dead);
- ``use_sigmoid`` is renamed ``final_act='tanh'|None`` (the reference's flag
  actually applied Tanh, Filter.py:218-219; both PIFu nets pass False).

All convs carry ``param_dtype=float32``; activations may be bf16 on TPU via
the caller casting inputs (mixed precision), since norms recompute in f32.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import avg_pool2d, upsample2x_bicubic

# Reference init_net applies N(0, 0.02) to every conv weight
# (/root/reference/net_util.py:10-43); we keep that as the default.
conv_init = nn.initializers.normal(stddev=0.02)


def make_norm(norm: str, name: str, num_groups: int = 32):
    """Create a norm layer: 'group' (default-parity) or 'batch'.

    torch GroupNorm(32, C) over [B,C,*] == flax GroupNorm(32) over [B,*,C].
    BatchNorm requires threading `train` and mutable 'batch_stats'.
    """
    if norm == "group":
        return nn.GroupNorm(num_groups=num_groups, name=name, epsilon=1e-5)
    if norm == "batch":
        return nn.BatchNorm(
            name=name, momentum=0.9, epsilon=1e-5, axis_name=None
        )
    if norm == "instance":
        # InstanceNorm == GroupNorm with one group per channel, no affine
        # (pix2pixHD uses affine=False, networks.py:31).
        return nn.GroupNorm(
            num_groups=None, group_size=1, use_bias=False, use_scale=False,
            name=name, epsilon=1e-5,
        )
    raise ValueError(f"unknown norm {norm!r}")


class _NormReLU(nn.Module):
    """norm -> relu, handling the batch-norm train flag."""

    norm: str
    nname: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        layer = make_norm(self.norm, self.nname)
        if self.norm == "batch":
            x = layer(x, use_running_average=not train)
        else:
            x = layer(x)
        return nn.relu(x)


class ConvBlock(nn.Module):
    """Pre-activation residual block (parity: Filter.py:23-69).

    Three 3x3 convs emit out/2, out/4, out/4 channels; their concat (== out
    channels) is summed with the (1x1-projected, if needed) residual.
    """

    out_channels: int
    norm: str = "group"
    dtype: str | None = None  # compute dtype for convs (params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2, c4 = self.out_channels // 2, self.out_channels // 4
        conv = lambda ch, name: nn.Conv(
            ch, (3, 3), padding=1, use_bias=False, name=name,
            kernel_init=conv_init, dtype=self.dtype,
        )

        y1 = conv(c2, "conv1")(_NormReLU(self.norm, "n")(x, train))
        y2 = conv(c4, "conv2")(_NormReLU(self.norm, "n")(y1, train))
        y3 = conv(c4, "conv3")(_NormReLU(self.norm, "n")(y2, train))
        out = jnp.concatenate([y1, y2, y3], axis=-1)

        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, name="down_conv",
                kernel_init=conv_init, dtype=self.dtype,
            )(_NormReLU(self.norm, "n")(x, train))
        else:
            residual = x
        return out + residual


class HourGlass(nn.Module):
    """Recursive hourglass (parity: Filter.py:71-130).

    up branch: ConvBlock; down branch: avg_pool/2 -> ConvBlock -> recurse
    (or ConvBlock at the bottom) -> ConvBlock -> bicubic 2x upsample; sum.
    """

    depth: int
    features: int
    norm: str = "group"
    dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = lambda name: ConvBlock(self.features, self.norm,
                                    dtype=self.dtype, name=name)
        up1 = cb("b1")(x, train)
        low1 = cb("b2")(avg_pool2d(x, 2, 2), train)
        if self.depth > 1:
            low2 = HourGlass(
                self.depth - 1, self.features, self.norm, dtype=self.dtype,
                name="inner"
            )(low1, train)
        else:
            low2 = cb("b2_plus")(low1, train)
        low3 = cb("b3")(low2, train)
        up2 = upsample2x_bicubic(low3)
        return up1 + up2


class HGFilter(nn.Module):
    """Stacked-hourglass pixel-aligned feature encoder (Filter.py:132-228).

    Returns ``(outputs, normx)`` where ``outputs`` is a list of per-stack
    feature maps [B, H', W', last_channels] (intermediate supervision) and
    ``normx`` is the 128-channel stem feature.

    down_type:
        'ave_pool' — 7x7/2 stem then ConvBlock + 2x2 avg-pool (global path,
                     total stride 4; the coarse model's default)
        'no_down'  — 7x7/2 stem only (local path, stride 2; PIFuMRNet.py:40)
        'conv64'   — ConvBlock(64) + strided conv to 128 (fixed vs reference)
        'conv128'  — conv to 128 + strided conv (fixed vs reference)
    """

    n_stack: int
    depth: int
    last_channels: int
    norm: str = "group"
    down_type: str = "ave_pool"
    final_act: str | None = None  # reference use_sigmoid=True applied Tanh
    dtype: str | None = None
    remat: bool = False  # checkpoint each hourglass in backward

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=2, padding=3, name="conv1",
            kernel_init=conv_init, dtype=self.dtype,
        )(x)
        x = _NormReLU(self.norm, "n")(x, train)

        if self.down_type == "ave_pool":
            x = avg_pool2d(ConvBlock(128, self.norm, dtype=self.dtype, name="conv2")(x, train), 2, 2)
        elif self.down_type == "no_down":
            x = ConvBlock(128, self.norm, dtype=self.dtype, name="conv2")(x, train)
        elif self.down_type == "conv64":
            x = ConvBlock(64, self.norm, dtype=self.dtype, name="conv2")(x, train)
            x = nn.Conv(128, (3, 3), strides=2, padding=1, name="down_conv2",
                        kernel_init=conv_init)(x)
        elif self.down_type == "conv128":
            x = ConvBlock(128, self.norm, dtype=self.dtype, name="conv2")(x, train)
            x = nn.Conv(128, (3, 3), strides=2, padding=1, name="down_conv2",
                        kernel_init=conv_init)(x)
        else:
            raise ValueError(f"unknown down_type {self.down_type!r}")

        normx = x

        x = ConvBlock(128, self.norm, dtype=self.dtype, name="conv3")(x, train)
        x = ConvBlock(256, self.norm, dtype=self.dtype, name="conv4")(x, train)

        previous = x
        outputs = []
        for i in range(self.n_stack):
            hg_cls = nn.remat(HourGlass, static_argnums=(2,)) \
                if self.remat else HourGlass
            hg = hg_cls(self.depth, 256, self.norm, dtype=self.dtype,
                        name=f"m{i}")(previous, train)
            ll = ConvBlock(256, self.norm, dtype=self.dtype, name=f"top_m_{i}")(hg, train)
            ll = nn.Conv(256, (1, 1), name=f"conv_last{i}",
                         kernel_init=conv_init, dtype=self.dtype)(ll)
            ll = _NormReLU(self.norm, "n")(ll, train)

            out = nn.Conv(self.last_channels, (1, 1), name=f"l{i}",
                          kernel_init=conv_init, dtype=self.dtype)(ll)
            if self.final_act == "tanh":
                outputs.append(jnp.tanh(out))
            else:
                outputs.append(out)

            if i < self.n_stack - 1:
                ll_fb = nn.Conv(256, (1, 1), name=f"bl{i}",
                                kernel_init=conv_init)(ll)
                out_fb = nn.Conv(256, (1, 1), name=f"al{i}",
                                 kernel_init=conv_init)(out)
                previous = previous + ll_fb + out_fb

        return outputs, normx
