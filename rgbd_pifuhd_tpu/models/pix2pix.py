"""pix2pixHD generator/discriminator zoo (flax.linen, NHWC).

Functional re-design of the reference's networks.py zoo
(/root/reference/networks.py:36-336):

- ``GlobalGenerator``  — reflect-pad 7x7 stem, N stride-2 downs, K resnet
  blocks, N transpose-conv ups, 7x7 head (+Tanh) (networks.py:131-166).
  Used as the front/back normal-map predictors netF/netB with
  ``define_G(3, 3, 64, 'global', 4, 9, ...)`` (PIFuNetwNML.py:65-67) —
  but with input_nc parameterized correctly for RGB-D (6 channels), fixing
  the reference's channel mismatch (SURVEY.md 2.5.1).
- ``LocalEnhancer``    — coarse global generator + local enhancer branch
  (networks.py:77-129).
- ``Encoder``          — feature encoder with instance-wise average pooling
  (networks.py:209-244); the instance pooling is exposed as a separate
  pure function since it needs integer instance maps.
- ``NLayerDiscriminator`` / ``MultiscaleDiscriminator`` (networks.py:246-336).

Weight-level checkpoint compatibility with PyTorch IS supported
(utils/torch_import.py): the up-convs use the torch-exact padding (see
``UP_PAD``) so a torch ``ConvTranspose2d(k=3, s=2, p=1, output_padding=1)``
state imports bit-close.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import avg_pool2d

conv_init = nn.initializers.normal(stddev=0.02)  # networks.py:13-22

# torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) == zero-insertion
# upsampling cross-correlated with the SPATIALLY FLIPPED kernel under
# (1, 2) padding.  flax 'SAME' resolves to (2, 1) for k3/s2 — identical
# output shape but one-pixel-shifted taps — so the torch-exact padding is
# spelled out; checkpoint import (utils/torch_import.py) relies on this
# alignment (verified to ~5e-7 in tests/test_torch_import.py).
UP_PAD = ((1, 2), (1, 2))


def reflect_pad(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False) — per-sample, per-channel over H, W."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class ResnetBlock(nn.Module):
    """Reflect-padded 3x3 conv-norm-relu-conv-norm residual block."""

    dim: int

    @nn.compact
    def __call__(self, x):
        y = reflect_pad(x, 1)
        y = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv1",
                    kernel_init=conv_init)(y)
        y = InstanceNorm()(y)
        y = nn.relu(y)
        y = reflect_pad(y, 1)
        y = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv2",
                    kernel_init=conv_init)(y)
        y = InstanceNorm()(y)
        return x + y


class GlobalGenerator(nn.Module):
    """pix2pixHD global generator (networks.py:131-166)."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    last_op: str | None = "tanh"

    @nn.compact
    def __call__(self, x):
        y = reflect_pad(x, 3)
        y = nn.Conv(self.ngf, (7, 7), padding="VALID", name="stem",
                    kernel_init=conv_init)(y)
        y = nn.relu(InstanceNorm()(y))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            y = nn.Conv(self.ngf * mult * 2, (3, 3), strides=2, padding=1,
                        name=f"down{i}", kernel_init=conv_init)(y)
            y = nn.relu(InstanceNorm()(y))
        mult = 2 ** self.n_downsampling
        for i in range(self.n_blocks):
            y = ResnetBlock(self.ngf * mult, name=f"res{i}")(y)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            y = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding=UP_PAD, name=f"up{i}",
                                 kernel_init=conv_init)(y)
            y = nn.relu(InstanceNorm()(y))
        y = reflect_pad(y, 3)
        y = nn.Conv(self.output_nc, (7, 7), padding="VALID", name="head",
                    kernel_init=conv_init)(y)
        if self.last_op == "tanh":
            y = jnp.tanh(y)
        return y


class LocalEnhancer(nn.Module):
    """Global generator + one local enhancer level (networks.py:77-129)."""

    output_nc: int = 3
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_blocks_local: int = 3

    @nn.compact
    def __call__(self, x):
        ngf_global = self.ngf * 2
        # coarse pyramid level
        x_down = avg_pool2d(x, 3, 2, padding=1, count_include_pad=False)

        # global generator without its final 7x7+tanh head
        y = reflect_pad(x_down, 3)
        y = nn.Conv(ngf_global, (7, 7), padding="VALID", name="g_stem",
                    kernel_init=conv_init)(y)
        y = nn.relu(InstanceNorm()(y))
        for i in range(self.n_downsample_global):
            mult = 2 ** i
            y = nn.Conv(ngf_global * mult * 2, (3, 3), strides=2, padding=1,
                        name=f"g_down{i}", kernel_init=conv_init)(y)
            y = nn.relu(InstanceNorm()(y))
        mult = 2 ** self.n_downsample_global
        for i in range(self.n_blocks_global):
            y = ResnetBlock(ngf_global * mult, name=f"g_res{i}")(y)
        for i in range(self.n_downsample_global):
            mult = 2 ** (self.n_downsample_global - i)
            y = nn.ConvTranspose(ngf_global * mult // 2, (3, 3), strides=(2, 2),
                                 padding=UP_PAD, name=f"g_up{i}",
                                 kernel_init=conv_init)(y)
            y = nn.relu(InstanceNorm()(y))
        output_prev = y

        # local enhancer: downsample branch on full-res input
        z = reflect_pad(x, 3)
        z = nn.Conv(self.ngf, (7, 7), padding="VALID", name="l_stem",
                    kernel_init=conv_init)(z)
        z = nn.relu(InstanceNorm()(z))
        z = nn.Conv(self.ngf * 2, (3, 3), strides=2, padding=1, name="l_down",
                    kernel_init=conv_init)(z)
        z = nn.relu(InstanceNorm()(z))

        z = z + output_prev
        for i in range(self.n_blocks_local):
            z = ResnetBlock(self.ngf * 2, name=f"l_res{i}")(z)
        z = nn.ConvTranspose(self.ngf, (3, 3), strides=(2, 2), padding=UP_PAD,
                             name="l_up", kernel_init=conv_init)(z)
        z = nn.relu(InstanceNorm()(z))
        z = reflect_pad(z, 3)
        z = nn.Conv(self.output_nc, (7, 7), padding="VALID", name="l_head",
                    kernel_init=conv_init)(z)
        return jnp.tanh(z)


class Encoder(nn.Module):
    """Feature encoder (networks.py:209-230); instance pooling separate."""

    output_nc: int = 3
    ngf: int = 32
    n_downsampling: int = 4

    @nn.compact
    def __call__(self, x):
        y = reflect_pad(x, 3)
        y = nn.Conv(self.ngf, (7, 7), padding="VALID", name="stem",
                    kernel_init=conv_init)(y)
        y = nn.relu(InstanceNorm()(y))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            y = nn.Conv(self.ngf * mult * 2, (3, 3), strides=2, padding=1,
                        name=f"down{i}", kernel_init=conv_init)(y)
            y = nn.relu(InstanceNorm()(y))
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            y = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding=UP_PAD, name=f"up{i}",
                                 kernel_init=conv_init)(y)
            y = nn.relu(InstanceNorm()(y))
        y = reflect_pad(y, 3)
        y = nn.Conv(self.output_nc, (7, 7), padding="VALID", name="head",
                    kernel_init=conv_init)(y)
        return jnp.tanh(y)


def instance_average_pool(features: jax.Array, inst: jax.Array,
                          num_instances: int) -> jax.Array:
    """Instance-wise average pooling (networks.py:231-244), vectorized.

    Replaces the reference's Python nested loops with one-hot segment means:
    every pixel's feature is replaced by the mean over its instance region.

    Args:
        features: ``[B, H, W, C]``.
        inst:     ``[B, H, W]`` int instance ids in [0, num_instances).
        num_instances: static upper bound on instance ids.

    Returns:
        ``[B, H, W, C]`` pooled features.
    """
    onehot = jax.nn.one_hot(inst, num_instances, dtype=features.dtype)
    # [B, K, C] sums and counts
    sums = jnp.einsum("bhwk,bhwc->bkc", onehot, features)
    counts = jnp.einsum("bhwk->bk", onehot)[..., None]
    means = sums / jnp.maximum(counts, 1.0)
    return jnp.einsum("bhwk,bkc->bhwc", onehot, means)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (networks.py:287-336), returns all layer feats."""

    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        feats = []
        y = nn.Conv(self.ndf, (4, 4), strides=2, padding=2, name="conv0",
                    kernel_init=conv_init)(x)
        y = nn.leaky_relu(y, 0.2)
        feats.append(y)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            y = nn.Conv(nf, (4, 4), strides=2, padding=2, name=f"conv{n}",
                        kernel_init=conv_init)(y)
            y = nn.leaky_relu(InstanceNorm()(y), 0.2)
            feats.append(y)
        nf = min(nf * 2, 512)
        y = nn.Conv(nf, (4, 4), strides=1, padding=2, name="conv_pre",
                    kernel_init=conv_init)(y)
        y = nn.leaky_relu(InstanceNorm()(y), 0.2)
        feats.append(y)
        y = nn.Conv(1, (4, 4), strides=1, padding=2, name="conv_out",
                    kernel_init=conv_init)(y)
        if self.use_sigmoid:
            y = nn.sigmoid(y)
        feats.append(y)
        return feats


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGAN discriminators over an avg-pool pyramid."""

    ndf: int = 64
    n_layers: int = 3
    num_D: int = 3
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x):
        results = []
        cur = x
        for i in range(self.num_D):
            d = NLayerDiscriminator(
                self.ndf, self.n_layers, self.use_sigmoid,
                name=f"scale{self.num_D - 1 - i}",
            )
            results.append(d(cur))
            if i != self.num_D - 1:
                cur = avg_pool2d(cur, 3, 2, padding=1, count_include_pad=False)
        return results
