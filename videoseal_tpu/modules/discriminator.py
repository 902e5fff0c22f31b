"""Discriminators for GAN training (videoseal/modules/discriminator.py:89-209).

NLayerDiscriminator: PatchGAN with GroupNorm(4) (the training default).
UNetDiscriminatorSN exists in the reference but is unused by default; the
spectral-norm variant is provided without SN power iteration (documented
deviation — reference default never instantiates it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.color import rgb_to_yuv


class NLayerDiscriminator(nn.Module):
    """PatchGAN (discriminator.py:89-148). Input NHWC in [0,1]-ish."""
    input_nc: int = 3
    ndf: int = 32
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.input_nc == 1 and x.shape[-1] == 3:
            x = rgb_to_yuv(x)[..., 0:1]  # Y-mode (discriminator.py:143-148)
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    name="conv0")(x)
        x = lrelu(x)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=True, name=f"conv{n}")(x)
            x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name=f"norm{n}")(x)
            x = lrelu(x)
        nf = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=[(1, 1), (1, 1)],
                    use_bias=True, name=f"conv{self.n_layers}")(x)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name=f"norm{self.n_layers}")(x)
        x = lrelu(x)
        return nn.Conv(1, (4, 4), padding=[(1, 1), (1, 1)], name="conv_out")(x)


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (discriminator.py:17-86).

    In the reference, ActNorm initializes scale/bias from the first batch's
    statistics; here init uses the init-time batch the same way (flax init
    sees real data when initialized with a representative batch)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]

        def loc_init(key, shape, dtype=jnp.float32):
            return -jnp.mean(x, axis=tuple(range(x.ndim - 1))).astype(dtype)

        def scale_init(key, shape, dtype=jnp.float32):
            std = jnp.std(x, axis=tuple(range(x.ndim - 1)))
            return (1.0 / (std + 1e-6)).astype(dtype)

        loc = self.param("loc", loc_init, (c,))
        scale = self.param("scale", scale_init, (c,))
        return scale * (x + loc)


class UNetDiscriminatorSN(nn.Module):
    """U-Net discriminator (Real-ESRGAN style, discriminator.py:151-209).

    The reference wraps convs in spectral norm; flax provides nn.SpectralNorm,
    applied here to the same conv set. Unused by the default training recipe
    (the reference never instantiates it by default) but provided for parity.
    """
    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.resize import resize_bilinear
        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)

        def sn_conv(features, kernel, stride, name, use_bias=False):
            conv = nn.Conv(features, kernel, strides=stride, padding="SAME",
                           use_bias=use_bias, name=name)
            return nn.SpectralNorm(conv)

        nf = self.num_feat
        x0 = lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv0")(x))
        x1 = lrelu(sn_conv(nf * 2, (4, 4), (2, 2), "conv1")(
            x0, update_stats=train))
        x2 = lrelu(sn_conv(nf * 4, (4, 4), (2, 2), "conv2")(
            x1, update_stats=train))
        x3 = lrelu(sn_conv(nf * 8, (4, 4), (2, 2), "conv3")(
            x2, update_stats=train))
        x3 = resize_bilinear(x3, x3.shape[-3] * 2, x3.shape[-2] * 2,
                             antialias=False)
        x4 = lrelu(sn_conv(nf * 4, (3, 3), (1, 1), "conv4")(
            x3, update_stats=train))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = resize_bilinear(x4, x4.shape[-3] * 2, x4.shape[-2] * 2,
                             antialias=False)
        x5 = lrelu(sn_conv(nf * 2, (3, 3), (1, 1), "conv5")(
            x4, update_stats=train))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = resize_bilinear(x5, x5.shape[-3] * 2, x5.shape[-2] * 2,
                             antialias=False)
        x6 = lrelu(sn_conv(nf, (3, 3), (1, 1), "conv6")(x5, update_stats=train))
        if self.skip_connection:
            x6 = x6 + x0
        out = lrelu(sn_conv(nf, (3, 3), (1, 1), "conv7")(x6, update_stats=train))
        out = lrelu(sn_conv(nf, (3, 3), (1, 1), "conv8")(out, update_stats=train))
        return nn.Conv(1, (3, 3), padding="SAME", name="conv9")(out)
