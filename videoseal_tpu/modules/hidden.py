"""HiDDeN encoder/decoder (parity: videoseal/modules/hidden.py:12-121).

The classic watermarking baseline: stacks of conv-norm-act blocks; the encoder
tiles the message spatially and concatenates [msgs, features, image].
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import Norm, get_activation


class ConvBNRelu(nn.Module):
    """3x3 conv -> norm -> act (hidden.py:12-27)."""
    features: int
    activation: str
    normalization: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], name="conv")(x)
        x = Norm(self.normalization, name="norm")(x, train)
        return get_activation(self.activation)(x)


class HiddenEncoder(nn.Module):
    """hidden.py:30-79. imgs in [-1,1], msgs already mapped to ±1 by caller."""
    num_blocks: int
    num_bits: int
    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 64
    activation: str = "gelu"
    normalization: str = "layer"
    last_tanh: bool = True

    @nn.compact
    def __call__(self, imgs, msgs, train: bool = False):
        x = imgs
        for i in range(self.num_blocks):
            x = ConvBNRelu(self.z_channels, self.activation, self.normalization,
                           name=f"conv_bns_{i}")(x, train)
        m = msgs[:, None, None, :] * jnp.ones(imgs.shape[:-1] + (1,), imgs.dtype)
        concat = jnp.concatenate([m, x, imgs], axis=-1)
        x = ConvBNRelu(self.z_channels, self.activation, self.normalization,
                       name="after_concat_layer")(concat, train)
        x = nn.Conv(self.out_channels, (1, 1), name="final_layer")(x)
        if self.last_tanh:
            x = jnp.tanh(x)
        return x


class HiddenDecoder(nn.Module):
    """hidden.py:82-121."""
    num_blocks: int
    num_bits: int
    in_channels: int = 3
    z_channels: int = 64
    activation: str = "gelu"
    normalization: str = "layer"
    pixelwise: bool = False

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = imgs
        for i in range(self.num_blocks + 1):
            x = ConvBNRelu(self.z_channels, self.activation, self.normalization,
                           name=f"layers_{i}")(x, train)
        if self.pixelwise:
            return nn.Conv(self.num_bits + 1, (1, 1), name="linear")(x)
        x = jnp.mean(x, axis=(-3, -2))
        return nn.Dense(self.num_bits + 1, name="linear")(x)
