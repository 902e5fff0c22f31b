"""Taming-transformers style VAE encoder/decoder (videoseal/modules/vae.py).

Used by the `vae_*` embedder family (VideoSeal 0.0-era alternative embedder).
Parity notes: GroupNorm(16, eps 1e-6), swish nonlinearity, nearest 2x upsample
in the decoder, zero-padded asymmetric (0,1,0,1) stride-2 downsample conv
(vae.py:37-52), optional vanilla/linear attention at given resolutions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _normalize(name):
    return nn.GroupNorm(num_groups=16, epsilon=1e-6, name=name)


class VAEResnetBlock(nn.Module):
    """vae.py:74-115 (temb unused: temb_ch=0 in both encoder/decoder)."""
    out_channels: int
    conv_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = _normalize("norm1")(x)
        h = _swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv1")(h)
        h = _normalize("norm2")(h)
        h = _swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(h)
        if in_channels != self.out_channels:
            if self.conv_shortcut:
                x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                            name="conv_shortcut")(x)
            else:
                x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions (vae.py:124-159)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _normalize("norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(y).reshape(b, h * w, c)
        att = jnp.einsum("bic,bjc->bij", q, k, precision="highest") * (c ** -0.5)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bij,bjc->bic", att, v, precision="highest").reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), name="proj_out")(out)
        return x + out


class VAEEncoder(nn.Module):
    """vae.py:172-265."""
    ch: int
    out_ch: int
    num_res_blocks: int
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 4
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    attn_resolutions: Sequence[int] = ()
    double_z: bool = True

    @nn.compact
    def __call__(self, x):
        num_res = len(self.ch_mult)
        h = nn.Conv(self.ch, (3, 3), padding=[(1, 1), (1, 1)], name="conv_in")(x)
        curr_res = self.resolution
        for i_level in range(num_res):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = VAEResnetBlock(block_out, name=f"down_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_res - 1:
                # zero pad (0,1,0,1) + stride-2 valid conv (vae.py:45-49)
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down_{i_level}_downsample")(hp)
                curr_res //= 2
        h = VAEResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h) if curr_res in self.attn_resolutions else h
        h = VAEResnetBlock(h.shape[-1], name="mid_block_2")(h)
        h = _normalize("norm_out")(h)
        h = _swish(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_c, (3, 3), padding=[(1, 1), (1, 1)], name="conv_out")(h)


class VAEDecoder(nn.Module):
    """vae.py:268-374."""
    ch: int
    out_ch: int
    num_res_blocks: int
    resolution: int = 256
    z_channels: int = 4
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    attn_resolutions: Sequence[int] = ()
    tanh_out: bool = False
    bw: bool = False

    @nn.compact
    def __call__(self, z):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)
        h = nn.Conv(block_in, (3, 3), padding=[(1, 1), (1, 1)], name="conv_in")(z)
        h = VAEResnetBlock(block_in, name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1")(h) if curr_res in self.attn_resolutions else h
        h = VAEResnetBlock(block_in, name="mid_block_2")(h)
        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(block_out, name=f"up_{i_level}_block_{i_block}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=-3), 2, axis=-2)  # nearest 2x
                h = nn.Conv(h.shape[-1], (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = _normalize("norm_out")(h)
        h = _swish(h)
        out_c = 1 if self.bw else self.out_ch
        h = nn.Conv(out_c, (3, 3), padding=[(1, 1), (1, 1)], name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        if self.bw:
            h = jnp.tile(h, (1,) * (h.ndim - 1) + (3,))
        return h
