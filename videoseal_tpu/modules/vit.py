"""SAM/ViTDet-style image encoder (parity: videoseal/modules/vit.py:14-525).

Used by the `sam_*` extractors (VideoSeal 0.0). Windowed attention with
decomposed relative position bias, global attention at selected depths, and an
optional temporal-attention variant that attends across frames at each spatial
location (vit.py:212-299; frames ride the batch dim).

NHWC throughout; attention is plain einsum — at 256/64 tokens per window XLA
fuses this fine without a custom kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ChannelLayerNorm, gelu_exact
from ..ops.resize import _resize_matrix


def _layer_norm(name):
    return nn.LayerNorm(epsilon=1e-6, name=name)


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Extract (q, k, C) relative embeddings (vit.py:409-439)."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        # linear interpolation, matching F.interpolate(mode='linear')
        m = jnp.asarray(_resize_matrix(rel_pos.shape[0], max_rel_dist, antialias=True))
        rel_pos = m @ rel_pos
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = ((q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)).astype(np.int64)
    return rel_pos[jnp.asarray(rel)]


class Attention(nn.Module):
    """MHA with decomposed rel-pos bias (vit.py:302-357). Input (B, H, W, C)."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: tuple[int, int] | None = None

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, nh, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)          # (b, hw, nh, hd) each
        q = jnp.moveaxis(q, 2, 1)                  # (b, nh, hw, hd)
        k = jnp.moveaxis(k, 2, 1)
        v = jnp.moveaxis(v, 2, 1)
        attn = jnp.einsum("bnqc,bnkc->bnqk", q * (hd ** -0.5), k, precision="highest")
        if self.use_rel_pos:
            rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                                   (2 * self.input_size[0] - 1, hd))
            rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                                   (2 * self.input_size[1] - 1, hd))
            rh = get_rel_pos(h, h, rel_pos_h)      # (h, h, hd)
            rw = get_rel_pos(w, w, rel_pos_w)      # (w, w, hd)
            rq = q.reshape(b, nh, h, w, hd)
            rel_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, rh, precision="highest")
            rel_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, rw, precision="highest")
            attn = attn.reshape(b, nh, h, w, h, w)
            attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
            attn = attn.reshape(b, nh, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnqk,bnkc->bnqc", attn, v, precision="highest")
        out = jnp.moveaxis(out, 1, 2).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class TemporalAttention(nn.Module):
    """Attention ACROSS frames at each spatial location (vit.py:246-299).

    Input (F, H, W, C); the frame axis is the token axis.
    """
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    video_len: int | None = None

    @nn.compact
    def __call__(self, x):
        f, h, w, _ = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(f, h * w, 3, nh, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)          # (f, hw, nh, hd)
        # tokens = frames: bring (hw, nh) to batch
        q = jnp.moveaxis(q, 0, 2).reshape(h * w * nh, f, hd)
        k = jnp.moveaxis(k, 0, 2).reshape(h * w * nh, f, hd)
        v = jnp.moveaxis(v, 0, 2).reshape(h * w * nh, f, hd)
        attn = jnp.einsum("sqc,skc->sqk", q * (hd ** -0.5), k, precision="highest")
        if self.use_rel_pos:
            rel_pos = self.param("rel_pos", nn.initializers.zeros,
                                 (2 * self.video_len - 1, hd))
            r = get_rel_pos(f, f, rel_pos)
            attn = attn + jnp.einsum("sqc,qkc->sqk", q, r, precision="highest")
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("sqk,skc->sqc", attn, v, precision="highest")
        out = out.reshape(h, w, nh, f, hd)
        out = jnp.moveaxis(out, 3, 0).reshape(f, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class MLPBlock(nn.Module):
    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = gelu_exact(x)
        return nn.Dense(self.dim, name="lin2")(x)


def window_partition(x, window_size):
    """(B,H,W,C) -> (B*nw, ws, ws, C) with zero pad (vit.py:360-381)."""
    b, h, w, c = x.shape
    ph = (window_size - h % window_size) % window_size
    pw = (window_size - w % window_size) % window_size
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    x = jnp.moveaxis(x, 2, 3).reshape(-1, window_size, window_size, c)
    return x, (hp, wp)


def window_unpartition(windows, window_size, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(b, hp // window_size, wp // window_size, window_size, window_size, -1)
    x = jnp.moveaxis(x, 3, 2).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class Block(nn.Module):
    """Transformer block w/ optional window attention (vit.py:146-209)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    input_size: tuple[int, int] | None = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = _layer_norm("norm1")(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        size = (self.input_size if self.window_size == 0
                else (self.window_size, self.window_size))
        x = Attention(self.dim, self.num_heads, self.qkv_bias, self.use_rel_pos,
                      input_size=size, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = MLPBlock(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            _layer_norm("norm2")(x))
        return x + y


class TemporalBlock(nn.Module):
    """vit.py:212-243 — note: mlp output REPLACES attn output in the residual
    (x = shortcut + mlp(norm2(attn(norm1(x))))), matching the reference."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = False
    video_len: int | None = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = _layer_norm("norm1")(x)
        x = TemporalAttention(self.dim, self.num_heads, self.qkv_bias,
                              self.use_rel_pos, self.video_len, name="attn")(x)
        x = MLPBlock(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            _layer_norm("norm2")(x))
        return shortcut + x


class ImageEncoderViT(nn.Module):
    """vit.py:14-143."""
    img_size: int = 256
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    global_attn_indexes: Sequence[int] = ()
    temporal_attention: bool = False
    max_temporal_length: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(x)
        grid = self.img_size // p
        if self.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (1, grid, grid, self.embed_dim))
            x = x + pos
            if self.temporal_attention:
                pos_t = self.param("pos_embed_temporal", nn.initializers.zeros,
                                   (self.max_temporal_length, 1, 1, self.embed_dim))
                x = x + pos_t[:x.shape[0]]
        for i in range(self.depth):
            ws = self.window_size if i not in tuple(self.global_attn_indexes) else 0
            x = Block(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                      self.use_rel_pos, ws, input_size=(grid, grid),
                      name=f"block_{i}")(x)
            if self.temporal_attention:
                x = TemporalBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                                  self.qkv_bias, self.use_rel_pos,
                                  video_len=self.max_temporal_length,
                                  name=f"temp_block_{i}")(x)
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (vit.py:108-124)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = ChannelLayerNorm(name="neck_norm1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="neck_conv2")(x)
        x = ChannelLayerNorm(name="neck_norm2")(x)
        return x
