"""DINOv2 ViT backbone for the `dino2` extractor family.

The reference's DinoExtractor (videoseal/models/extractor.py:72-110) pulls
`dinov2_vits14`/`dinov2_vitb14` from torch.hub and reads intermediate layers
(`get_intermediate_layers(imgs, reshape=True, n=hook_indices)`), concatenating
the hooked feature maps channel-wise before the PixelDecoder. This is a
TPU-native reimplementation of that backbone: plain pre-norm ViT blocks with
LayerScale, cls token, and bicubically interpolated position embeddings —
no torch.hub, weights convertible from any DINOv2 checkpoint.

Parity oracle: `transformers.Dinov2Model` (same architecture, available
offline) — see tests/test_dino_parity.py.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bicubic


class _Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        b, t, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, self.num_heads, hd), 3, axis=2)
        q, k, v = (a.squeeze(2).transpose(0, 2, 1, 3) for a in (q, k, v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, use_bias=True, name="proj")(y)


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = _Attention(self.dim, self.num_heads, name="attn")(h)
        x = x + self.param("ls1", nn.initializers.ones, (self.dim,)) * h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + self.param("ls2", nn.initializers.ones, (self.dim,)) * h


class DinoViT(nn.Module):
    """DINOv2-style ViT returning concatenated hooked feature maps.

    __call__(x: (B, H, W, 3) in [-1, 1]) -> (B, H/p, W/p, len(hooks)*D),
    matching the reference's `torch.cat(get_intermediate_layers(...), dim=1)`
    (extractor.py:101-107). Hook index i = output of block i (0-based),
    final-norm applied (dinov2 get_intermediate_layers norm=True default).
    """
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    mlp_ratio: float = 4.0
    pos_grid: int = 37  # pretrain grid: 518 / 14
    hook_indices: Sequence[int] = (8, 9, 10, 11)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.pos_grid * self.pos_grid, self.embed_dim))
        pos_patch = pos[:, 1:].reshape(1, self.pos_grid, self.pos_grid,
                                       self.embed_dim)
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            pos_patch = resize_bicubic(pos_patch, gh, gw)
        pos_patch = pos_patch.reshape(1, gh * gw, self.embed_dim)
        x = x + pos_patch
        x = jnp.concatenate([jnp.broadcast_to(cls + pos[:, :1],
                                              (b, 1, self.embed_dim)), x], axis=1)

        hooks = {}
        want = set(int(i) % self.depth for i in self.hook_indices)
        for i in range(self.depth):
            x = _Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                       name=f"blocks_{i}")(x)
            if i in want:
                hooks[i] = x

        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        feats = []
        for i in (int(j) % self.depth for j in self.hook_indices):
            t = norm(hooks[i])[:, 1:]  # drop cls
            feats.append(t.reshape(b, gh, gw, self.embed_dim))
        return jnp.concatenate(feats, axis=-1)


DINO_PRESETS = {
    "dinov2_vits14": dict(embed_dim=384, depth=12, num_heads=6),
    "dinov2_vitb14": dict(embed_dim=768, depth=12, num_heads=12),
}
