"""PixelDecoder head: feature map -> (1 + nbits) logits.

Parity with videoseal/modules/pixel_decoder.py:15-83: a stack of Upsample
blocks, then either a global mean-pool + Dense (whole-image message) or a 1x1
conv (pixelwise mask + per-pixel message map, PixelSeal-style localization).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import Upsample, get_activation


class PixelDecoder(nn.Module):
    embed_dim: int
    nbits: int = 0
    upscale_stages: Sequence[int] = (4, 2, 2)
    upscale_type: str = "bilinear"
    sigmoid_output: bool = False
    pixelwise: bool = False

    @nn.compact
    def __call__(self, x):
        dim = self.embed_dim
        act = get_activation("gelu")
        for i, f in enumerate(self.upscale_stages):
            dim //= f
            x = Upsample(self.upscale_type, dim, f, act, name=f"up_{i}")(x)
        if self.pixelwise:
            preds = nn.Conv(self.nbits + 1, (1, 1), name="linear")(x)  # (B,H,W,1+nbits)
        else:
            x = jnp.mean(x, axis=(-3, -2))  # (B, C)
            preds = nn.Dense(self.nbits + 1, name="linear")(x)  # (B, 1+nbits)
        if self.sigmoid_output:
            preds = jax.nn.sigmoid(preds)
        return preds
