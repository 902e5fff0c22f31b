"""ConvNeXtV2 — the production extractor backbone (videoseal 1.0 / pixelseal /
chunkyseal cards).

Parity with videoseal/modules/convnext.py:21-188. NHWC is the natural layout
here: the reference permutes NCHW->NHWC inside every block for LN/linear work
(convnext.py:44,54); we simply never leave NHWC, so the depthwise 7x7 conv,
LayerNorm, the two pointwise matmuls (MXU), GELU and GRN fuse into one XLA
computation with zero transposes.

Temporal variants: `temporal_convs` inserts a kx1x1 conv over the frame axis
after each downsample conv (convnext.py:60-85); frames ride the batch dim.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ChannelLayerNorm, GRN, get_activation


class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> pw(4x) -> GELU -> GRN -> pw -> residual (convnext.py:21-57).

    With `temporal_attention`, a TemporalBlock (attention across the frame/
    batch axis at each spatial location) runs after pwconv2, inside the
    residual — exactly where the reference inserts temp_block
    (convnext.py:37-39,51-53; heads = dim//48, rel-pos over video_len 32).
    """
    dim: int
    temporal_attention: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, name="dwconv")(x)
        x = ChannelLayerNorm(name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = get_activation("gelu")(x)
        x = GRN(name="grn")(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.temporal_attention:
            from .vit import TemporalBlock
            x = TemporalBlock(self.dim, num_heads=self.dim // 48,
                              use_rel_pos=True, video_len=32,
                              name="temp_block")(x)
        return inp + x


class TemporalConv(nn.Module):
    """k x 1 x 1 conv over the frame (batch) axis (convnext.py:60-85)."""
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        y = x[None]  # (1, F, H, W, C)
        y = nn.Conv(self.features, (k, 1, 1), padding=[(k // 2, k // 2), (0, 0), (0, 0)],
                    use_bias=False, name="conv")(y)
        return y[0]


class StemConv(nn.Module):
    """4x4 stride-{2,4} stem conv, reformulated as space-to-depth + matmul.

    A direct conv with 3 input channels contracts over only 48 values —
    XLA/MXU lowers that an order of magnitude below peak. Space-to-depth
    (exact: stride 4 -> pure 4x4 patches; stride 2 -> 2x2 conv over depth-4C)
    turns it into a dense matmul. The parameter keeps the reference HWIO
    (4, 4, C, D) shape so converted checkpoints are untouched.
    """
    features: int
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(x.dtype)
        bias = bias.astype(x.dtype)
        hh, ww = x.shape[-3], x.shape[-2]
        lead = x.shape[:-3]
        if self.stride == 4 and hh % 4 == 0 and ww % 4 == 0:
            y = x.reshape(lead + (hh // 4, 4, ww // 4, 4, c))
            y = jnp.moveaxis(y, -4, -3)                      # (..., h, w, dy, dx, c)
            y = y.reshape(lead + (hh // 4, ww // 4, 16 * c))
            out = jnp.einsum("...k,kf->...f", y, kernel.reshape(16 * c, self.features))
            return out + bias
        if self.stride == 2 and hh % 2 == 0 and ww % 2 == 0:
            y = x.reshape(lead + (hh // 2, 2, ww // 2, 2, c))
            y = jnp.moveaxis(y, -4, -3)
            y = y.reshape((-1,) + (hh // 2, ww // 2, 4 * c))
            k2 = kernel.reshape(2, 2, 2, 2, c, self.features)
            k2 = jnp.transpose(k2, (0, 2, 1, 3, 4, 5)).reshape(2, 2, 4 * c, self.features)
            dn = jax.lax.conv_dimension_numbers(y.shape, k2.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            out = jax.lax.conv_general_dilated(y, k2, (1, 1), "VALID",
                                               dimension_numbers=dn)
            out = out.reshape(lead + out.shape[1:])
            return out + bias
        # fallback: plain conv
        dn = jax.lax.conv_dimension_numbers(
            ((1,) + x.shape[-3:]), kernel.shape, ("NHWC", "HWIO", "NHWC"))
        flat = x.reshape((-1,) + x.shape[-3:])
        out = jax.lax.conv_general_dilated(flat, kernel,
                                           (self.stride, self.stride), "VALID",
                                           dimension_numbers=dn)
        return out.reshape(lead + out.shape[1:]) + bias


class ConvNeXtV2(nn.Module):
    """4-stage ConvNeXtV2 feature extractor (convnext.py:88-156).

    Returns the final (B, H/32, W/32, dims[-1]) feature map (stem_stride=4;
    for chunkyseal's stem_stride=2 the stem halves instead of quartering).
    """
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    stem_stride: int = 4
    temporal_convs: bool = False
    temporal_attention: bool = False

    @nn.compact
    def __call__(self, x):
        # stem: 4x4 conv stride stem_stride + LN (convnext.py:108-111).
        x = StemConv(self.dims[0], self.stem_stride, name="stem_conv")(x)
        x = ChannelLayerNorm(name="stem_norm")(x)
        for j in range(self.depths[0]):
            x = ConvNeXtBlock(self.dims[0], self.temporal_attention,
                              name=f"stage0_block{j}")(x)
        for i in range(1, 4):
            x = ChannelLayerNorm(name=f"down{i}_norm")(x)
            x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2), padding="VALID",
                        name=f"down{i}_conv")(x)
            if self.temporal_convs:
                x = TemporalConv(self.dims[i], name=f"down{i}_temporal")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], self.temporal_attention,
                                  name=f"stage{i}_block{j}")(x)
        return x


# size presets (convnext.py:158-188)
CONVNEXT_PRESETS = {
    "atto": dict(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320)),
    "femto": dict(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384)),
    "pico": dict(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512)),
    "nano": dict(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640)),
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "huge": dict(depths=(3, 3, 27, 3), dims=(352, 704, 1408, 2816)),
}
