"""UNetMsg — the production watermark embedder (all four model-zoo cards).

Architecture parity with videoseal/modules/unet.py:17-220:
  inc ResnetBlock -> DBlocks (stride-2 3x3 conv + ResnetBlock) -> message
  concat at the bottleneck -> num_blocks ResnetBlocks -> UBlocks (2x bilinear
  upsample block + ResnetBlock) with skip concats scaled by 2^-0.5 -> 1x1 conv
  [-> tanh].

TPU-first: NHWC, pure linen; frames ride the batch dimension so a video chunk
is a single batched XLA program. Temporal variants (conv3d / conv2p1d used by
the 2D->2+1D inflation script, unet.py:125,139) plug in via `conv_layer`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import Norm, Upsample, Downsample, get_activation, get_conv_op
from .msg_processor import MsgProcessor


class ResnetBlock(nn.Module):
    """2 x (conv-norm-act) + 1x1 residual conv (unet.py:17-55)."""
    features: int
    activation: str
    normalization: str
    conv_layer: str = "conv2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation)
        conv_op = get_conv_op(self.conv_layer)
        h = conv_op(self.features, 3, use_bias=False, name="conv1")(x)
        h = Norm(self.normalization, name="norm1")(h, train)
        h = act(h)
        h = conv_op(self.features, 3, use_bias=False, name="conv2")(h)
        h = Norm(self.normalization, name="norm2")(h, train)
        h = act(h)
        res = conv_op(self.features, 1, name="res_conv")(x)
        return h + res


class DBlock(nn.Module):
    """Stride-2 downsample + ResnetBlock (unet.py:71-84)."""
    features: int
    activation: str
    normalization: str
    downsampling_type: str = "bilinear"
    conv_layer: str = "conv2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.downsampling_type == "bilinear":
            x = nn.Conv(self.features, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        name="down")(x)
        else:
            x = Downsample(self.features, get_activation(self.activation), name="down")(x)
        return ResnetBlock(self.features, self.activation, self.normalization,
                           self.conv_layer, name="conv")(x, train)


class UBlock(nn.Module):
    """2x upsample block + ResnetBlock (unet.py:58-68)."""
    features: int
    activation: str
    normalization: str
    upsampling_type: str = "bilinear"
    conv_layer: str = "conv2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Upsample(self.upsampling_type, self.features, 2,
                     get_activation(self.activation), name="up")(x)
        return ResnetBlock(self.features, self.activation, self.normalization,
                           self.conv_layer, name="conv")(x, train)


class UNetMsg(nn.Module):
    """Message-conditioned UNet (unet.py:110-197). Input NHWC in [-1, 1]."""
    nbits: int
    hidden_size: int
    in_channels: int = 3
    out_channels: int = 3
    z_channels: int = 16
    num_blocks: int = 8
    activation: str = "relu"
    normalization: str = "batch"
    z_channels_mults: Sequence[int] = (1, 2, 4, 8)
    upsampling_type: str = "bilinear"
    downsampling_type: str = "bilinear"
    last_tanh: bool = True
    msg_processor_type: str = "binary+concat"
    conv_layer: str = "conv2d"

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, msgs: jnp.ndarray, train: bool = False):
        zc = [self.z_channels * m for m in self.z_channels_mults]
        kw = dict(activation=self.activation, normalization=self.normalization,
                  conv_layer=self.conv_layer)

        x = ResnetBlock(zc[0], name="inc", **kw)(imgs, train)
        hiddens = [x]
        for i in range(len(zc) - 1):
            hiddens.append(
                DBlock(zc[i + 1], downsampling_type=self.downsampling_type,
                       name=f"downs_{i}", **kw)(hiddens[-1], train))

        # message injection at lowest resolution (unet.py:154-157,183); the
        # msg-concat latent replaces the last hidden, so it is ALSO the first
        # skip connection consumed by the upward path (unet.py:183-190)
        x = MsgProcessor(self.nbits, self.hidden_size, self.msg_processor_type,
                         name="msg_processor")(hiddens.pop(), msgs)
        hiddens.append(x)
        bott = zc[-1] + self.hidden_size
        for j in range(self.num_blocks):
            x = ResnetBlock(bott, name=f"bottleneck_{j}", **kw)(x, train)

        scale = 2 ** -0.5  # skip-connection scaling (unet.py:135,187-188)
        for i, ii in enumerate(reversed(range(len(zc) - 1))):
            x = jnp.concatenate([x, hiddens.pop() * scale], axis=-1)
            x = UBlock(zc[ii], upsampling_type=self.upsampling_type,
                       name=f"ups_{i}", **kw)(x, train)

        logits = nn.Conv(self.out_channels, (1, 1), name="outc")(x)
        if self.last_tanh:
            logits = jnp.tanh(logits)
        return logits
