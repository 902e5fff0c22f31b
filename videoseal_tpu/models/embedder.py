"""Embedder wrappers + builder (parity: videoseal/models/embedder.py:16-282).

An embedder maps ([0,1] NHWC images, (B,nbits) messages) -> watermark
prediction in [-1,1] (the x*2-1 preprocess of embedder.py:23 lives inside).
`build_embedder(name, cfg, nbits, hidden_size_multiplier)` mirrors the
reference registry: name prefixes select the architecture, 'yuv' in the name
marks single-channel luminance processing (embedder.py:243-282).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..modules.unet import UNetMsg
from ..modules.hidden import HiddenEncoder
from ..modules.vae import VAEEncoder, VAEDecoder
from ..modules.msg_processor import MsgProcessor


class UnetEmbedder(nn.Module):
    """UNetMsg embedder (embedder.py:130-165)."""
    nbits: int
    hidden_size: int
    unet: dict

    @nn.compact
    def __call__(self, imgs, msgs, train: bool = False):
        x = imgs * 2 - 1  # preprocess (embedder.py:23)
        return UNetMsg(nbits=self.nbits, hidden_size=self.hidden_size,
                       name="unet", **self.unet)(x, msgs, train)


class VAEEmbedder(nn.Module):
    """VAE encoder -> msg concat in latent -> decoder (embedder.py:50-89)."""
    nbits: int
    hidden_size: int
    encoder: dict
    decoder: dict
    msg_processor_type: str = "binary+concat"

    @nn.compact
    def __call__(self, imgs, msgs, train: bool = False):
        x = imgs * 2 - 1
        z = VAEEncoder(name="encoder", **self.encoder)(x)
        z = MsgProcessor(self.nbits, self.hidden_size, self.msg_processor_type,
                         name="msg_processor")(z, msgs)
        return VAEDecoder(name="decoder", **self.decoder)(z)


class HiddenEmbedder(nn.Module):
    """HiDDeN encoder (embedder.py:168-203); msgs mapped to ±1 inside."""
    nbits: int
    num_blocks: int = 4
    channels: int = 64
    last_tanh: bool = True

    @nn.compact
    def __call__(self, imgs, msgs, train: bool = False):
        x = imgs * 2 - 1
        m = 2 * msgs.astype(jnp.float32) - 1
        return HiddenEncoder(num_bits=self.nbits, num_blocks=self.num_blocks,
                             channels=self.channels, last_tanh=self.last_tanh,
                             name="hidden_encoder")(x, m)


class DVMarkEmbedder(nn.Module):
    """DVMark 3D-conv encoder (embedder.py:206-240); preprocess x2-1 inside."""
    nbits: int

    @nn.compact
    def __call__(self, imgs, msgs, train: bool = False):
        x = imgs * 2 - 1
        from ..modules.dvmark import DVMarkEncoder
        return DVMarkEncoder(num_bits=self.nbits, name="dvmark_encoder")(x, msgs, train)


@dataclasses.dataclass
class EmbedderSpec:
    """Build result: module + metadata the pipeline needs."""
    module: nn.Module
    yuv: bool
    nbits: int
    out_channels: int


def build_embedder(name: str, cfg: dict, nbits: int,
                   hidden_size_multiplier: float = 2.0) -> EmbedderSpec:
    """Registry keyed by name prefix (embedder.py:243-282)."""
    hidden_size = int(nbits * hidden_size_multiplier)
    cfg = dict(cfg or {})
    if name.startswith("unet"):
        unet = dict(cfg.get("unet", {}))
        mp = cfg.get("msg_processor", {})
        if "msg_processor_type" in mp:
            unet.setdefault("msg_processor_type", mp["msg_processor_type"])
        out_c = unet.get("out_channels", 3)
        module = UnetEmbedder(nbits=nbits, hidden_size=hidden_size, unet=unet)
    elif name.startswith("vae"):
        enc = dict(cfg.get("encoder", {}))
        dec = dict(cfg.get("decoder", {}))
        dec["z_channels"] = hidden_size + enc.get("z_channels", 4)
        out_c = dec.get("out_ch", 3)
        module = VAEEmbedder(nbits=nbits, hidden_size=hidden_size, encoder=enc, decoder=dec,
                             msg_processor_type=cfg.get("msg_processor", {}).get(
                                 "msg_processor_type", "binary+concat"))
    elif name.startswith("hidden"):
        out_c = 3
        module = HiddenEmbedder(nbits=nbits, **cfg)
    elif name.startswith("dvmark"):
        out_c = 3
        module = DVMarkEmbedder(nbits=nbits)
    else:
        raise NotImplementedError(f"Embedder {name} not implemented")
    return EmbedderSpec(module=module, yuv="yuv" in name, nbits=nbits, out_channels=out_c)
