"""Extractor wrappers + builder (parity: videoseal/models/extractor.py:18-213).

An extractor maps [0,1] NHWC images -> (B, 1+nbits) logits (or pixelwise
(B, H, W, 1+nbits)): first channel = detection logit, rest = bit logits.
"""

from __future__ import annotations

import dataclasses
import math

from flax import linen as nn

from ..modules.convnext import ConvNeXtV2
from ..modules.dino import DINO_PRESETS, DinoViT
from ..modules.dvmark import DVMarkDecoder
from ..modules.pixel_decoder import PixelDecoder
from ..modules.hidden import HiddenDecoder
from ..modules.vit import ImageEncoderViT


class ConvnextExtractor(nn.Module):
    """ConvNeXtV2 encoder + PixelDecoder (extractor.py:140-167)."""
    encoder: dict
    pixel_decoder: dict

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = imgs * 2 - 1  # preprocess (extractor.py:25)
        feats = ConvNeXtV2(name="encoder", **self.encoder)(x)
        return PixelDecoder(name="pixel_decoder", **self.pixel_decoder)(feats)


class SegmentationExtractor(nn.Module):
    """SAM-style ViT encoder + PixelDecoder (extractor.py:41-69)."""
    encoder: dict
    pixel_decoder: dict

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = imgs * 2 - 1
        feats = ImageEncoderViT(name="encoder", **self.encoder)(x)
        return PixelDecoder(name="pixel_decoder", **self.pixel_decoder)(feats)


class DinoExtractor(nn.Module):
    """DINOv2 encoder + PixelDecoder (extractor.py:72-110): concatenated
    intermediate-layer feature maps feed the decoder."""
    encoder: dict
    pixel_decoder: dict

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = imgs * 2 - 1
        feats = DinoViT(name="encoder", **self.encoder)(x)
        return PixelDecoder(name="pixel_decoder", **self.pixel_decoder)(feats)


class DVMarkExtractor(nn.Module):
    """DVMark 3D-conv decoder. The reference registers the raw decoder with
    no [-1,1] preprocess (extractor.py:209-210) — matched here."""
    nbits: int

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        return DVMarkDecoder(num_bits=self.nbits, name="dvmark_decoder")(imgs, train)


class HiddenExtractor(nn.Module):
    """HiDDeN decoder (extractor.py:113-137)."""
    cfg: dict

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = imgs * 2 - 1
        return HiddenDecoder(name="hidden_decoder", **self.cfg)(x, train)


@dataclasses.dataclass
class ExtractorSpec:
    module: nn.Module
    nbits: int
    pixelwise: bool


def build_extractor(name: str, cfg: dict, img_size: int, nbits: int) -> ExtractorSpec:
    """Registry keyed by name prefix (extractor.py:170-213)."""
    cfg = {k: dict(v) if isinstance(v, dict) else v for k, v in (cfg or {}).items()}
    if name.startswith("convnext"):
        enc = cfg.get("encoder", {})
        pd = cfg.get("pixel_decoder", {})
        pd["nbits"] = nbits
        if cfg.get("proportional_dim", False):
            # ChunkySeal: scale dims by sqrt(nbits/128) (extractor.py:193-198)
            mult = math.sqrt(nbits / 128)
            enc["dims"] = [int(d * mult) for d in enc["dims"]]
        pd["embed_dim"] = enc.get("dims", (96, 192, 384, 768))[-1]
        module = ConvnextExtractor(encoder=enc, pixel_decoder=pd)
        return ExtractorSpec(module, nbits, pd.get("pixelwise", False))
    if name.startswith("sam"):
        enc = cfg.get("encoder", {})
        enc["img_size"] = img_size
        pd = cfg.get("pixel_decoder", {})
        pd["nbits"] = nbits
        pd.setdefault("embed_dim", enc.get("out_chans", 256))
        module = SegmentationExtractor(encoder=enc, pixel_decoder=pd)
        return ExtractorSpec(module, nbits, pd.get("pixelwise", False))
    if name.startswith("dino2"):
        enc = cfg.get("encoder", {})
        preset = dict(DINO_PRESETS[enc.get("name", "dinov2_vits14")])
        hooks = tuple(enc.get("hook_indices", (8, 9, 10, 11)))
        preset["hook_indices"] = hooks
        pd = cfg.get("pixel_decoder", {})
        pd["nbits"] = nbits
        pd.setdefault("embed_dim", len(hooks) * preset["embed_dim"])
        module = DinoExtractor(encoder=preset, pixel_decoder=pd)
        return ExtractorSpec(module, nbits, pd.get("pixelwise", False))
    if name.startswith("hidden"):
        cfg["num_bits"] = nbits
        module = HiddenExtractor(cfg=cfg)
        return ExtractorSpec(module, nbits, cfg.get("pixelwise", False))
    if name.startswith("dvmark"):
        module = DVMarkExtractor(nbits=nbits)
        return ExtractorSpec(module, nbits, False)
    raise NotImplementedError(f"Extractor {name} not implemented")
