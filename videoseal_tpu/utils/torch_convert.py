"""Convert reference (PyTorch) VideoSeal checkpoints -> videoseal_tpu params.

Maps the reference's state_dict names (videoseal/modules/{unet,convnext,
pixel_decoder,msg_processor}.py) onto this framework's flax param trees.
Works on plain numpy dicts, so `torch` is only needed to open ``.pth`` files.

Layout rules:
  Conv2d  (O,I,kh,kw)        -> HWIO (kh,kw,I,O)
  Conv3d  (O,I,kt,kh,kw)     -> (kt,kh,kw,I,O)
  Linear  (O,I)              -> (I,O)
  BatchNorm weight/bias      -> params scale/bias; running stats -> batch_stats
  ChanRMSNorm gamma (C,1,1)  -> (C,)
  GRN gamma/beta (1,1,1,D)   -> (D,)
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _c2d(w):  # torch conv2d -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _c3d(w):
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _lin(w):
    return np.transpose(np.asarray(w), (1, 0))


def _set(tree: dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Open a reference .pth (train-style dict with 'model' key, or raw sd)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k.removeprefix("module."): v.numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# norm helper — reference norm submodule -> our Norm wrapper subtree
# ---------------------------------------------------------------------------

def _convert_norm(sd: Mapping[str, Any], prefix: str, kind: str,
                  params: dict, stats: dict, out_path: str):
    if kind.startswith("batch"):
        _set(params, f"{out_path}/bn/scale", sd[f"{prefix}.weight"])
        _set(params, f"{out_path}/bn/bias", sd[f"{prefix}.bias"])
        _set(stats, f"{out_path}/bn/mean", sd[f"{prefix}.running_mean"])
        _set(stats, f"{out_path}/bn/var", sd[f"{prefix}.running_var"])
    elif kind.startswith("group"):
        _set(params, f"{out_path}/gn/scale", sd[f"{prefix}.weight"])
        _set(params, f"{out_path}/gn/bias", sd[f"{prefix}.bias"])
    elif kind.startswith("layer"):
        _set(params, f"{out_path}/ln/weight", sd[f"{prefix}.weight"])
        _set(params, f"{out_path}/ln/bias", sd[f"{prefix}.bias"])
    elif kind.startswith("rms"):
        _set(params, f"{out_path}/rms/gamma", np.asarray(sd[f"{prefix}.gamma"]).reshape(-1))
    else:
        raise NotImplementedError(kind)


def _convert_conv_op(sd, prefix, params, out_path, conv_layer="conv2d"):
    """Reference conv (possibly Conv3dWrapper/Conv2p1dWrapper) -> our Conv*Op."""
    if conv_layer == "conv2d":
        _set(params, f"{out_path}/conv/kernel", _c2d(sd[f"{prefix}.weight"]))
        if f"{prefix}.bias" in sd:
            _set(params, f"{out_path}/conv/bias", sd[f"{prefix}.bias"])
    elif conv_layer == "conv3d":
        _set(params, f"{out_path}/conv/kernel", _c3d(sd[f"{prefix}.conv.weight"]))
        if f"{prefix}.conv.bias" in sd:
            _set(params, f"{out_path}/conv/bias", sd[f"{prefix}.conv.bias"])
    elif conv_layer == "conv2p1d":
        _set(params, f"{out_path}/spatial/conv/kernel", _c2d(sd[f"{prefix}.conv.weight"]))
        if f"{prefix}.conv.bias" in sd:
            _set(params, f"{out_path}/spatial/conv/bias", sd[f"{prefix}.conv.bias"])
        if f"{prefix}.temp_conv.weight" in sd:
            _set(params, f"{out_path}/temporal/kernel", _c3d(sd[f"{prefix}.temp_conv.weight"]))
    else:
        raise NotImplementedError(conv_layer)


def _convert_resnet_block(sd, prefix, norm, params, stats, out_path, conv_layer="conv2d"):
    """unet.py:17-55 ResnetBlock."""
    _convert_conv_op(sd, f"{prefix}.double_conv.0", params, f"{out_path}/conv1", conv_layer)
    _convert_norm(sd, f"{prefix}.double_conv.1", norm, params, stats, f"{out_path}/norm1")
    _convert_conv_op(sd, f"{prefix}.double_conv.3", params, f"{out_path}/conv2", conv_layer)
    _convert_norm(sd, f"{prefix}.double_conv.4", norm, params, stats, f"{out_path}/norm2")
    _convert_conv_op(sd, f"{prefix}.res_conv", params, f"{out_path}/res_conv", conv_layer)


def _convert_upsample(sd, prefix, params, out_path, upscale_type="bilinear"):
    """common.py:13-84 Upsample block."""
    if upscale_type in ("nearest", "bilinear"):
        conv_i, norm_i = 2, 3
    elif upscale_type == "conv":
        conv_i, norm_i = 0, 1
    elif upscale_type == "pixelshuffle":
        conv_i, norm_i = 0, 1
    else:
        raise NotImplementedError(upscale_type)
    w = sd[f"{prefix}.upsample_block.{conv_i}.weight"]
    if upscale_type == "conv":  # ConvTranspose2d (I,O,kh,kw) -> flax (kh,kw,I,O)
        _set(params, f"{out_path}/conv/kernel", np.transpose(np.asarray(w), (2, 3, 0, 1)))
    else:
        _set(params, f"{out_path}/conv/kernel", _c2d(w))
    if f"{prefix}.upsample_block.{conv_i}.bias" in sd:
        _set(params, f"{out_path}/conv/bias", sd[f"{prefix}.upsample_block.{conv_i}.bias"])
    _set(params, f"{out_path}/norm/weight", sd[f"{prefix}.upsample_block.{norm_i}.weight"])
    _set(params, f"{out_path}/norm/bias", sd[f"{prefix}.upsample_block.{norm_i}.bias"])


# ---------------------------------------------------------------------------
# module converters
# ---------------------------------------------------------------------------

def convert_unet_msg(sd: Mapping[str, Any], *, normalization: str,
                     n_levels: int, num_blocks: int, prefix: str = "",
                     conv_layer: str = "conv2d",
                     upsampling_type: str = "bilinear") -> dict:
    """Reference UNetMsg state_dict -> {'params':..., 'batch_stats':...}.

    n_levels = len(z_channels_mults); num_blocks = bottleneck depth.
    """
    p, s = {}, {}
    _set(p, "msg_processor/msg_embeddings", sd[f"{prefix}msg_processor.msg_embeddings.weight"])
    _convert_resnet_block(sd, f"{prefix}inc", normalization, p, s, "inc", conv_layer)
    for i in range(n_levels - 1):
        _set(p, f"downs_{i}/down/kernel", _c2d(sd[f"{prefix}downs.{i}.down.weight"]))
        _set(p, f"downs_{i}/down/bias", sd[f"{prefix}downs.{i}.down.bias"])
        _convert_resnet_block(sd, f"{prefix}downs.{i}.conv", normalization, p, s,
                              f"downs_{i}/conv", conv_layer)
    for j in range(num_blocks):
        _convert_resnet_block(sd, f"{prefix}bottleneck.model.{j}", normalization, p, s,
                              f"bottleneck_{j}", conv_layer)
    for i in range(n_levels - 1):
        _convert_upsample(sd, f"{prefix}ups.{i}.up", p, f"ups_{i}/up", upsampling_type)
        _convert_resnet_block(sd, f"{prefix}ups.{i}.conv", normalization, p, s,
                              f"ups_{i}/conv", conv_layer)
    _set(p, "outc/kernel", _c2d(sd[f"{prefix}outc.weight"]))
    _set(p, "outc/bias", sd[f"{prefix}outc.bias"])
    out = {"params": p}
    if normalization.startswith("batch"):
        out["batch_stats"] = s
    return out


def _convert_temporal_block(sd: Mapping[str, Any], t2: str, p: dict, o2: str):
    """Reference TemporalBlock (vit.py:212-243) -> flax TemporalBlock params."""
    for n in ("norm1", "norm2"):
        _set(p, f"{o2}/{n}/scale", sd[f"{t2}.{n}.weight"])
        _set(p, f"{o2}/{n}/bias", sd[f"{t2}.{n}.bias"])
    _set(p, f"{o2}/attn/qkv/kernel", _lin(sd[f"{t2}.attn.qkv.weight"]))
    if f"{t2}.attn.qkv.bias" in sd:
        _set(p, f"{o2}/attn/qkv/bias", sd[f"{t2}.attn.qkv.bias"])
    _set(p, f"{o2}/attn/proj/kernel", _lin(sd[f"{t2}.attn.proj.weight"]))
    _set(p, f"{o2}/attn/proj/bias", sd[f"{t2}.attn.proj.bias"])
    if f"{t2}.attn.rel_pos" in sd:
        _set(p, f"{o2}/attn/rel_pos", sd[f"{t2}.attn.rel_pos"])
    _set(p, f"{o2}/mlp/lin1/kernel", _lin(sd[f"{t2}.mlp.lin1.weight"]))
    _set(p, f"{o2}/mlp/lin1/bias", sd[f"{t2}.mlp.lin1.bias"])
    _set(p, f"{o2}/mlp/lin2/kernel", _lin(sd[f"{t2}.mlp.lin2.weight"]))
    _set(p, f"{o2}/mlp/lin2/bias", sd[f"{t2}.mlp.lin2.bias"])


def convert_convnext(sd: Mapping[str, Any], *, depths, prefix: str = "",
                     temporal_convs: bool = False) -> dict:
    """Reference ConvNeXtV2 state_dict -> params tree (convnext.py:88-156)."""
    p = {}
    _set(p, "stem_conv/kernel", _c2d(sd[f"{prefix}downsample_layers.0.0.weight"]))
    _set(p, "stem_conv/bias", sd[f"{prefix}downsample_layers.0.0.bias"])
    _set(p, "stem_norm/weight", sd[f"{prefix}downsample_layers.0.1.weight"])
    _set(p, "stem_norm/bias", sd[f"{prefix}downsample_layers.0.1.bias"])
    for i in range(1, 4):
        _set(p, f"down{i}_norm/weight", sd[f"{prefix}downsample_layers.{i}.0.weight"])
        _set(p, f"down{i}_norm/bias", sd[f"{prefix}downsample_layers.{i}.0.bias"])
        if temporal_convs:
            _set(p, f"down{i}_conv/kernel", _c2d(sd[f"{prefix}downsample_layers.{i}.1.conv.weight"]))
            _set(p, f"down{i}_conv/bias", sd[f"{prefix}downsample_layers.{i}.1.conv.bias"])
            _set(p, f"down{i}_temporal/conv/kernel",
                 _c3d(sd[f"{prefix}downsample_layers.{i}.1.temp_conv.weight"]))
        else:
            _set(p, f"down{i}_conv/kernel", _c2d(sd[f"{prefix}downsample_layers.{i}.1.weight"]))
            _set(p, f"down{i}_conv/bias", sd[f"{prefix}downsample_layers.{i}.1.bias"])
    for i in range(4):
        for j in range(depths[i]):
            t = f"{prefix}stages.{i}.{j}"
            o = f"stage{i}_block{j}"
            _set(p, f"{o}/dwconv/kernel", _c2d(sd[f"{t}.dwconv.weight"]))
            _set(p, f"{o}/dwconv/bias", sd[f"{t}.dwconv.bias"])
            _set(p, f"{o}/norm/weight", sd[f"{t}.norm.weight"])
            _set(p, f"{o}/norm/bias", sd[f"{t}.norm.bias"])
            _set(p, f"{o}/pwconv1/kernel", _lin(sd[f"{t}.pwconv1.weight"]))
            _set(p, f"{o}/pwconv1/bias", sd[f"{t}.pwconv1.bias"])
            _set(p, f"{o}/grn/gamma", np.asarray(sd[f"{t}.grn.gamma"]).reshape(-1))
            _set(p, f"{o}/grn/beta", np.asarray(sd[f"{t}.grn.beta"]).reshape(-1))
            _set(p, f"{o}/pwconv2/kernel", _lin(sd[f"{t}.pwconv2.weight"]))
            _set(p, f"{o}/pwconv2/bias", sd[f"{t}.pwconv2.bias"])
            if f"{t}.temp_block.norm1.weight" in sd:  # per-block temporal attn
                _convert_temporal_block(sd, f"{t}.temp_block", p, f"{o}/temp_block")
    return {"params": p}


def convert_pixel_decoder(sd: Mapping[str, Any], *, n_stages: int, pixelwise: bool,
                          prefix: str = "", upscale_type: str = "bilinear") -> dict:
    """pixel_decoder.py:15-83."""
    p = {}
    for i in range(n_stages):
        _convert_upsample(sd, f"{prefix}output_upscaling.{i}", p, f"up_{i}", upscale_type)
    w = sd[f"{prefix}linear.weight"]
    _set(p, "linear/kernel", _c2d(w) if pixelwise else _lin(w))
    _set(p, "linear/bias", sd[f"{prefix}linear.bias"])
    return {"params": p}


# ---------------------------------------------------------------------------
# full-model conversion from a model card + reference checkpoint
# ---------------------------------------------------------------------------

def _nest(variables: dict, name: str) -> dict:
    """Wrap each collection's tree under a submodule name."""
    return {coll: {name: sub} for coll, sub in variables.items()}


def convert_model(sd: Mapping[str, Any], card: dict) -> tuple[dict, dict]:
    """Reference full checkpoint (embedder.* / detector.*) -> (embedder_vars,
    extractor_vars) matching models.embedder/extractor module trees.

    Card is a videoseal_tpu card dict (cards/*.yaml).
    """
    emb_cfg = card["embedder"]
    ext_cfg = card["extractor"]
    if emb_cfg["model"].startswith("unet"):
        u = emb_cfg["params"]["unet"]
        emb_vars = _nest(convert_unet_msg(
            sd, normalization=u["normalization"],
            n_levels=len(u["z_channels_mults"]), num_blocks=u["num_blocks"],
            prefix="embedder.unet.", conv_layer=u.get("conv_layer", "conv2d"),
            upsampling_type=u.get("upsampling_type", "bilinear")), "unet")
    else:
        raise NotImplementedError(f"embedder {emb_cfg['model']} conversion")
    if ext_cfg["model"].startswith("convnext"):
        enc = ext_cfg["params"]["encoder"]
        pd = ext_cfg["params"]["pixel_decoder"]
        enc_vars = convert_convnext(
            sd, depths=enc["depths"], prefix="detector.convnext.",
            temporal_convs=enc.get("temporal_convs", False))
        dec_vars = convert_pixel_decoder(
            sd, n_stages=len(pd["upscale_stages"]), pixelwise=pd.get("pixelwise", False),
            prefix="detector.pixel_decoder.",
            upscale_type=pd.get("upscale_type", "bilinear"))
        ext_vars = {"params": {"encoder": enc_vars["params"],
                               "pixel_decoder": dec_vars["params"]}}
    elif ext_cfg["model"].startswith("sam"):
        enc_vars = convert_vit(sd, depth=ext_cfg["params"]["encoder"]["depth"],
                               prefix="detector.image_encoder.")
        pd = ext_cfg["params"]["pixel_decoder"]
        dec_vars = convert_pixel_decoder(
            sd, n_stages=len(pd["upscale_stages"]), pixelwise=pd.get("pixelwise", False),
            prefix="detector.pixel_decoder.",
            upscale_type=pd.get("upscale_type", "bilinear"))
        ext_vars = {"params": {"encoder": enc_vars["params"],
                               "pixel_decoder": dec_vars["params"]}}
    else:
        raise NotImplementedError(f"extractor {ext_cfg['model']} conversion")
    return emb_vars, ext_vars


def convert_vit(sd: Mapping[str, Any], *, depth: int, prefix: str = "",
                temporal: bool = False) -> dict:
    """Reference ImageEncoderViT (vit.py:14-143) -> params tree."""
    p = {}
    _set(p, "patch_embed/kernel", _c2d(sd[f"{prefix}patch_embed.proj.weight"]))
    _set(p, "patch_embed/bias", sd[f"{prefix}patch_embed.proj.bias"])
    if f"{prefix}pos_embed" in sd:
        _set(p, "pos_embed", sd[f"{prefix}pos_embed"])
    if f"{prefix}pos_embed_temporal" in sd:
        _set(p, "pos_embed_temporal", sd[f"{prefix}pos_embed_temporal"])
    for i in range(depth):
        t = f"{prefix}blocks.{i}"
        o = f"block_{i}"
        for n in ("norm1", "norm2"):
            _set(p, f"{o}/{n}/scale", sd[f"{t}.{n}.weight"])
            _set(p, f"{o}/{n}/bias", sd[f"{t}.{n}.bias"])
        _set(p, f"{o}/attn/qkv/kernel", _lin(sd[f"{t}.attn.qkv.weight"]))
        if f"{t}.attn.qkv.bias" in sd:
            _set(p, f"{o}/attn/qkv/bias", sd[f"{t}.attn.qkv.bias"])
        _set(p, f"{o}/attn/proj/kernel", _lin(sd[f"{t}.attn.proj.weight"]))
        _set(p, f"{o}/attn/proj/bias", sd[f"{t}.attn.proj.bias"])
        if f"{t}.attn.rel_pos_h" in sd:
            _set(p, f"{o}/attn/rel_pos_h", sd[f"{t}.attn.rel_pos_h"])
            _set(p, f"{o}/attn/rel_pos_w", sd[f"{t}.attn.rel_pos_w"])
        _set(p, f"{o}/mlp/lin1/kernel", _lin(sd[f"{t}.mlp.lin1.weight"]))
        _set(p, f"{o}/mlp/lin1/bias", sd[f"{t}.mlp.lin1.bias"])
        _set(p, f"{o}/mlp/lin2/kernel", _lin(sd[f"{t}.mlp.lin2.weight"]))
        _set(p, f"{o}/mlp/lin2/bias", sd[f"{t}.mlp.lin2.bias"])
        if temporal:
            _convert_temporal_block(sd, f"{prefix}temp_blocks.{i}", p,
                                    f"temp_block_{i}")
    _set(p, "neck_conv1/kernel", _c2d(sd[f"{prefix}neck.0.weight"]))
    _set(p, "neck_norm1/weight", sd[f"{prefix}neck.1.weight"])
    _set(p, "neck_norm1/bias", sd[f"{prefix}neck.1.bias"])
    _set(p, "neck_conv2/kernel", _c2d(sd[f"{prefix}neck.2.weight"]))
    _set(p, "neck_norm2/weight", sd[f"{prefix}neck.3.weight"])
    _set(p, "neck_norm2/bias", sd[f"{prefix}neck.3.bias"])
    return {"params": p}
