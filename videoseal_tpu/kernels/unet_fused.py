"""Inference-optimized UNetMsg forward on raw params.

Mirrors modules/unet.py UNetMsg exactly, with BatchNorm FOLDED into the
preceding conv weights at trace time (convs are bias-free in the reference,
unet.py:24-32, so BN(conv(x)) == conv'(x) + b' exactly). This removes ~40
norm/broadcast ops from the embedder's hot path and lets XLA fuse
conv->bias->relu chains cleanly. Only batch/rms/identity-normalization UNets
take this path (the four zoo cards use batch or rms); others use the linen
module.

Used for serving (with_dtype); the linen module remains the training path
and the parity oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from .lane_pack import conv3x3_lane_packed, supports_lane_pack


def _conv(x, kernel, bias=None, stride=1, padding=1, lane_pack=False):
    if (lane_pack and stride == 1 and padding == 1
            and supports_lane_pack(x.shape, kernel.shape)):
        return conv3x3_lane_packed(x, kernel, bias)
    k = kernel.astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    pad = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    y = jax.lax.conv_general_dilated(x, k, (stride, stride), pad,
                                     dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _fold_bn(kernel, bn_p, bn_s, eps=1e-5):
    """conv (no bias) + BatchNorm(eval) -> scaled conv + bias. Exact."""
    scale = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + eps)
    return kernel * scale, bn_p["bias"] - bn_s["mean"] * scale


def _norm_act(x, p, s, normalization, act):
    """Non-foldable norms (rms) applied explicitly."""
    if normalization.startswith("rms"):
        gamma = p["rms"]["gamma"].astype(jnp.float32)
        xf = x.astype(jnp.float32)
        n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        x = ((xf / jnp.maximum(n, 1e-12)) * (x.shape[-1] ** 0.5) * gamma
             ).astype(x.dtype)
    return act(x)


def _resnet_block(x, p, s, normalization, act, lane_pack=False):
    """unet.py:17-55 with folded BN."""
    if normalization.startswith("batch"):
        k1, b1 = _fold_bn(p["conv1"]["conv"]["kernel"], p["norm1"]["bn"],
                          s["norm1"]["bn"])
        h = act(_conv(x, k1, b1, lane_pack=lane_pack))
        k2, b2 = _fold_bn(p["conv2"]["conv"]["kernel"], p["norm2"]["bn"],
                          s["norm2"]["bn"])
        h = act(_conv(h, k2, b2, lane_pack=lane_pack))
    else:
        h = _norm_act(_conv(x, p["conv1"]["conv"]["kernel"],
                            lane_pack=lane_pack), p["norm1"],
                      None, normalization, act)
        h = _norm_act(_conv(h, p["conv2"]["conv"]["kernel"],
                            lane_pack=lane_pack), p["norm2"],
                      None, normalization, act)
    res = _conv(x, p["res_conv"]["conv"]["kernel"],
                p["res_conv"]["conv"].get("bias"), padding=0)
    return h + res


def _channel_ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _upsample(x, p, act, lane_pack=False):
    """Upsample 'bilinear' block (common.py:45-52): 2x resize, reflect pad,
    3x3 valid conv, channel LN, act."""
    h, w = x.shape[-3] * 2, x.shape[-2] * 2
    prec = "highest" if x.dtype == jnp.float32 else "default"
    x = resize_bilinear(x, h, w, antialias=False, precision=prec)
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)],
                mode="reflect")
    k = p["conv"]["kernel"]
    if lane_pack and supports_lane_pack((x.shape[0], h, w, x.shape[-1]),
                                        k.shape):
        x = conv3x3_lane_packed(x, k, p["conv"].get("bias"), prepadded=True)
    else:
        x = _conv(x, k, p["conv"].get("bias"), padding=0)
    x = _channel_ln(x, p["norm"])
    return act(x)


def unet_apply_fused(params: dict, stats: dict, x: jnp.ndarray,
                     msgs: jnp.ndarray, *, nbits: int, hidden_size: int,
                     z_channels_mults, activation: str = "relu",
                     normalization: str = "batch", num_blocks: int = 8,
                     last_tanh: bool = True,
                     lane_pack: bool = False) -> jnp.ndarray:
    """UNetMsg forward (unet.py:170-197), input [0,1] -> preprocess inside.

    lane_pack: rewrite small-C_out 3x3 convs as lane-packed 4x4/s2 convs
    (kernels/lane_pack.py). Exact and parity-tested, but MEASURED NEUTRAL on
    v5e (0.997x isolated, slight pipeline regression): XLA's conv emitter
    already packs small-C_out convs efficiently; off by default.
    """
    from ..modules.common import get_activation
    act = get_activation(activation)
    p = params["unet"]
    s = stats.get("unet", {}) if stats else {}

    x = x * 2 - 1  # embedder preprocess (models/embedder.py:23)
    x = _resnet_block(x, p["inc"], s.get("inc", {}), normalization, act,
                      lane_pack)
    hiddens = [x]
    n_levels = len(z_channels_mults)
    for i in range(n_levels - 1):
        d = p[f"downs_{i}"]
        ds = s.get(f"downs_{i}", {})
        y = _conv(hiddens[-1], d["down"]["kernel"], d["down"]["bias"], stride=2)
        y = _resnet_block(y, d["conv"], ds.get("conv", {}), normalization, act,
                          lane_pack)
        hiddens.append(y)

    # message injection (msg_processor.py:88-119, matmul form)
    table = p["msg_processor"]["msg_embeddings"].astype(jnp.float32)
    even, odd = table[0::2], table[1::2]
    emb = jnp.sum(even, axis=0) + jnp.dot(
        msgs.astype(jnp.float32), odd - even, precision="highest")
    lat = hiddens.pop()
    emb_map = jnp.broadcast_to(emb[:, None, None, :].astype(lat.dtype),
                               lat.shape[:-1] + (hidden_size,))
    y = jnp.concatenate([lat, emb_map], axis=-1)
    hiddens.append(y)
    for j in range(num_blocks):
        y = _resnet_block(y, p[f"bottleneck_{j}"], s.get(f"bottleneck_{j}", {}),
                          normalization, act, lane_pack)

    scale = 2 ** -0.5
    for i in range(n_levels - 1):
        y = jnp.concatenate([y, hiddens.pop() * scale], axis=-1)
        u = p[f"ups_{i}"]
        us = s.get(f"ups_{i}", {})
        y = _upsample(y, u["up"], act, lane_pack)
        y = _resnet_block(y, u["conv"], us.get("conv", {}), normalization, act,
                          lane_pack)

    y = _conv(y, p["outc"]["kernel"], p["outc"]["bias"], padding=0)
    return jnp.tanh(y) if last_tanh else y


def supports_unet_fused(unet_cfg: dict) -> bool:
    return (unet_cfg.get("normalization", "batch") in ("batch", "rms")
            and unet_cfg.get("conv_layer", "conv2d") == "conv2d"
            and unet_cfg.get("upsampling_type", "bilinear") == "bilinear"
            and unet_cfg.get("downsampling_type", "bilinear") == "bilinear")
