"""Whole-extractor fused ConvNeXt forward.

Mirrors modules/convnext.py ConvNeXtV2 exactly, but runs each residual block
through the Pallas fused-block kernel (kernels/convnext_block.py) when the
frame plane fits VMEM. Operates on the raw converted param tree, so the
checkpoint layout is untouched; the linen module remains the source of truth
for training and the parity oracle for this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .convnext_block import (blocks_per_step, convnext_block_fused,
                             convnext_blocks_fused, frames_per_step,
                             supports_block)


def _channel_ln(x, p, eps=1e-6):
    mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x.astype(jnp.float32) - mu), axis=-1, keepdims=True)
    y = (x.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _stem(x, p, features: int, stride: int):
    """Space-to-depth stem (modules/convnext.py StemConv semantics)."""
    kernel = p["kernel"].astype(x.dtype)
    bias = p["bias"].astype(x.dtype)
    c = x.shape[-1]
    hh, ww = x.shape[-3], x.shape[-2]
    lead = x.shape[:-3]
    if stride == 4 and hh % 4 == 0 and ww % 4 == 0:
        y = x.reshape(lead + (hh // 4, 4, ww // 4, 4, c))
        y = jnp.moveaxis(y, -4, -3)
        y = y.reshape(lead + (hh // 4, ww // 4, 16 * c))
        return jnp.einsum("...k,kf->...f", y,
                          kernel.reshape(16 * c, features)) + bias
    if stride == 2 and hh % 2 == 0 and ww % 2 == 0:
        y = x.reshape(lead + (hh // 2, 2, ww // 2, 2, c))
        y = jnp.moveaxis(y, -4, -3).reshape((-1, hh // 2, ww // 2, 4 * c))
        k2 = kernel.reshape(2, 2, 2, 2, c, features)
        k2 = jnp.transpose(k2, (0, 2, 1, 3, 4, 5)).reshape(2, 2, 4 * c, features)
        dn = jax.lax.conv_dimension_numbers(y.shape, k2.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(y, k2, (1, 1), "VALID",
                                           dimension_numbers=dn)
        return out.reshape(lead + out.shape[1:]) + bias
    dn = jax.lax.conv_dimension_numbers(((1,) + x.shape[-3:]), kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    flat = x.reshape((-1,) + x.shape[-3:])
    out = jax.lax.conv_general_dilated(flat, kernel, (stride, stride), "VALID",
                                       dimension_numbers=dn)
    return out.reshape(lead + out.shape[1:]) + bias


def _block_xla(x, p):
    """Plain XLA block (fallback when the plane is too big for VMEM)."""
    from ..modules.common import gelu_exact
    inp = x
    c = x.shape[-1]
    k = p["dwconv"]["kernel"].astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, k, (1, 1), [(3, 3), (3, 3)],
                                     dimension_numbers=dn, feature_group_count=c)
    y = y + p["dwconv"]["bias"].astype(x.dtype)
    y = _channel_ln(y, p["norm"])
    y = jnp.dot(y, p["pwconv1"]["kernel"].astype(x.dtype)) + \
        p["pwconv1"]["bias"].astype(x.dtype)
    y = gelu_exact(y)
    gx = jnp.sqrt(jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(-3, -2),
                          keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    y = (p["grn"]["gamma"].astype(jnp.float32) * (y.astype(jnp.float32) * nx)
         + p["grn"]["beta"].astype(jnp.float32) + y.astype(jnp.float32)
         ).astype(x.dtype)
    y = jnp.dot(y, p["pwconv2"]["kernel"].astype(x.dtype)) + \
        p["pwconv2"]["bias"].astype(x.dtype)
    return inp + y


def convnext_apply_fused(params: dict, x: jnp.ndarray,
                         depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                         stem_stride: int = 4,
                         interpret: bool = False,
                         max_block_group: int = 1) -> jnp.ndarray:
    """ConvNeXtV2.forward_features with Pallas blocks where possible.

    Compiled Pallas requires a TPU backend; elsewhere the XLA fallback path
    runs (or interpret=True forces the kernel through the interpreter)."""
    on_tpu = jax.default_backend() == "tpu"
    x = _stem(x, params["stem_conv"], dims[0], stem_stride)
    x = _channel_ln(x, params["stem_norm"])
    for i in range(4):
        if i > 0:
            x = _channel_ln(x, params[f"down{i}_norm"])
            k = params[f"down{i}_conv"]["kernel"].astype(x.dtype)
            dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            x = jax.lax.conv_general_dilated(x, k, (2, 2), "VALID",
                                             dimension_numbers=dn)
            x = x + params[f"down{i}_conv"]["bias"].astype(x.dtype)
        h, w = x.shape[-3], x.shape[-2]
        fused_ok = supports_block(h, w, dims[i]) and (on_tpu or interpret)
        fps = frames_per_step(x.shape[0], h, w, dims[i])
        # multi-block grouping measured NEGATIVE on v5e (round 4:
        # extractor 34.0 ms grouped vs 32.7 single over 128f — resident
        # k-block weights eat the double-buffering headroom and the
        # per-step prologue was not the cost). Grouping stays available
        # via max_block_group for future parts/shapes.
        kmax = (min(blocks_per_step(h, w, dims[i], fps, depths[i]),
                    max_block_group)
                if fused_ok else 1)
        j = 0
        while j < depths[i]:
            if not fused_ok:
                x = _block_xla(x, params[f"stage{i}_block{j}"])
                j += 1
                continue
            k = min(kmax, depths[i] - j)
            plist = tuple(params[f"stage{i}_block{jj}"]
                          for jj in range(j, j + k))
            if k == 1:
                x = convnext_block_fused(x, plist[0], interpret=interpret,
                                         fps=fps)
            else:
                x = convnext_blocks_fused(x, plist, interpret=interpret,
                                          fps=fps, k=k)
            j += k
    return x
