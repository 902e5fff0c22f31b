"""Shared neural blocks (flax.linen, NHWC).

Semantics parity with videoseal/modules/common.py:13-268 — same norm/act
registries, the same Upsample/Downsample blocks — but laid out channels-last
and expressed as pure linen modules so XLA sees one fused graph per forward.

Key numerics pinned to the reference:
* "batch"  -> BatchNorm2d(eps=1e-5, momentum .1 torch == .9 flax)
* "group"  -> GroupNorm(8 groups, eps=1e-5)
* "layer"  -> ConvNeXt-style LayerNorm over channel dim only (eps=1e-6)
* "rms"    -> ChanRMSNorm: l2-normalize over C * sqrt(C) * gamma (common.py:172-179)
* GELU is the exact erf form (torch nn.GELU default), not tanh-approximate.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear


# ---------------------------------------------------------------------------
# activations (common.py:196-208)
# ---------------------------------------------------------------------------

def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-form GELU (torch nn.GELU default), computed in f32.

    TPU perf note: bf16 erf lowers to a pathologically slow polynomial
    (~9x slower than the f32 path measured on v5e); routing through f32 is
    both faster and closer to the torch reference numerics.
    """
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "gelu":
        return gelu_exact
    if name == "silu":
        return jax.nn.silu
    raise NotImplementedError(f"activation {name!r}")


# ---------------------------------------------------------------------------
# norms (common.py:131-194)
# ---------------------------------------------------------------------------

class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis only (common.py:131-155), NHWC."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.epsilon)
        return weight * y + bias


class ChanRMSNorm(nn.Module):
    """F.normalize over channels * sqrt(C) * gamma (common.py:172-179)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,))
        # floor inside the sqrt: finite gradient at x == 0 (see GRN below)
        norm = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(x), axis=-1, keepdims=True), 1e-24))
        y = x / jnp.maximum(norm, 1e-12)
        return y * (dim ** 0.5) * gamma


class Norm(nn.Module):
    """Uniform wrapper over the reference's norm registry (common.py:182-194)."""
    kind: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind.startswith("batch"):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name="bn")(x)
        if self.kind.startswith("group"):
            return nn.GroupNorm(num_groups=8, epsilon=1e-5, name="gn")(x)
        if self.kind.startswith("layer"):
            return ChannelLayerNorm(name="ln")(x)
        if self.kind.startswith("rms"):
            return ChanRMSNorm(name="rms")(x)
        raise NotImplementedError(f"normalization {self.kind!r}")


# ---------------------------------------------------------------------------
# GRN (common.py:158-169)
# ---------------------------------------------------------------------------

class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2), NHWC."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        # L2 over H,W; the 1e-12 floor keeps d(sqrt)/dx finite when a whole
        # channel map is exactly 0 (torch.norm in the reference NaNs there too)
        gx = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(x), axis=(-3, -2), keepdims=True), 1e-12))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


# ---------------------------------------------------------------------------
# temporal conv wrappers (common.py:211-258)
# ---------------------------------------------------------------------------

class Conv2dOp(nn.Module):
    """Plain 2D conv; frames ride the batch dim."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: Any = None  # default: torch-style same-ish padding k//2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else k // 2
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        return nn.Conv(self.features, (k, k), strides=(self.stride, self.stride),
                       padding=pad, use_bias=self.use_bias, name="conv")(x)


class Conv3dOp(nn.Module):
    """3D conv treating the batch dim as time (common.py:211-227).

    Input (F, H, W, C) -> conv over (F, H, W) -> (F, H, W, C).
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: Any = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = self.padding if self.padding is not None else k // 2
        if isinstance(pad, int):
            pad = [(pad, pad)] * 3
        y = x[None]  # (1, F, H, W, C)
        y = nn.Conv(self.features, (k, k, k), strides=(1, self.stride, self.stride),
                    padding=pad, use_bias=self.use_bias, name="conv")(y)
        return y[0]


class Conv2p1dOp(nn.Module):
    """2D conv + temporal k x 1 x 1 conv over the frame axis (common.py:230-258)."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: Any = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        y = Conv2dOp(self.features, self.kernel_size, self.stride, self.padding,
                     self.use_bias, name="spatial")(x)
        if self.kernel_size != 1:
            k = self.kernel_size
            z = y[None]  # (1, F, H, W, C)
            z = nn.Conv(self.features, (k, 1, 1), padding=[(k // 2, k // 2), (0, 0), (0, 0)],
                        use_bias=False, name="temporal")(z)
            y = z[0]
        return y


def get_conv_op(name: str):
    if name == "conv2d":
        return Conv2dOp
    if name == "conv3d":
        return Conv3dOp
    if name == "conv2p1d":
        return Conv2p1dOp
    raise NotImplementedError(f"conv layer {name!r}")


# ---------------------------------------------------------------------------
# Upsample / Downsample blocks (common.py:13-109)
# ---------------------------------------------------------------------------

class Upsample(nn.Module):
    """Upscale block (common.py:13-84).

    nearest|bilinear: resize -> reflect-pad -> 3x3 conv -> LayerNorm -> act
    pixelshuffle: 1x1 conv -> LayerNorm -> act -> depth-to-space
    conv: transposed conv -> LayerNorm -> act
    """
    upscale_type: str
    features: int
    up_factor: int
    activation: Callable
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        f = self.up_factor
        if self.upscale_type in ("nearest", "bilinear"):
            if f != 1:
                h, w = x.shape[-3] * f, x.shape[-2] * f
                if self.upscale_type == "nearest":
                    x = jnp.repeat(jnp.repeat(x, f, axis=-3), f, axis=-2)
                else:
                    # exact f32 resample in f32 mode; single-pass when the
                    # module already runs in bf16 (serving)
                    prec = "highest" if x.dtype == jnp.float32 else "default"
                    x = resize_bilinear(x, h, w, antialias=False, precision=prec)
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)], mode="reflect")
            x = nn.Conv(self.features, (3, 3), padding="VALID", use_bias=self.use_bias,
                        name="conv")(x)
            x = ChannelLayerNorm(name="norm")(x)
            return self.activation(x)
        if self.upscale_type == "conv":
            x = nn.ConvTranspose(self.features, (f, f), strides=(f, f), padding="VALID",
                                 name="conv")(x)
            x = ChannelLayerNorm(name="norm")(x)
            return self.activation(x)
        if self.upscale_type == "pixelshuffle":
            x = nn.Conv(self.features * f * f, (1, 1), use_bias=False, name="conv")(x)
            x = ChannelLayerNorm(name="norm")(x)
            x = self.activation(x)
            # torch PixelShuffle on NCHW(C=c*f*f) == NHWC depth-to-space with (c,f,f) order
            b = x.shape[:-3]
            h, w = x.shape[-3], x.shape[-2]
            x = x.reshape(b + (h, w, self.features, f, f))
            x = jnp.moveaxis(x, (-2, -1), (-4, -2))  # (..., h, f, w, f, c)
            return x.reshape(b + (h * f, w * f, self.features))
        raise ValueError(f"Invalid upscaling type: {self.upscale_type}")


class Downsample(nn.Module):
    """PixelUnshuffle(2) -> 1x1 conv -> act (common.py:87-109)."""
    features: int
    activation: Callable

    @nn.compact
    def __call__(self, x):
        b = x.shape[:-3]
        h, w, c = x.shape[-3:]
        # torch PixelUnshuffle: out channel order is (c, fh, fw)
        y = x.reshape(b + (h // 2, 2, w // 2, 2, c))
        y = jnp.moveaxis(y, (-4, -2), (-2, -1))  # (..., h/2, w/2, c, 2, 2)
        y = y.reshape(b + (h // 2, w // 2, c * 4))
        y = nn.Conv(self.features, (1, 1), name="conv")(y)
        return self.activation(y)
