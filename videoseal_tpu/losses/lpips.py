"""LPIPS / VGG-feature perceptual distances (flax).

Architecture parity with the `lpips` package (net="vgg") used by the
reference (perceptual.py:23) and with losses/{watson_vgg,dists}.py's VGG16
backbones. This environment has no network access and ships no VGG16
weights, so these losses require a converted weights file:

    python -m videoseal_tpu.tools.convert_lpips /path/to/vgg16+lpips.pth out.npz

and `build("lpips", weights_dir)` loads `<weights_dir>/lpips_vgg.npz`.
Without weights, calling the loss raises a clear error (the released model
cards trained with "yuv"/"mse", so training runs do not need VGG by default).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

# lpips package input normalization constants (public)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (channels, convs-per-stage); LPIPS taps the relu after
# each stage's last conv: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for si, (ch, n) in enumerate(_VGG_PLAN):
            for ci in range(n):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv{si}_{ci}")(x)
                x = jax.nn.relu(x)
            feats.append(x)
            if si < len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """LPIPS(net='vgg'): unit-normalize features, squared diff, 1x1 lin heads."""

    @nn.compact
    def __call__(self, x, y):
        # inputs in [0,1] -> lpips expects [-1,1] then its scaling layer
        x = (2 * x - 1 - _SHIFT) / _SCALE
        y = (2 * y - 1 - _SHIFT) / _SCALE
        vgg = VGG16Features(name="vgg")
        fx, fy = vgg(x), vgg(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(jnp.abs(w) * d, axis=-1), axis=(-2, -1))
        return total


_cache: dict[str, object] = {}


def build(name: str, weights_dir: str | None):
    if name != "lpips":
        raise NotImplementedError(
            f"{name}: VGG-based distance not yet wired; use lpips or a "
            f"non-VGG loss (yuv/mse/ssim/msssim/focal/jnd)")
    weights_dir = weights_dir or os.environ.get("VIDEOSEAL_TPU_WEIGHTS", "")
    path = os.path.join(weights_dir, "lpips_vgg.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS needs converted VGG16+lin weights at {path}. Convert with "
            f"videoseal_tpu.utils.torch_convert.convert_lpips (zero-egress "
            f"environment: weights cannot be downloaded automatically).")
    if path not in _cache:
        from ..utils.checkpoint import unflatten_tree
        data = np.load(path)
        params = unflatten_tree({k: data[k] for k in data.files})
        mod = LPIPS()
        _cache[path] = (mod, {"params": params})
    mod, variables = _cache[path]

    def fn(x, y):
        return jnp.mean(mod.apply(variables, x, y))

    return fn
