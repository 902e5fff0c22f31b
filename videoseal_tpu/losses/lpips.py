"""LPIPS / VGG-feature perceptual distances (flax).

Faithful ports of the three VGG16-based losses the reference trains/evals
with: the `lpips` pip package (net="vgg", called by perceptual.py:23 with
[0,1] images and normalize=False — the scaling layer is applied to the raw
input exactly as the reference does), losses/watson_vgg.py:15-166 and
losses/dists.py:16-145 (whose backbone replaces max-pools with Hanning
L2-pooling — NOT the standard VGG16 graph).

This environment has no network access and ships no VGG16 weights, so these
losses require a converted weights file:

    python -m videoseal_tpu.tools.convert_lpips \
        --vgg16 vgg16.pth [--lpips lpips_vgg.pth] [--watson rgb_watson_vgg.pth]
        [--dists dists_ckpt.pth] --out <weights_dir>

and `build("lpips", weights_dir)` loads `<weights_dir>/lpips_vgg.npz`.
Without weights, calling the loss raises a clear error (the released model
cards trained with "yuv"/"mse", so training runs do not need VGG by default).
Architecture parity is tested against the reference loss code running on a
random-init VGG16 (tests/test_vgg_losses.py).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

# lpips/watson scaling-layer constants (public)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (channels, convs-per-stage); taps after each stage's last
# relu: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_VGG_CHANNELS = [64, 128, 256, 512, 512]


def _l2pool(v, *, filter_size: int = 5, stride: int = 2):
    """Hanning-window L2 pooling (dists.py:16-30): sqrt(conv(x^2, g))."""
    a = np.hanning(filter_size)[1:-1]
    g = (a[:, None] * a[None, :]).astype(np.float32)
    g /= g.sum()
    c = v.shape[-1]
    pad = (filter_size - 2) // 2
    k = jnp.asarray(np.tile(g[:, :, None, None], (1, 1, 1, c)), v.dtype)
    dn = jax.lax.conv_dimension_numbers(v.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(v * v, k, (stride, stride),
                                       [(pad, pad), (pad, pad)],
                                       dimension_numbers=dn,
                                       feature_group_count=c)
    return jnp.sqrt(out + 1e-12)


class VGG16Features(nn.Module):
    """VGG16 feature taps. pool="max" is the torchvision graph (lpips,
    watson_vgg); pool="l2" is DISTS' L2-pooled variant (dists.py:35-55)."""
    pool: str = "max"

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
                if self.pool == "max":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = _l2pool(x)
        return feats


class AlexFeatures(nn.Module):
    """AlexNet feature taps (after each of the 5 relus) — the backbone the
    reference's eval-time LPIPS uses (evals/full.py:94, net='alex')."""

    @nn.compact
    def __call__(self, x):
        feats = []
        # (ch, kernel, stride, pad, maxpool-before)
        plan = [(64, 11, 4, 2, False), (192, 5, 1, 2, True),
                (384, 3, 1, 1, True), (256, 3, 1, 1, False),
                (256, 3, 1, 1, False)]
        for i, (ch, k, s, p, mp) in enumerate(plan):
            if mp:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            feats.append(x)
        return feats


def _unit_norm(t, eps=1e-10):
    """Euclidean channel normalization, `x / (||x|| + eps)` (NOT max)."""
    return t / (jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True)) + eps)


class LPIPS(nn.Module):
    """lpips package forward (normalize=False): scaling layer, backbone taps,
    unit-normalize, squared diff, 1x1 lin heads, spatial average.
    net='vgg' (training loss, perceptual.py:23) or 'alex' (eval, full.py:94)."""
    net: str = "vgg"

    @nn.compact
    def __call__(self, x, y):
        x = (x - _SHIFT) / _SCALE
        y = (y - _SHIFT) / _SCALE
        backbone = (VGG16Features(name="vgg") if self.net == "vgg"
                    else AlexFeatures(name="alex"))
        fx, fy = backbone(x), backbone(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_norm(a) - _unit_norm(b)) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(w * d, axis=-1), axis=(-2, -1))
        return total


class WatsonDistanceVgg(nn.Module):
    """Watson distance over VGG16 features (losses/watson_vgg.py:70-166).

    Sensitivity params default to the reference's init (t=0 pre-exp, w=0.2
    pre-sigmoid, beta=1); trained weights load from the converted npz.
    Call as (input, target): the contrast-masking term uses the TARGET's
    features (watson_vgg.py:133-147).
    """

    @nn.compact
    def __call__(self, x, y):
        eps = 1e-10
        x = (x - _SHIFT) / _SCALE
        y = (y - _SHIFT) / _SCALE
        vgg = VGG16Features(name="vgg")
        c1 = vgg(x)  # input
        c0 = vgg(y)  # target
        beta = self.param("beta", nn.initializers.ones, ())
        total = 0.0
        for l, ch in enumerate(_VGG_CHANNELS):
            t = jnp.exp(self.param(f"t{l}_tild", nn.initializers.zeros, (ch,)))
            w = jax.nn.sigmoid(self.param(
                f"w{l}_tild",
                lambda k, s: jnp.full(s, float(np.log(0.2 / 0.8))), ()))
            a = _unit_norm(c0[l], eps)
            b = _unit_norm(c1[l], eps)
            s = _soft_max_mix(jnp.broadcast_to(t, a.shape),
                              (jnp.abs(a) + eps) ** w * t ** (1 - w))
            hw = a.shape[-3] * a.shape[-2]
            layer = (jnp.abs((a - b) / s) + eps) ** beta + eps
            total = total + jnp.sum(layer, axis=(-3, -2, -1)) / hw
        return total ** (1 / beta)


def _soft_max_mix(a, b, factor: float = 1.0):
    m = jax.nn.softmax(jnp.stack([a, b], -1) * factor, axis=-1)
    return a * m[..., 0] + b * m[..., 1]


class DISTS(nn.Module):
    """Structure+texture similarity (losses/dists.py:32-145): L2-pooled VGG16
    stages, per-channel alpha/beta weights normalized by their joint sum."""

    @nn.compact
    def __call__(self, x, y):
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        vgg = VGG16Features(pool="l2", name="vgg")
        fx = [x] + vgg((x - mean) / std)
        fy = [y] + vgg((y - mean) / std)
        chans = [3] + _VGG_CHANNELS
        alpha = self.param("alpha", nn.initializers.ones, (sum(chans),))
        beta = self.param("beta", nn.initializers.ones, (sum(chans),))
        w_sum = alpha.sum() + beta.sum()
        alphas = jnp.split(alpha / w_sum, np.cumsum(chans)[:-1])
        betas = jnp.split(beta / w_sum, np.cumsum(chans)[:-1])
        c1 = c2 = 1e-6
        dist1 = 0.0
        dist2 = 0.0
        for k in range(len(chans)):
            a, b = fx[k], fy[k]
            mu_a = a.mean(axis=(-3, -2))
            mu_b = b.mean(axis=(-3, -2))
            var_a = a.var(axis=(-3, -2))
            var_b = b.var(axis=(-3, -2))
            cov = (a * b).mean(axis=(-3, -2)) - mu_a * mu_b
            s1 = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
            s2 = (2 * cov + c2) / (var_a + var_b + c2)
            dist1 = dist1 + jnp.sum(alphas[k] * s1, axis=-1)
            dist2 = dist2 + jnp.sum(betas[k] * s2, axis=-1)
        return 1 - (dist1 + dist2)


_cache: dict[str, object] = {}

_WEIGHT_FILES = {"lpips": "lpips_vgg.npz", "lpips_alex": "lpips_alex.npz",
                 "watson_vgg": "watson_vgg.npz", "dists": "dists.npz"}
_MODULES = {"lpips": LPIPS, "lpips_alex": lambda: LPIPS(net="alex"),
            "watson_vgg": WatsonDistanceVgg, "dists": DISTS}


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
            f"be converted offline via videoseal_tpu.tools.convert_lpips).")
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
