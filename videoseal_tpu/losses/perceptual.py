"""Perceptual loss registry + string combinator (videoseal/losses/perceptual.py).

Syntax parity: "yuv", "lpips+0.1_mse", "0.5_ssim+focal", ... Each base loss is
a pure function (imgs, imgs_w) -> scalar. The released model cards trained
with "yuv" (videoseal_1.0) and "mse" (videoseal_0.0), which are fully
implemented; VGG-based distances (lpips/watson_vgg/dists) need converted
weight files (zero-egress environment) and are loaded through
losses/lpips.py when a weights path is configured.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..ops.color import rgb_to_yuv
from ..ops.metrics import ssim as _ssim, ms_ssim as _ms_ssim
from ..modules.jnd import JND

LossFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def none_loss(x, y):
    return jnp.zeros(())


def mse_loss(x, y):
    return jnp.mean((x - y) ** 2)


def yuv_loss(x, y):
    """MSE in YUV space (yuvloss.py:12-27) — videoseal_1.0's training loss."""
    return jnp.mean((rgb_to_yuv(x) - rgb_to_yuv(y)) ** 2)


def ssim_loss(x, y):
    # reference SSIM loss module returns the similarity (higher = closer);
    # VideosealLoss consumes it via PerceptualLoss as-is (ssim.py:251-291)
    return 1.0 - jnp.mean(_ssim(y, x))


def msssim_loss(x, y):
    return 1.0 - jnp.mean(_ms_ssim(y, x))


_jnd = JND(in_channels=1, out_channels=1)


def jnd_loss(x, y):
    """MSE between |delta| and the JND heatmap (jndloss.py:13-33)."""
    h = _jnd.heatmaps(x)
    return jnp.mean((jnp.abs(y - x) - h) ** 2)


def focal_loss(x, y, alpha: float = 1.0):
    """Focal frequency loss (focal.py / ICCV'21), patch_factor=1, NHWC input."""
    # ortho-normalized 2D FFT over spatial dims, per channel
    xf = jnp.fft.fft2(jnp.moveaxis(x, -1, 1), norm="ortho")
    yf = jnp.fft.fft2(jnp.moveaxis(y, -1, 1), norm="ortho")
    d2 = (xf.real - yf.real) ** 2 + (xf.imag - yf.imag) ** 2  # (B, C, H, W)
    w = jnp.sqrt(d2) ** alpha
    wmax = jnp.max(w, axis=(-2, -1), keepdims=True)
    w = jnp.clip(jnp.nan_to_num(w / jnp.maximum(wmax, 1e-12)), 0.0, 1.0)
    return jnp.mean(jax.lax.stop_gradient(w) * d2)


import jax  # noqa: E402  (stop_gradient used above)


_REGISTRY: dict[str, LossFn] = {
    "none": none_loss,
    "mse": mse_loss,
    "yuv": yuv_loss,
    "ssim": ssim_loss,
    "msssim": msssim_loss,
    "jnd": jnd_loss,
    "focal": focal_loss,
}


def build_loss(name: str, weights_dir: str | None = None) -> LossFn:
    if name in _REGISTRY:
        return _REGISTRY[name]
    if name == "watson_dft":
        # self-contained block-FFT Watson distance; reference loads externally
        # trained sensitivity weights (perceptual.py:48-53) — default init here,
        # trained params loadable via losses/watson_fft.py params_per_channel
        from .watson_fft import watson_fft_loss
        return watson_fft_loss
    if name in ("lpips", "watson_vgg", "dists"):
        from . import lpips as _lp
        return _lp.build(name, weights_dir)
    raise ValueError(f"Loss type {name} not supported.")


def build_perceptual_loss(percep_loss: str, weights_dir: str | None = None) -> LossFn:
    """Parse 'lpips+0.1_mse'-style strings (perceptual.py:73-113)."""
    parts = percep_loss.split("+")
    terms: list[tuple[float, LossFn]] = []
    for part in parts:
        # 'weight_loss' form; loss names may themselves contain '_'
        # (watson_vgg, watson_dft), so only split when the head parses
        if "_" in part:
            head, key = part.split("_", 1)
            try:
                w = float(head)
            except ValueError:
                w, key = 1.0, part
        else:
            w, key = 1.0, part
        terms.append((w, build_loss(key, weights_dir)))

    def combined(x, y):
        total = jnp.zeros(())
        for w, fn in terms:
            total = total + w * jnp.mean(fn(x, y))
        return total

    return combined


class PerceptualLoss:
    """Thin callable wrapper mirroring the reference class (perceptual.py:63-137)."""

    def __init__(self, percep_loss: str, weights_dir: str | None = None):
        self.percep_loss = percep_loss
        self._fn = build_perceptual_loss(percep_loss, weights_dir)

    def __call__(self, imgs, imgs_w):
        return self._fn(imgs, imgs_w)

    def __repr__(self):
        return f"PerceptualLoss(percep_loss={self.percep_loss})"
