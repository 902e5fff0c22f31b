"""Differentiable augmentations (attack simulator), jit/switch-compatible.

Parity targets: videoseal/augmentation/{geometric,valuemetric,video}.py.
Every aug is a small dataclass with two entry points:

* ``apply(key, img, mask) -> (img, mask)``: sample params from the config
  range using ``key`` and apply — used inside the jitted train step (all
  augs share this signature so ``lax.switch`` can select one at trace time).
* ``apply_strength(img, mask, strength)``: apply at a FIXED strength — used
  by the evaluation sweeps (augmentation/__init__.py:58-124), where shapes
  may change (outside jit).

All ops are differentiable; codec attacks (JPEG/H264/H265) carry gradients
via straight-through rounding of the DCT-quantization proxy (ops/jpeg.py).
TPU note: train-path augs keep static canvas shapes (crop/resize are
formulated as resampling warps; random resize picks from a discrete scale
bank via ``lax.switch``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import warp as W
from ..ops.resize import resize_bilinear
from ..ops.jpeg import jpeg_roundtrip


def _unif(key, lo, hi):
    return jax.random.uniform(key, (), minval=lo, maxval=hi)


class Aug:
    name = "aug"

    def apply(self, key, img, mask):
        raise NotImplementedError

    def apply_strength(self, img, mask, strength):
        raise NotImplementedError

    def __repr__(self):
        return type(self).__name__


@dataclasses.dataclass
class Identity(Aug):
    name = "identity"

    def apply(self, key, img, mask):
        return img, mask

    def apply_strength(self, img, mask, strength=None):
        return img, mask


# ---------------------------------------------------------------------------
# geometric (geometric.py:17-196)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Rotate(Aug):
    """Small-angle rotation, optionally composed with a +-90 base rotation."""
    min_angle: float = -10
    max_angle: float = 10
    do90: bool = False
    name = "rotate"

    def apply(self, key, img, mask):
        k1, k2 = jax.random.split(key)
        angle = _unif(k1, self.min_angle, self.max_angle)
        img = W.rotate(img, angle)
        mask = W.rotate(mask, angle)
        if self.do90:
            if img.shape[-3] != img.shape[-2]:
                raise ValueError("do90 rotation inside jit requires square frames")
            k90 = jax.random.randint(k2, (), 0, 4)  # [-90, 0, 0, 90]
            # F.rotate(+90) is counterclockwise == rot90(k=+1)
            rots = [lambda x: jnp.rot90(x, 3, (-3, -2)), lambda x: x,
                    lambda x: x, lambda x: jnp.rot90(x, 1, (-3, -2))]
            img = jax.lax.switch(k90, rots, img)
            mask = jax.lax.switch(k90, rots, mask)
        return img, mask

    def apply_strength(self, img, mask, strength):
        angle = jnp.asarray(strength, jnp.float32)
        base = (int(strength) // 90) * 90
        rem = angle - base
        if base % 360 != 0:
            k = (base // 90) % 4
            img = jnp.rot90(img, k, (-3, -2))  # F.rotate(+deg) is counterclockwise
            mask = jnp.rot90(mask, k, (-3, -2))
        return W.rotate(img, rem), W.rotate(mask, rem)


@dataclasses.dataclass
class Resize(Aug):
    """Area rescale (information loss); train path uses a discrete scale bank."""
    min_size: float = 0.7
    max_size: float = 1.5
    n_scales: int = 8
    name = "resize"

    def apply(self, key, img, mask):
        h, w = img.shape[-3], img.shape[-2]
        scales = np.linspace(self.min_size, self.max_size, self.n_scales)
        idx = jax.random.randint(key, (), 0, self.n_scales)

        def make_branch(s):
            oh = max(8, int(round(h * s)))
            ow = max(8, int(round(w * s)))
            return lambda x: W.resize_area_scale(x, oh, ow)

        branches = [make_branch(s) for s in scales]
        return (jax.lax.switch(idx, branches, img),
                jax.lax.switch(idx, branches, mask))

    def apply_strength(self, img, mask, strength):
        h, w = img.shape[-3], img.shape[-2]
        oh, ow = int(strength * h), int(strength * w)
        return resize_bilinear(img, oh, ow), resize_bilinear(mask, oh, ow)


@dataclasses.dataclass
class Crop(Aug):
    min_size: float = 0.5
    max_size: float = 1.0
    name = "crop"

    def apply(self, key, img, mask):
        h, w = img.shape[-3], img.shape[-2]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ch = jax.random.randint(k1, (), int(self.min_size * h), int(self.max_size * h) + 1)
        cw = jax.random.randint(k2, (), int(self.min_size * w), int(self.max_size * w) + 1)
        top = jax.random.randint(k3, (), 0, h + 1) % jnp.maximum(h - ch + 1, 1)
        left = jax.random.randint(k4, (), 0, w + 1) % jnp.maximum(w - cw + 1, 1)
        return (W.crop_resize(img, top, left, ch, cw),
                W.crop_resize(mask, top, left, ch, cw))

    def apply_strength(self, img, mask, strength):
        # eval: center-crop a strength-scaled window (true crop, shape changes)
        h, w = img.shape[-3], img.shape[-2]
        ch, cw = int(strength * h), int(strength * w)
        top, left = (h - ch) // 2, (w - cw) // 2
        return (img[..., top:top + ch, left:left + cw, :],
                mask[..., top:top + ch, left:left + cw, :])


@dataclasses.dataclass
class Perspective(Aug):
    min_distortion_scale: float = 0.1
    max_distortion_scale: float = 0.5
    name = "perspective"

    def _points(self, key, h, w, d):
        """Random corner displacements (geometric.py:149-180)."""
        ks = jax.random.split(key, 8)
        hw, hh = w // 2, h // 2
        dx = (d * hw).astype(jnp.float32)
        dy = (d * hh).astype(jnp.float32)
        u = lambda k: jax.random.uniform(k, ())
        tl = jnp.stack([u(ks[0]) * dx, u(ks[1]) * dy])
        tr = jnp.stack([(w - 1) - u(ks[2]) * dx, u(ks[3]) * dy])
        br = jnp.stack([(w - 1) - u(ks[4]) * dx, (h - 1) - u(ks[5]) * dy])
        bl = jnp.stack([u(ks[6]) * dx, (h - 1) - u(ks[7]) * dy])
        start = jnp.asarray([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]],
                            jnp.float32)
        end = jnp.stack([tl, tr, br, bl])
        return start, end

    def apply(self, key, img, mask):
        h, w = img.shape[-3], img.shape[-2]
        k1, k2 = jax.random.split(key)
        d = _unif(k1, self.min_distortion_scale, self.max_distortion_scale)
        start, end = self._points(k2, h, w, d)
        return (W.warp_perspective(img, start, end),
                W.warp_perspective(mask, start, end))

    def apply_strength(self, img, mask, strength):
        h, w = img.shape[-3], img.shape[-2]
        start, end = self._points(jax.random.PRNGKey(0), h, w,
                                  jnp.asarray(strength, jnp.float32))
        return (W.warp_perspective(img, start, end),
                W.warp_perspective(mask, start, end))


@dataclasses.dataclass
class HorizontalFlip(Aug):
    name = "hflip"

    def apply(self, key, img, mask):
        return img[..., ::-1, :], mask[..., ::-1, :]

    def apply_strength(self, img, mask, strength=None):
        return img[..., ::-1, :], mask[..., ::-1, :]


# ---------------------------------------------------------------------------
# valuemetric (valuemetric.py:21-212)
# ---------------------------------------------------------------------------

def _blend_clamp(a, b, f):
    return jnp.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def _luma(img):
    l = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    return l[..., None]


@dataclasses.dataclass
class Brightness(Aug):
    min_factor: float = 0.5
    max_factor: float = 2.0
    name = "brightness"

    def apply(self, key, img, mask):
        return self.apply_strength(img, mask, _unif(key, self.min_factor, self.max_factor))

    def apply_strength(self, img, mask, strength):
        return _blend_clamp(img, jnp.zeros_like(img), strength), mask


@dataclasses.dataclass
class Contrast(Aug):
    min_factor: float = 0.5
    max_factor: float = 2.0
    name = "contrast"

    def apply(self, key, img, mask):
        return self.apply_strength(img, mask, _unif(key, self.min_factor, self.max_factor))

    def apply_strength(self, img, mask, strength):
        # torchvision adjust_contrast: blend with mean of grayscale
        mean = jnp.mean(_luma(img), axis=(-3, -2, -1), keepdims=True)
        return _blend_clamp(img, mean, strength), mask


@dataclasses.dataclass
class Saturation(Aug):
    min_factor: float = 0.5
    max_factor: float = 2.0
    name = "saturation"

    def apply(self, key, img, mask):
        return self.apply_strength(img, mask, _unif(key, self.min_factor, self.max_factor))

    def apply_strength(self, img, mask, strength):
        return _blend_clamp(img, _luma(img), strength), mask


@dataclasses.dataclass
class Hue(Aug):
    min_factor: float = -0.1
    max_factor: float = 0.1
    name = "hue"

    def apply(self, key, img, mask):
        return self.apply_strength(img, mask, _unif(key, self.min_factor, self.max_factor))

    def apply_strength(self, img, mask, strength):
        # rotate hue in HSV space by strength (in turns), like adjust_hue
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        maxc = jnp.maximum(jnp.maximum(r, g), b)
        minc = jnp.minimum(jnp.minimum(r, g), b)
        v = maxc
        c = maxc - minc
        s = jnp.where(v > 0, c / jnp.maximum(v, 1e-12), 0.0)
        safe_c = jnp.maximum(c, 1e-12)
        hr = (g - b) / safe_c % 6.0
        hg = (b - r) / safe_c + 2.0
        hb = (r - g) / safe_c + 4.0
        h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb)) / 6.0
        h = jnp.where(c > 0, h, 0.0)
        h = (h + strength) % 1.0
        # hsv -> rgb
        i = jnp.floor(h * 6.0)
        f = h * 6.0 - i
        p = v * (1 - s)
        q = v * (1 - f * s)
        t = v * (1 - (1 - f) * s)
        i = i.astype(jnp.int32) % 6
        r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
        g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
        b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
        return jnp.stack([r2, g2, b2], axis=-1), mask


@dataclasses.dataclass
class GaussianBlur(Aug):
    min_kernel_size: int = 3
    max_kernel_size: int = 17
    name = "gaussian_blur"

    def _blur(self, img, k: int):
        k = int(k) | 1  # odd
        sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8  # torchvision default
        x = np.arange(k, dtype=np.float32) - (k - 1) / 2
        g = np.exp(-(x ** 2) / (2 * sigma ** 2))
        g = jnp.asarray(g / g.sum())
        pad = [(0, 0)] * (img.ndim - 3) + [(k // 2, k // 2), (k // 2, k // 2), (0, 0)]
        p = jnp.pad(img, pad, mode="reflect")
        c = img.shape[-1]
        kh = jnp.tile(g.reshape(k, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(g.reshape(1, k, 1, 1), (1, 1, 1, c))
        flat = p.reshape((-1,) + p.shape[-3:])
        dn = jax.lax.conv_dimension_numbers(flat.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(flat, kh, (1, 1), "VALID",
                                         dimension_numbers=dn, feature_group_count=c)
        y = jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                         dimension_numbers=dn, feature_group_count=c)
        return y.reshape(img.shape)

    def apply(self, key, img, mask):
        sizes = [k | 1 for k in range(self.min_kernel_size, self.max_kernel_size + 1)]
        sizes = sorted(set(sizes))
        idx = jax.random.randint(key, (), 0, len(sizes))
        branches = [(lambda kk: (lambda x: self._blur(x, kk)))(k) for k in sizes]
        return jax.lax.switch(idx, branches, img), mask

    def apply_strength(self, img, mask, strength):
        return self._blur(img, int(strength)), mask


@dataclasses.dataclass
class MedianFilter(Aug):
    min_kernel_size: int = 3
    max_kernel_size: int = 3
    passthrough: bool = True
    name = "median_filter"

    def _median(self, img, k: int):
        k = int(k) | 1
        pad = [(0, 0)] * (img.ndim - 3) + [(k // 2, k // 2), (k // 2, k // 2), (0, 0)]
        p = jnp.pad(img, pad, mode="reflect")
        h, w = img.shape[-3], img.shape[-2]
        patches = [p[..., i:i + h, j:j + w, :] for i in range(k) for j in range(k)]
        med = jnp.median(jnp.stack(patches, axis=0), axis=0)
        if self.passthrough:  # straight-through (valuemetric.py:89-92)
            med = img + jax.lax.stop_gradient(med - img)
        return med

    def apply(self, key, img, mask):
        sizes = sorted(set(k | 1 for k in range(self.min_kernel_size,
                                                self.max_kernel_size + 1)))
        idx = jax.random.randint(key, (), 0, len(sizes))
        branches = [(lambda kk: (lambda x: self._median(x, kk)))(k) for k in sizes]
        return jax.lax.switch(idx, branches, img), mask

    def apply_strength(self, img, mask, strength):
        return self._median(img, int(strength)), mask


@dataclasses.dataclass
class GaussianNoise(Aug):
    min_std: float = 0.0
    max_std: float = 0.1
    name = "gaussian_noise"

    def apply(self, key, img, mask):
        k1, k2 = jax.random.split(key)
        std = _unif(k1, self.min_std, self.max_std)
        return img + std * jax.random.normal(k2, img.shape, img.dtype), mask

    def apply_strength(self, img, mask, strength):
        noise = jax.random.normal(jax.random.PRNGKey(0), img.shape, img.dtype)
        return img + strength * noise, mask


@dataclasses.dataclass
class Grayscale(Aug):
    name = "grayscale"

    def apply(self, key, img, mask):
        return self.apply_strength(img, mask, None)

    def apply_strength(self, img, mask, strength=None):
        g = _luma(img)
        return jnp.broadcast_to(g, img.shape), mask


# ---------------------------------------------------------------------------
# codec attacks (valuemetric.py JPEG; video.py H264/H265 -> on-device proxy)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class JPEG(Aug):
    min_quality: int = 40
    max_quality: int = 80
    name = "jpeg"

    def apply(self, key, img, mask):
        q = jax.random.randint(key, (), self.min_quality, self.max_quality + 1)
        return jpeg_roundtrip(img, q), mask

    def apply_strength(self, img, mask, strength):
        return jpeg_roundtrip(img, jnp.asarray(strength)), mask


# ---------------------------------------------------------------------------
# temporal augs (video.py:262-529; validated but off by default,
# augmentation/__init__.py:100-104)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SpeedChange(Aug):
    """Temporal resample to a new speed, same frame count (video.py:262-316
    static-shape formulation: nearest-frame index remap)."""
    min_speed: float = 0.5
    max_speed: float = 2.0
    name = "speed_change"

    def apply(self, key, img, mask):
        return self.apply_strength(img, mask,
                                   _unif(key, self.min_speed, self.max_speed))

    def apply_strength(self, img, mask, strength):
        f = img.shape[0]
        idx = jnp.clip((jnp.arange(f) * strength).astype(jnp.int32), 0, f - 1)
        return jnp.take(img, idx, axis=0), jnp.take(mask, idx, axis=0)


@dataclasses.dataclass
class TemporalReorder(Aug):
    """Swap adjacent frame pairs within chunks with some probability
    (video.py:319-408)."""
    chunk_size: int = 4
    swap_probability: float = 0.5
    name = "temporal_reorder"

    def apply(self, key, img, mask):
        return self._reorder(key, img, mask, self.swap_probability)

    def apply_strength(self, img, mask, strength):
        if isinstance(strength, tuple):
            _, p = strength
        else:
            p = strength
        return self._reorder(jax.random.PRNGKey(0), img, mask, p)

    def _reorder(self, key, img, mask, p):
        f = img.shape[0]
        half = f // 2
        swap = jax.random.bernoulli(key, p, (half,))
        idx = jnp.arange(f)
        even = idx[: 2 * half : 2]
        odd = idx[1: 2 * half : 2]
        new_even = jnp.where(swap, odd, even)
        new_odd = jnp.where(swap, even, odd)
        perm = idx.at[: 2 * half : 2].set(new_even).at[1: 2 * half : 2].set(new_odd)
        return jnp.take(img, perm, axis=0), jnp.take(mask, perm, axis=0)


@dataclasses.dataclass
class WindowAveraging(Aug):
    """Sliding-window temporal blend (video.py:411-488)."""
    window_size: int = 3
    alpha: float = 1.0
    name = "window_averaging"

    def apply(self, key, img, mask):
        return self.apply_strength(img, mask, (self.window_size, self.alpha))

    def apply_strength(self, img, mask, strength):
        ws, alpha = strength if isinstance(strength, tuple) else (int(strength),
                                                                  self.alpha)
        ws = int(ws)
        f = img.shape[0]
        acc = jnp.zeros_like(img)
        for d in range(-(ws // 2), ws // 2 + 1):
            idx = jnp.clip(jnp.arange(f) + d, 0, f - 1)
            acc = acc + jnp.take(img, idx, axis=0)
        avg = acc / ws
        return alpha * avg + (1 - alpha) * img, mask


@dataclasses.dataclass
class DropFrame(Aug):
    """Replace random frames with their left neighbor (video.py:491-529)."""
    min_prob: float = 0.2
    max_prob: float = 0.5
    name = "drop_frame"

    def apply(self, key, img, mask):
        k1, k2 = jax.random.split(key)
        p = _unif(k1, self.min_prob, self.max_prob)
        return self._drop(k2, img, mask, p)

    def apply_strength(self, img, mask, strength):
        return self._drop(jax.random.PRNGKey(0), img, mask, strength)

    def _drop(self, key, img, mask, p):
        f = img.shape[0]
        drop = jax.random.bernoulli(key, p, (f,))
        drop = drop.at[0].set(False)  # first frame has no left neighbor
        idx = jnp.where(drop, jnp.maximum(jnp.arange(f) - 1, 0), jnp.arange(f))
        return jnp.take(img, idx, axis=0), mask


def _crf_to_quality(crf):
    """Rough CRF->JPEG-quality mapping for the on-device codec proxy."""
    return jnp.clip(100.0 - 2.0 * crf, 5.0, 95.0)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _codec_roundtrip_ste(x, crf, codec, fps):
    """Host codec round trip with identity (straight-through) gradient.

    custom_vjp makes the pure_callback opaque to AD (it has no JVP rule);
    the backward pass is the identity on x — exactly the reference's
    `(codec(x) - x).detach() + x` (video.py:113)."""
    from .. import native

    def host_fn(frames, c):
        return native.video_roundtrip(np.asarray(frames), codec,
                                      crf=int(c), fps=fps)

    return jax.pure_callback(host_fn, jax.ShapeDtypeStruct(x.shape, jnp.float32),
                             x, crf)


def _codec_ste_fwd(x, crf, codec, fps):
    return _codec_roundtrip_ste(x, crf, codec, fps), None


def _codec_ste_bwd(codec, fps, res, g):
    return g, jnp.zeros((), jnp.float32)


_codec_roundtrip_ste.defvjp(_codec_ste_fwd, _codec_ste_bwd)


@dataclasses.dataclass
class VideoCompressionExact(Aug):
    """EXACT codec attack through the native libavcodec runtime with a
    straight-through gradient (parity: augmentation/video.py:106-113 — the
    reference's PyAV round trip). Costs one device->host->device round trip
    per application, exactly like the reference's CPU detour; use
    VideoCompressionProxy for fully on-device steps."""
    min_crf: int = 28
    max_crf: int = 36
    codec: str = "h264"
    fps: int = 24
    name = "h264"

    def __post_init__(self):
        # row names key eval dicts: h265/vp9/... rows must not all collide
        # on the class-level "h264" (ref names each codec class distinctly,
        # augmentation/__init__.py:92-97)
        self.name = self.codec

    def apply(self, key, img, mask):
        crf = jax.random.uniform(key, (), minval=float(self.min_crf),
                                 maxval=float(self.max_crf + 1))
        return self.apply_strength(img, mask, crf)

    def apply_strength(self, img, mask, strength):
        clean = jnp.clip(img.astype(jnp.float32), 0.0, 1.0)
        out = _codec_roundtrip_ste(clean, jnp.asarray(strength, jnp.float32),
                                   self.codec, self.fps)
        return out, mask


@dataclasses.dataclass
class VideoCompressionProxy(Aug):
    """On-device differentiable stand-in for H264/H265/VP9/AV1 (video.py:20-259).

    Per-frame DCT quantization at CRF-derived strength + a light temporal
    window average emulating inter-frame prediction loss. Exact libx264/x265
    round trips live in evals/attacks.py (host-side, eval only).
    """
    min_crf: int = 28
    max_crf: int = 36
    codec: str = "h264"
    temporal_mix: float = 0.15
    name = "h264"

    def __post_init__(self):
        self.name = self.codec  # see VideoCompressionExact.__post_init__

    def apply(self, key, img, mask):
        crf = jax.random.randint(key, (), self.min_crf, self.max_crf + 1)
        return self.apply_strength(img, mask, crf)

    def apply_strength(self, img, mask, strength):
        q = _crf_to_quality(jnp.asarray(strength, jnp.float32))
        out = jpeg_roundtrip(img, q, subsample=(self.codec != "h264rgb"))
        if img.ndim == 4 and img.shape[0] > 1 and self.temporal_mix > 0:
            prev = jnp.concatenate([out[:1], out[:-1]], axis=0)
            nxt = jnp.concatenate([out[1:], out[-1:]], axis=0)
            m = self.temporal_mix
            out = (1 - 2 * m) * out + m * prev + m * nxt
        return out, mask
