"""Just-Noticeable-Difference perceptual heatmap (fixed, parameter-free).

Parity with videoseal/modules/jnd.py:11-115: luminance masking (5x5 weighted
kernel) + contrast masking (Sobel gradients), combined with an overlap term.
The reference stores the fixed kernels as frozen grouped convs; here they are
compile-time constants so XLA folds them. This whole computation is pure
elementwise + two tiny stencils — at full resolution it is HBM-bandwidth
bound, which is why the fused Pallas attenuate+blend kernel
(videoseal_tpu/kernels/fused_blend.py) inlines it.

Config variants jnd_1_1 / 1_3 / 3_1 / 3_3 (configs/attenuation.yaml) =
(in_channels, out_channels) of the heatmap: 1 -> operate on luminance, 3 ->
per-RGB-channel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_SOBEL_X = np.array([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]], np.float32)
_SOBEL_Y = np.array([[1., 2., 1.], [0., 0., 0.], [-1., -2., -1.]], np.float32)
_LUM = np.array([[1., 1., 1., 1., 1.],
                 [1., 2., 2., 2., 1.],
                 [1., 2., 0., 2., 1.],
                 [1., 2., 2., 2., 1.],
                 [1., 1., 1., 1., 1.]], np.float32)
_RGB_W = (0.299, 0.587, 0.114)


def _depthwise(x: jnp.ndarray, kern2d: np.ndarray) -> jnp.ndarray:
    """Same-padded depthwise stencil on (B, H, W, C) with a shared 2D kernel."""
    k = kern2d.shape[0]
    c = x.shape[-1]
    w = jnp.asarray(np.tile(kern2d[:, :, None, None], (1, 1, 1, c)))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2, dimension_numbers=dn,
        feature_group_count=c)


@dataclasses.dataclass(frozen=True)
class JND:
    """jnd.py:11-115. in_channels=1: luminance path; 3: per-channel."""
    in_channels: int = 1
    out_channels: int = 3
    blue: bool = False
    apply_mode: str = "multiply"

    def _la(self, x255: jnp.ndarray, alpha: float = 1.0, eps: float = 1e-5) -> jnp.ndarray:
        """Luminance masking (jnd.py:63-69); x255 in [0, 255]."""
        la = _depthwise(x255, _LUM) / 32.0
        lo = 17.0 * (1.0 - jnp.sqrt(jnp.maximum(la, 0.0) / 127.0 + eps))
        hi = 3.0 / 128.0 * (la - 127.0) + 3.0
        return alpha * jnp.where(la <= 127.0, lo, hi)

    def _cm(self, x255: jnp.ndarray, beta: float = 0.117) -> jnp.ndarray:
        """Contrast masking (jnd.py:71-77)."""
        gx = _depthwise(x255, _SOBEL_X)
        gy = _depthwise(x255, _SOBEL_Y)
        # floored sqrt: flat 3x3 regions (gx = gy = 0) are common in real
        # frames and d(sqrt)/dx would be NaN there when JND sits inside the
        # training graph (trainer.py applies it after blending)
        cm = jnp.sqrt(jnp.maximum(gx * gx + gy * gy, 1e-12))
        cm = 16.0 * cm ** 2.4 / (cm * cm + 26.0 ** 2)
        return beta * cm

    def heatmaps(self, imgs: jnp.ndarray, clc: float = 0.3) -> jnp.ndarray:
        """(..., H, W, 3) in [0,1] -> heatmap (..., H, W, out_channels) (jnd.py:80-108)."""
        shape = imgs.shape
        x = imgs.reshape((-1,) + shape[-3:]).astype(jnp.float32) * 255.0
        if self.in_channels == 1:
            x = (_RGB_W[0] * x[..., 0] + _RGB_W[1] * x[..., 1]
                 + _RGB_W[2] * x[..., 2])[..., None]
        la = self._la(x)
        cm = self._cm(x)
        h = jnp.maximum(la + cm - clc * jnp.minimum(la, cm), 0.0)
        if self.out_channels == 3 and self.in_channels == 1:
            h = jnp.tile(h, (1, 1, 1, 3))
            if self.blue:
                h = h * jnp.asarray([0.5, 0.5, 1.0])
        elif self.out_channels == 1 and self.in_channels == 3:
            h = jnp.sum(h / 3.0, axis=-1, keepdims=True)
        h = h / 255.0
        return h.reshape(shape[:-1] + (self.out_channels,)).astype(imgs.dtype)

    def heatmap_lum(self, imgs: jnp.ndarray, clc: float = 0.3) -> jnp.ndarray:
        """TPU fast path of the in_channels=1 heatmap: (..., H, W, 3) in
        [0,1] -> (..., H, W) heat in [0,1], identical math to
        `heatmaps(...)[..., 0]` for jnd_1_*.

        Single-channel grouped convs map terribly onto the MXU (1x1 of a
        128x128 systolic array), so this formulates the two stencils as
        shift-adds on 2D luminance planes — the 5x5 LUM kernel is
        (5x5 box) + (3x3 box) - 2*center, both boxes separable, and Sobel is
        separable too; XLA fuses the whole chain into one VPU pass. Used by
        the lowres-attenuation planar serving mode (proc-res heatmaps,
        reference videoseal.py:321-331)."""
        shape = imgs.shape
        x = imgs.reshape((-1,) + shape[-3:]).astype(jnp.float32) * 255.0
        lum = (_RGB_W[0] * x[..., 0] + _RGB_W[1] * x[..., 1]
               + _RGB_W[2] * x[..., 2])                       # (B, H, W)
        b, h, w = lum.shape
        p = jnp.pad(lum, ((0, 0), (2, 2), (2, 2)))

        def vsum(src, n, top):
            acc = jax.lax.slice(src, (0, top, 0), (b, top + h, w + 4))
            for d in range(1, n):
                acc = acc + jax.lax.slice(src, (0, top + d, 0),
                                          (b, top + d + h, w + 4))
            return acc

        def hsum(src, n, left):
            acc = jax.lax.slice(src, (0, 0, left), (b, h, left + w))
            for d in range(1, n):
                acc = acc + jax.lax.slice(src, (0, 0, left + d),
                                          (b, h, left + d + w))
            return acc

        col5, col3 = vsum(p, 5, 0), vsum(p, 3, 1)
        la = (hsum(col5, 5, 0) + hsum(col3, 3, 1) - 2.0 * lum) * (1.0 / 32.0)
        lo = 17.0 * (1.0 - jnp.sqrt(jnp.maximum(la, 0.0) * (1.0 / 127.0)
                                    + 1e-5))
        hi = (3.0 / 128.0) * (la - 127.0) + 3.0
        la = jnp.where(la <= 127.0, lo, hi)

        t = (jax.lax.slice(p, (0, 1, 0), (b, 1 + h, w + 4))
             + 2.0 * jax.lax.slice(p, (0, 2, 0), (b, 2 + h, w + 4))
             + jax.lax.slice(p, (0, 3, 0), (b, 3 + h, w + 4)))
        gx = (jax.lax.slice(t, (0, 0, 3), (b, h, 3 + w))
              - jax.lax.slice(t, (0, 0, 1), (b, h, 1 + w)))
        s_diff = (jax.lax.slice(p, (0, 1, 0), (b, 1 + h, w + 4))
                  - jax.lax.slice(p, (0, 3, 0), (b, 3 + h, w + 4)))
        gy = (jax.lax.slice(s_diff, (0, 0, 1), (b, h, 1 + w))
              + 2.0 * jax.lax.slice(s_diff, (0, 0, 2), (b, h, 2 + w))
              + jax.lax.slice(s_diff, (0, 0, 3), (b, h, 3 + w)))
        cm2 = gx * gx + gy * gy
        cm = jnp.sqrt(jnp.maximum(cm2, 1e-12))
        cm = 0.117 * (16.0 * cm ** 2.4 / (cm2 + 26.0 ** 2))
        heat = jnp.maximum(la + cm - clc * jnp.minimum(la, cm), 0.0)
        return (heat * (1.0 / 255.0)).reshape(shape[:-1]).astype(imgs.dtype)

    def __call__(self, imgs: jnp.ndarray, imgs_w: jnp.ndarray) -> jnp.ndarray:
        """imgs + hmaps * (imgs_w - imgs) (jnd.py:110-114)."""
        return imgs + self.heatmaps(imgs) * (imgs_w - imgs)


def build_attenuation(name: str | None) -> JND | None:
    """Resolve 'jnd_I_O' config names (configs/attenuation.yaml)."""
    if name is None or str(name).lower() in ("none", "null", ""):
        return None
    if name.startswith("jnd"):
        parts = name.split("_")
        in_c = int(parts[1]) if len(parts) > 1 else 1
        out_c = int(parts[2]) if len(parts) > 2 else 3
        return JND(in_channels=in_c, out_channels=out_c)
    raise NotImplementedError(f"attenuation {name!r}")
