"""Color-space conversions (NHWC, analog YUV as used by the reference).

Coefficients match the reference exactly (videoseal/data/transforms.py:15-62)
so a converted checkpoint sees identical luminance inputs. All functions
operate on arrays shaped (..., 3) — channels last, TPU-native layout.

Implementation note: written as explicit fused multiply-adds rather than a
3x3 matmul — exact in float32 regardless of the backend's default matmul
precision (TPU f32 matmuls default to bf16 passes) and trivially fused into
neighbouring elementwise work by XLA on the VPU.
"""

import jax.numpy as jnp

# BT.601-style analog YUV (same constants as transforms.py:18-21, 33-35)
_R2Y = (0.299, 0.587, 0.114)
_R2U = (-0.14713, -0.28886, 0.436)
_R2V = (0.615, -0.51499, -0.10001)
_Y2R = (1.0, 0.0, 1.13983)
_Y2G = (1.0, -0.39465, -0.58060)
_Y2B = (1.0, 2.03211, 0.0)


def _mix(x: jnp.ndarray, rows) -> jnp.ndarray:
    c0, c1, c2 = x[..., 0], x[..., 1], x[..., 2]
    outs = [r[0] * c0 + r[1] * c1 + r[2] * c2 for r in rows]
    return jnp.stack(outs, axis=-1)


def rgb_to_yuv(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB -> YUV. Mirrors transforms.py:45-52."""
    return _mix(x, (_R2Y, _R2U, _R2V))


def yuv_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) YUV -> RGB. Mirrors transforms.py:55-62."""
    return _mix(x, (_Y2R, _Y2G, _Y2B))


def rgb_to_y(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB -> (..., 1) luminance (Y of rgb_to_yuv).

    Used by YUV embedders that watermark the luminance channel only
    (models/wam.py:93-96).
    """
    y = _R2Y[0] * x[..., 0] + _R2Y[1] * x[..., 1] + _R2Y[2] * x[..., 2]
    return y[..., None]
