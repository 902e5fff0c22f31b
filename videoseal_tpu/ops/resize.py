"""Separable bilinear resize with PyTorch/PIL-matching antialias semantics.

The reference resizes at every pipeline boundary with
``F.interpolate(mode="bilinear", align_corners=False, antialias=True)``
(models/wam.py:88-101, models/videoseal.py:184-186,304-307). Bit-accuracy
parity of converted checkpoints therefore hinges on matching those exact
filter weights.

TPU-first design: instead of gathers, the resize is expressed as two small
dense matmuls (one per spatial axis) with weight matrices precomputed at trace
time from the *static* shapes. Matmuls map straight onto the MXU, XLA fuses the
surrounding elementwise ops, and the same jaxpr is reused for every frame of a
video chunk. The weights replicate ATen's ``upsample_bilinear2d_aa`` /
``upsample_bilinear2d`` behavior:

* half-pixel sampling (align_corners=False): center = scale * (dst + 0.5)
* antialias downscale: triangle filter stretched by the scale factor,
  out-of-range taps dropped and weights renormalized (PIL-compatible)
* upscale (scale <= 1): plain bilinear; identical under both conventions.
"""

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, antialias: bool = True) -> np.ndarray:
    """(out_size, in_size) row-stochastic resampling matrix."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    support = scale if (antialias and scale > 1.0) else 1.0
    inv_scale = 1.0 / scale if (antialias and scale > 1.0) else 1.0

    dst = np.arange(out_size, dtype=np.float64)
    center = scale * (dst + 0.5)
    lo = np.maximum(0, np.floor(center - support + 0.5).astype(np.int64))
    hi = np.minimum(in_size, np.ceil(center + support + 0.5).astype(np.int64))
    max_taps = int((hi - lo).max())

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    taps = lo[:, None] + np.arange(max_taps)[None, :]          # (out, taps)
    t = (taps - center[:, None] + 0.5) * inv_scale
    w = np.maximum(0.0, 1.0 - np.abs(t))                       # triangle filter
    w[taps >= hi[:, None]] = 0.0
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    rows = np.repeat(np.arange(out_size), max_taps)
    cols = np.minimum(taps, in_size - 1).ravel()
    np.add.at(mat, (rows, cols), w.ravel())  # accumulate: clamped pad taps carry weight 0
    return mat.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int, antialias: bool = True,
                    precision: str = "highest", out_dtype=None) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., out_h, out_w, C).

    Matches ``F.interpolate(x, (out_h, out_w), mode="bilinear",
    align_corners=False, antialias=antialias)`` on the reference's tensors.
    ``precision="highest"`` keeps the MXU passes in float32 (the resample
    matrices are sparse triangles; rounding them through bf16 costs ~1 LSB at
    8-bit scale); pass "default" to trade that for single-pass bf16 speed.
    Integer inputs (uint8 video buffers) compute in f32 and return f32
    unless ``out_dtype`` says otherwise.
    """
    h, w = x.shape[-3], x.shape[-2]
    dt = out_dtype
    if dt is None:
        dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    if (h, w) == (out_h, out_w):
        return x.astype(dt)
    mh = jnp.asarray(_resize_matrix(h, out_h, antialias), dtype=jnp.float32)
    mw = jnp.asarray(_resize_matrix(w, out_w, antialias), dtype=jnp.float32)
    y = x.astype(jnp.float32)
    y = jnp.einsum("Hh,...hwc->...Hwc", mh, y, precision=precision)
    y = jnp.einsum("Ww,...hwc->...hWc", mw, y, precision=precision)
    return y.astype(dt)


@functools.lru_cache(maxsize=64)
def _cubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bicubic resampling matrix, torch semantics.

    Matches ``F.interpolate(mode="bicubic", align_corners=False,
    antialias=False)``: Keys cubic kernel with a=-0.75, half-pixel centers,
    border taps clamped. Used for DINOv2 positional-embedding interpolation
    (reference models/extractor.py:72-110 -> dinov2's interpolate_pos_encoding).
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    a = -0.75
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    center = scale * (dst + 0.5) - 0.5
    base = np.floor(center).astype(np.int64)
    frac = center - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)

    def keys(t):
        t = np.abs(t)
        return np.where(
            t <= 1.0, ((a + 2) * t - (a + 3)) * t * t + 1,
            np.where(t < 2.0, (((t - 5) * t + 8) * t - 4) * a, 0.0))

    for k in range(-1, 3):
        w = keys(frac - k)
        cols = np.clip(base + k, 0, in_size - 1)
        np.add.at(mat, (np.arange(out_size), cols), w)
    return mat.astype(np.float32)


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int,
                   precision: str = "highest") -> jnp.ndarray:
    """Bicubic resize of (..., H, W, C), torch ``mode="bicubic"`` semantics."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_cubic_matrix(h, out_h), dtype=jnp.float32)
    mw = jnp.asarray(_cubic_matrix(w, out_w), dtype=jnp.float32)
    y = x.astype(jnp.float32)
    y = jnp.einsum("Hh,...hwc->...Hwc", mh, y, precision=precision)
    y = jnp.einsum("Ww,...hwc->...hWc", mw, y, precision=precision)
    return y.astype(x.dtype)


def resize_to(x: jnp.ndarray, size: int | tuple[int, int], antialias: bool = True) -> jnp.ndarray:
    """Convenience wrapper: square (int) or (h, w) target."""
    if isinstance(size, int):
        size = (size, size)
    return resize_bilinear(x, size[0], size[1], antialias=antialias)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbour x`factor` upsample of (..., H, W, C)."""
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)
