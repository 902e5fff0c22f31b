"""Geometric warp primitives: bilinear sampling, affine/homography warps.

TPU-first replacement for the reference's torchvision functional warps
(augmentation/geometric.py): one gather-based bilinear sampler serves rotate /
perspective / crop-resize, all with static output shapes (XLA-friendly) and
differentiable w.r.t. the input image (gradients flow through the bilinear
weights; zero fill outside, matching torchvision fill=0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample (..., H, W, C) image at float pixel coords (out-of-range -> 0).

    xs, ys: (Ho, Wo) sample locations in input pixel units.
    Returns (..., Ho, Wo, C).
    """
    h, w = img.shape[-3], img.shape[-2]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    tx = xs - x0
    ty = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[..., yc, xc, :]  # (..., Ho, Wo, C)
        return vals * valid[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    tx = tx[..., None]
    ty = ty[..., None]
    return ((1 - ty) * ((1 - tx) * v00 + tx * v01)
            + ty * ((1 - tx) * v10 + tx * v11))


def _grid(h: int, w: int):
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return xs, ys


def warp_affine_inverse(img: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """Warp with the INVERSE 2x3 affine matrix (output->input coords)."""
    h, w = img.shape[-3], img.shape[-2]
    xs, ys = _grid(h, w)
    xi = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    yi = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    return bilinear_sample(img, xi, yi)


def rotate(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate about the center, bilinear, fill 0, expand=False.

    Matches torchvision F.rotate(..., InterpolationMode.BILINEAR) semantics
    (the reference calls F.rotate with default nearest; we use bilinear for
    differentiability — documented deviation, detector-facing effect is
    negligible at the small angles used, and gradients are better behaved).
    """
    h, w = img.shape[-3], img.shape[-2]
    a = -angle_deg * (jnp.pi / 180.0)  # inverse rotation
    ca, sa = jnp.cos(a), jnp.sin(a)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    inv = jnp.array([[ca, -sa, cx - ca * cx + sa * cy],
                     [sa, ca, cy - sa * cx - ca * cy]])
    return warp_affine_inverse(img, inv)


def solve_homography(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """8-dof homography H mapping src -> dst, from 4 point pairs (4,2) each."""
    # build the standard 8x8 system (torchvision _get_perspective_coeffs)
    rows = []
    rhs = []
    for i in range(4):
        sx, sy = src[i, 0], src[i, 1]
        dx, dy = dst[i, 0], dst[i, 1]
        rows.append(jnp.stack([sx, sy, jnp.ones(()), jnp.zeros(()), jnp.zeros(()),
                               jnp.zeros(()), -dx * sx, -dx * sy]))
        rows.append(jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), sx, sy,
                               jnp.ones(()), -dy * sx, -dy * sy]))
        rhs.extend([dx, dy])
    a = jnp.stack(rows)
    b = jnp.stack(rhs)
    coeffs = jnp.linalg.solve(a, b)
    return jnp.concatenate([coeffs, jnp.ones((1,))]).reshape(3, 3)


def warp_perspective(img: jnp.ndarray, startpoints: jnp.ndarray,
                     endpoints: jnp.ndarray) -> jnp.ndarray:
    """torchvision F.perspective: bilinear warp so that endpoints map back to
    startpoints (i.e. sample input at H(end->start) of each output pixel)."""
    hmat = solve_homography(endpoints.astype(jnp.float32),
                            startpoints.astype(jnp.float32))
    h, w = img.shape[-3], img.shape[-2]
    xs, ys = _grid(h, w)
    denom = hmat[2, 0] * xs + hmat[2, 1] * ys + hmat[2, 2]
    xi = (hmat[0, 0] * xs + hmat[0, 1] * ys + hmat[0, 2]) / denom
    yi = (hmat[1, 0] * xs + hmat[1, 1] * ys + hmat[1, 2]) / denom
    return bilinear_sample(img, xi, yi)


def crop_resize(img: jnp.ndarray, top: jnp.ndarray, left: jnp.ndarray,
                crop_h: jnp.ndarray, crop_w: jnp.ndarray) -> jnp.ndarray:
    """Crop a (crop_h, crop_w) window at (top, left) and resample it to the
    full canvas — the static-shape TPU formulation of reference Crop
    (geometric.py:94-124; the downstream detector resize makes it equivalent
    up to one extra bilinear pass)."""
    h, w = img.shape[-3], img.shape[-2]
    xs, ys = _grid(h, w)
    # map output pixel (half-pixel centers) into the crop window
    sx = crop_w.astype(jnp.float32) / w
    sy = crop_h.astype(jnp.float32) / h
    xi = (xs + 0.5) * sx - 0.5 + left
    yi = (ys + 0.5) * sy - 0.5 + top
    return bilinear_sample(img, xi, yi)


def resize_area_scale(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Static-shape stand-in for reference Resize (downscale information loss):
    resize to (out_h, out_w) and back to the original canvas."""
    from .resize import resize_bilinear
    h, w = img.shape[-3], img.shape[-2]
    small = resize_bilinear(img, out_h, out_w)
    return resize_bilinear(small, h, w)
