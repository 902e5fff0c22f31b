"""Watermark-mask samplers for localized watermarking (masks.py:45-438).

The reference generates LaMa-style masks with host-side numpy/cv2 (irregular
brush strokes, rectangles, outpainting, superres grids) and mixes them with
an invert probability (masks.py:317-423). TPU redesign: the same mask
FAMILIES are sampled fully on device so the train step never leaves XLA:

  none       -> all-ones (train bits only; all_augs.yaml default)
  full       -> all-ones
  rect       -> 1..4 random axis-aligned rectangles
  blob       -> thresholded smoothed noise (stand-in for irregular brushes)
  outpaint   -> border region (inverted center rectangle)
  mixed      -> random choice among {full, rect, blob, outpaint} + invert prob
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _coord_grids(h, w):
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return ys, xs


def _rect_mask(key, h, w, min_frac=0.2, max_frac=0.8):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rh = jax.random.uniform(k1, (), minval=min_frac, maxval=max_frac) * h
    rw = jax.random.uniform(k2, (), minval=min_frac, maxval=max_frac) * w
    top = jax.random.uniform(k3, ()) * (h - rh)
    left = jax.random.uniform(k4, ()) * (w - rw)
    ys, xs = _coord_grids(h, w)
    return ((ys >= top) & (ys < top + rh) & (xs >= left) & (xs < left + rw)
            ).astype(jnp.float32)


def _rects_mask(key, h, w):
    k0, key = jax.random.split(key)
    n = jax.random.randint(k0, (), 1, 5)
    ks = jax.random.split(key, 4)
    m = jnp.zeros((h, w), jnp.float32)
    for i in range(4):
        r = _rect_mask(ks[i], h, w)
        m = jnp.where(i < n, jnp.maximum(m, r), m)
    return m


def _blob_mask(key, h, w, sharpness=12.0):
    """Smoothed low-res noise thresholded at a random level — irregular blobs."""
    k1, k2 = jax.random.split(key)
    coarse = jax.random.normal(k1, (max(h // 32, 2), max(w // 32, 2)))
    up = jax.image.resize(coarse, (h, w), method="bicubic")
    thr = jax.random.uniform(k2, (), minval=-0.5, maxval=0.8)
    return jax.nn.sigmoid(sharpness * (up - thr)).round()


def _outpaint_mask(key, h, w):
    inner = _rect_mask(key, h, w, min_frac=0.4, max_frac=0.9)
    return 1.0 - inner


def build_mask_sampler(cfg: dict):
    """Returns sampler(key, imgs_w, masks) -> (B, H, W, 1) float mask.

    cfg: {'kind': none|full|rect|blob|outpaint|mixed, 'invert_proba': p}.
    `masks` (dataset segmentation masks, (B,H,W,1)) pass through for kind
    'segmentation' (masks.py:299-302).
    """
    kind = cfg.get("kind", None)
    kind = None if kind in (None, "none", "None") else str(kind)
    invert_p = float(cfg.get("invert_proba", 0.0))

    def ones(key, imgs_w, masks):
        return jnp.ones_like(imgs_w[..., 0:1])

    if kind is None or kind == "full":
        return ones

    def sample_one(key, h, w):
        if kind == "rect":
            return _rects_mask(key, h, w)
        if kind == "blob":
            return _blob_mask(key, h, w)
        if kind == "outpaint":
            return _outpaint_mask(key, h, w)
        if kind == "mixed":
            k0, k1 = jax.random.split(key)
            idx = jax.random.randint(k0, (), 0, 4)
            return jax.lax.switch(idx, [
                lambda k: jnp.ones((h, w), jnp.float32),
                lambda k: _rects_mask(k, h, w),
                lambda k: _blob_mask(k, h, w),
                lambda k: _outpaint_mask(k, h, w),
            ], k1)
        raise ValueError(f"mask kind {kind!r}")

    def sampler(key, imgs_w, masks):
        if kind == "segmentation":
            # dataset/host-provided masks pass through (masks.py:299-302);
            # the host MixedMaskEmbedder path (train.py) feeds batch masks
            # through this kind. Without masks, degrade to full coverage.
            return masks if masks is not None else jnp.ones_like(imgs_w[..., 0:1])
        b, h, w = imgs_w.shape[0], imgs_w.shape[-3], imgs_w.shape[-2]
        keys = jax.random.split(key, b + 1)
        ms = jax.vmap(lambda k: sample_one(k, h, w))(keys[1:])  # (B, H, W)
        if invert_p > 0:
            inv = jax.random.bernoulli(keys[0], invert_p, (b, 1, 1))
            ms = jnp.where(inv, 1.0 - ms, ms)
        return ms[..., None]

    return sampler


def sample_representative_masks(key, h: int, w: int):
    """Fixed set for validation snapshots (masks.py:411-423 analog)."""
    kinds = ["full", "rect", "blob", "outpaint"]
    out = []
    for i, k in enumerate(kinds):
        sampler = build_mask_sampler({"kind": k})
        out.append(sampler(jax.random.fold_in(key, i), jnp.zeros((1, h, w, 1)), None))
    return jnp.concatenate(out, axis=0)
