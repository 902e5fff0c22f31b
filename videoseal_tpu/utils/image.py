"""Image utilities (parity: videoseal/utils/image.py:13-117)."""

from __future__ import annotations

import numpy as np


def jpeg_compress(img: np.ndarray, quality: int) -> np.ndarray:
    """Exact libjpeg round trip of (H, W, 3) [0,1] RGB (image.py:13-37)."""
    from ..evals.attacks import jpeg_exact
    return jpeg_exact(img, quality)


def webp_compress(img: np.ndarray, quality: int) -> np.ndarray:
    """WebP round trip (image.py:40-58)."""
    from ..evals.attacks import webp_exact
    return webp_exact(img, quality)


def median_filter(img, kernel_size: int = 3):
    """Window median of (..., H, W, C) (image.py:60-85); jittable."""
    from ..augmentation.augs import MedianFilter
    return MedianFilter(passthrough=False)._median(img, kernel_size)


def create_diff_img(a, b, gain: float = 10.0):
    """Amplified |a-b| (image.py:87-105)."""
    from .display import create_diff_img as _cdi
    return _cdi(a, b, gain)
