"""Validation attack sweeps (parity: videoseal/augmentation/__init__.py:12-124).

Returns [(aug, [strengths...]), ...] — the robustness evaluation grid. Codec
attacks use the on-device proxy by default; evals/attacks.py can substitute
exact host codecs where libjpeg/PIL is available.
"""

from __future__ import annotations

from . import augs as A


class Sequential(A.Aug):
    """Chain augs with per-aug strength tuples (sequential.py:8-31)."""

    def __init__(self, *augs):
        self.augs = augs
        self.name = "+".join(a.name for a in augs)

    def apply(self, key, img, mask):
        import jax
        for a in self.augs:
            key, k = jax.random.split(key)
            img, mask = a.apply(k, img, mask)
        return img, mask

    def apply_strength(self, img, mask, strengths):
        for a, s in zip(self.augs, strengths):
            img, mask = a.apply_strength(img, mask, s)
        return img, mask

    def __repr__(self):
        return "_".join(repr(a) for a in self.augs)


def _codec(codec: str, jittable: bool = False):
    """Exact native codec when available, differentiable proxy otherwise.

    jittable=True forces the on-device proxy even when the native runtime is
    present — the in-training eval jits every row once at construction
    (evals/intrain.py), and a host codec cannot live inside jit."""
    from .. import native
    if not jittable and native.available() and native.codec_available(codec):
        return A.VideoCompressionExact(codec=codec)
    return A.VideoCompressionProxy(codec=codec)


def get_validation_augs_subset(is_video: bool = False,
                               jittable: bool = False) -> list:
    return [
        (A.Identity(), [0]),
        (A.Crop(), [0.71]),
        (A.Brightness(), [1.5]),
        (A.JPEG(), [60]) if not is_video else (_codec("h264", jittable), [30]),
    ]


def get_validation_augs_geometric(is_video: bool = False,
                                  jittable: bool = False) -> list:
    """Compact grid for tracking geometric-robustness training (Stage-C).

    Not a reference grid: the reference's in-training sweep uses the full or
    subset grids above; this one exists because each row is a separately
    jitted program and the full grid (~80 rows) costs minutes of remote
    compiles per training run, while the subset grid has no rotate or
    perspective row to watch."""
    return [
        (A.Identity(), [0]),
        (A.Rotate(), [10, 30]),
        (A.Crop(), [0.5]),
        (A.Perspective(), [0.3, 0.5]),
        (A.Brightness(), [1.5]),
        (A.JPEG(), [60]) if not is_video else (_codec("h264", jittable), [30]),
    ]


def get_combined_augs(is_video: bool = False, jittable: bool = False) -> list:
    first = (_codec("h264", jittable) if is_video else A.JPEG())
    vals = [23, 30, 40, 50] if is_video else [40, 60, 80]
    return [(Sequential(first, A.Crop(), A.Brightness()), [(v, 0.71, 0.5)])
            for v in vals]


def get_validation_augs(is_video: bool = False, only_identity: bool = False,
                        only_combined: bool = False,
                        extended: bool = False,
                        jittable: bool = False) -> list:
    """Mirror of augmentation/__init__.py:58-124 strength grids.

    `extended` adds rows the reference registers as attacks but leaves out of
    (or comments out of) its default grid: MedianFilter / GaussianNoise /
    Saturation sweeps for images (wmforger/augmentation/__init__.py:91,120)
    and an AV1 CRF sweep for video (video.py:224-242).
    """
    if only_identity:
        return [(A.Identity(), [0])]
    if only_combined:
        return get_combined_augs(is_video, jittable)
    if is_video:
        extra = [(_codec("av1", jittable), [30, 40, 50])] if extended else []
        return [
            (A.Identity(), [0]),
            (A.HorizontalFlip(), [0]),
            (A.Rotate(), [10, 90]),
            (A.Resize(), [0.55, 0.71]),
            (A.Crop(), [0.55, 0.71]),
            (A.Perspective(), [0.5]),
            (A.Brightness(), [0.5, 1.5]),
            (A.Contrast(), [0.5, 1.5]),
            (A.Saturation(), [0.5, 1.5]),
            (A.Hue(), [0.25]),
            (A.Grayscale(), [-1]),
            (A.JPEG(), [40]),
            (A.GaussianBlur(), [9]),
            (_codec("h264", jittable), [23, 30, 40, 50]),
            (_codec("h264rgb", jittable), [23, 30, 40, 50]),
            (_codec("h265", jittable), [23, 30, 40, 50]),
            (_codec("vp9", jittable), [-1]),  # default-bitrate mode (ref __init__.py:92)
            *extra,
            *get_combined_augs(is_video=True, jittable=jittable),
        ]
    extra = ([(A.Saturation(), [0.5, 1.0, 1.5, 2.0]),
              (A.MedianFilter(), [3, 5, 9, 13, 17]),
              (A.GaussianNoise(), [0.02, 0.04, 0.08, 0.12, 0.16])]
             if extended else [])
    return [
        (A.Identity(), [0]),
        (A.HorizontalFlip(), [0]),
        (A.Rotate(), [5, 10, 30, 45, 90]),
        (A.Resize(), [0.32, 0.45, 0.55, 0.63, 0.71, 0.77, 0.84, 0.89, 0.95, 1.00]),
        (A.Crop(), [0.32, 0.45, 0.55, 0.63, 0.71, 0.77, 0.84, 0.89, 0.95, 1.00]),
        (A.Perspective(), [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8]),
        (A.Brightness(), [0.1, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0]),
        (A.Contrast(), [0.1, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0]),
        (A.Hue(), [-0.4, -0.3, -0.2, -0.1, 0.0, 0.1, 0.2, 0.3, 0.4, 0.5]),
        (A.Grayscale(), [-1]),
        (A.JPEG(), [40, 50, 60, 70, 80, 90]),
        (A.GaussianBlur(), [3, 5, 9, 13, 17]),
        *extra,
        *get_combined_augs(is_video=False),
    ]
