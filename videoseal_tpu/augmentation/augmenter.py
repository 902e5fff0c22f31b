"""Augmenter: probability-weighted attack sampler (augmenter.py:60-199).

The reference picks one aug per step with `torch.multinomial` and calls it in
Python. Here aug selection is a traced `lax.switch`, so the entire
"composite mask -> sample attack -> apply" chain lives inside the jitted
train step — no host round trips, fully differentiable (codec attacks carry
straight-through gradients).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import augs as A
from .masks import build_mask_sampler

name2aug = {
    "identity": A.Identity,
    "rotate": A.Rotate,
    "resize": A.Resize,
    "crop": A.Crop,
    "perspective": A.Perspective,
    "hflip": A.HorizontalFlip,
    "jpeg": A.JPEG,
    "gaussian_blur": A.GaussianBlur,
    "median_filter": A.MedianFilter,
    "brightness": A.Brightness,
    "contrast": A.Contrast,
    "saturation": A.Saturation,
    "hue": A.Hue,
    "gaussian_noise": A.GaussianNoise,
    "grayscale": A.Grayscale,
    "h264": lambda **kw: A.VideoCompressionProxy(codec="h264", **kw),
    "h264rgb": lambda **kw: A.VideoCompressionProxy(codec="h264rgb", **kw),
    "h265": lambda **kw: A.VideoCompressionProxy(codec="h265", **kw),
    "video_compression": lambda **kw: A.VideoCompressionProxy(codec="h264", **kw),
    # exact host codecs (native libavcodec, straight-through gradient)
    "h264_exact": lambda **kw: A.VideoCompressionExact(codec="h264", **kw),
    "h264rgb_exact": lambda **kw: A.VideoCompressionExact(codec="h264rgb", **kw),
    "h265_exact": lambda **kw: A.VideoCompressionExact(codec="h265", **kw),
    "vp9_exact": lambda **kw: A.VideoCompressionExact(codec="vp9", **kw),
    "av1_exact": lambda **kw: A.VideoCompressionExact(codec="av1", **kw),
    # temporal augs (video.py:262-529)
    "speed_change": A.SpeedChange,
    "temporal_reorder": A.TemporalReorder,
    "window_averaging": A.WindowAveraging,
    "drop_frame": A.DropFrame,
}
video_augs = ["video_compression", "h264", "h264rgb", "h265",
              "h264_exact", "h264rgb_exact", "h265_exact", "vp9_exact",
              "av1_exact", "speed_change", "temporal_reorder",
              "window_averaging", "drop_frame"]


class Augmenter:
    """Parity: augmenter.py:60-199 (sans host mask embedder; masks sampled
    on device via masks.build_mask_sampler)."""

    def __init__(self, augs: dict, augs_params: dict, masks: dict | None = None,
                 num_augs: int = 1):
        self.num_augs = num_augs
        self.mask_sampler = build_mask_sampler(masks or {"kind": None})
        self.augs, self.probs = self._parse(augs, augs_params, is_video=False)
        self.augs_video, self.probs_video = self._parse(augs, augs_params, is_video=True)

    @staticmethod
    def _parse(augs: dict, augs_params: dict, is_video: bool):
        out, probs = [], []
        for name, p in augs.items():
            if name in video_augs and not is_video:
                continue
            params = dict(augs_params.get(name, {}))
            if name not in name2aug:
                raise ValueError(f"Augmentation {name} not found. Add it in name2aug.")
            out.append(name2aug[name](**params))
            probs.append(float(p))
        pr = np.asarray(probs, np.float32)
        return out, pr / pr.sum()

    def aug_names(self, is_video: bool = False):
        augs = self.augs_video if is_video else self.augs
        return [a.name for a in augs]

    def __call__(self, key, imgs_w, imgs, masks=None, is_video: bool = False,
                 train: bool = True):
        """Returns (imgs_aug, mask_targets, selected_idx[num_augs])."""
        augs = self.augs_video if is_video else self.augs
        probs = jnp.asarray(self.probs_video if is_video else self.probs)
        k_mask, key = jax.random.split(key)
        if train:
            mask_targets = self.mask_sampler(k_mask, imgs_w, masks)
            imgs_aug = imgs_w * mask_targets + imgs * (1 - mask_targets)
        else:
            mask_targets = jnp.ones_like(imgs_w[..., 0:1])
            imgs_aug = imgs_w

        branches = [
            (lambda aug: (lambda op: aug.apply(op[0], op[1], op[2])))(a) for a in augs
        ]
        selected = []
        for _ in range(self.num_augs):
            k_sel, k_app, key = jax.random.split(key, 3)
            idx = jax.random.choice(k_sel, len(augs), p=probs)
            imgs_aug, mask_targets = jax.lax.switch(
                idx, branches, (k_app, imgs_aug, mask_targets))
            selected.append(idx)
        return imgs_aug, mask_targets, jnp.stack(selected)


def get_dummy_augmenter() -> Augmenter:
    """Identity-only augmenter used at inference (augmenter.py:49-57)."""
    return Augmenter(augs={"identity": 1}, augs_params={}, masks={"kind": None})


def build_augmenter(cfg: dict, num_augs: int = 1) -> Augmenter:
    """From an all_augs.yaml-style dict {masks, augs, augs_params}."""
    return Augmenter(augs=cfg.get("augs", {"identity": 1}),
                     augs_params=cfg.get("augs_params", {}),
                     masks=cfg.get("masks", {"kind": None}),
                     num_augs=num_augs)
