"""Render augmented-frame figures (parity: videoseal/augmentation/doaugs.py).

Applies every validation augmentation at each strength to a sample image/clip
and saves the results as PNG grids for eyeballing.

  python -m videoseal_tpu.augmentation.doaugs [--image path] [--out_dir dir]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None)
    ap.add_argument("--out_dir", default="outputs/augs")
    ap.add_argument("--is_video", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp
    from .validation import get_validation_augs
    from ..utils.display import save_img

    if args.image:
        import cv2
        img = cv2.imread(args.image, cv2.IMREAD_COLOR)[..., ::-1]
        img = (img.astype(np.float32) / 255.0)
    else:
        from ..data.datasets import SyntheticImages
        img = SyntheticImages(1, img_size=256)[0][0]

    n = 8 if args.is_video else 1
    batch = jnp.asarray(np.repeat(img[None], n, axis=0))
    mask = jnp.ones(batch.shape[:-1] + (1,))

    os.makedirs(args.out_dir, exist_ok=True)
    for aug, strengths in get_validation_augs(bool(args.is_video)):
        for s in strengths:
            try:
                out, _ = aug.apply_strength(batch, mask, s)
            except Exception as e:  # pragma: no cover - visualization tool
                print(f"skip {aug!r}@{s}: {e}")
                continue
            name = repr(aug).split("(")[0]
            path = os.path.join(args.out_dir, f"{name}_{s}.png")
            save_img(np.asarray(out)[0], path)
            print(f"wrote {path}")


if __name__ == "__main__":
    main()
