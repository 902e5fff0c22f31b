"""One-shot watermark forging/removal (parity: wmforger/optimize_image.py:25-76).

Loads a trained preference model and SGD-optimizes an additive perturbation
that maximizes the "real-ness" score of an image. The resulting residual is
the estimated watermark: subtracting it cleans the image; adding it onto
another image forges the watermark.

  python -m videoseal_tpu.wmforger.optimize_image --image in.png \
      --ckpt_path wmforger_ckpt.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def optimize(img: np.ndarray, extractor, params, num_steps: int = 50,
             lr: float = 0.05):
    """img: (H, W, 3) [0,1]. Returns optimized image (reference :40-47)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(img)[None]

    @jax.jit
    def step(pert):
        def loss(p):
            return -jnp.mean(extractor.apply(
                {"params": params}, jnp.clip(x + p, 0, 1))[..., 0])
        g = jax.grad(loss)(pert)
        return pert - lr * g

    pert = jnp.zeros_like(x)
    for _ in range(num_steps):
        pert = step(pert)
    return np.asarray(jnp.clip(x + pert, 0, 1)[0])


def get_watermark(img: np.ndarray, optimized: np.ndarray):
    """Residual = original - cleaned (reference :50-55)."""
    cleaned = np.round(optimized * 255.0) / 255.0
    watermark = img - cleaned
    return cleaned, watermark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--output_dir", default="output")
    args = ap.parse_args()

    import os
    import cv2
    import jax

    from ..models.extractor import build_extractor
    from ..utils.checkpoint import unflatten_tree

    data = np.load(args.ckpt_path)
    params = unflatten_tree({k: data[k] for k in data.files})["params"]
    dims = params["encoder"]["stem_conv"]["kernel"].shape[-1]
    depth3 = sum(1 for k in params["encoder"] if k.startswith("stage2_block"))
    enc = {"depths": [3, 3, depth3, 3] if depth3 > 2 else [1, 1, depth3, 1],
           "dims": [dims, dims * 2, dims * 4, dims * 8]}
    spec = build_extractor("convnext_tiny", {
        "encoder": enc,
        "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                          "embed_dim": dims * 8, "sigmoid_output": False}},
        256, nbits=0)

    img = cv2.imread(args.image, cv2.IMREAD_COLOR)[..., ::-1].astype(np.float32) / 255
    optimized = optimize(img, spec.module, params, args.num_steps, args.lr)
    cleaned, watermark = get_watermark(img, optimized)

    os.makedirs(args.output_dir, exist_ok=True)
    cv2.imwrite(os.path.join(args.output_dir, "cleaned_image.png"),
                np.clip(cleaned * 255 + 0.5, 0, 255).astype(np.uint8)[..., ::-1])
    cv2.imwrite(os.path.join(args.output_dir, "watermark.png"),
                np.clip(np.abs(watermark) * 16 * 255, 0, 255).astype(np.uint8)[..., ::-1])
    print(f"wrote {args.output_dir}/cleaned_image.png and watermark.png")


if __name__ == "__main__":
    main()
