"""Image watermarking walkthrough (analog of notebooks/image_inference.ipynb).

  python examples/image_watermarking.py [--image path.png] [--checkpoint ckpt]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None)
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out_dir", default="outputs/example")
    args = ap.parse_args()

    import os
    import videoseal_tpu as vs
    from videoseal_tpu.ops import metrics
    from videoseal_tpu.utils.display import save_img, create_diff_img
    from videoseal_tpu.evals.attacks import jpeg_exact

    model = vs.load(args.card, checkpoint=args.checkpoint)

    if args.image:
        import cv2
        img = cv2.imread(args.image, cv2.IMREAD_COLOR)[..., ::-1]
        img = (img.astype(np.float32) / 255.0)[None]
    else:
        from videoseal_tpu.data.datasets import SyntheticImages
        img = SyntheticImages(1, img_size=512)[0][0][None]

    out = model.embed(img, is_video=False)
    imgs_w, msgs = np.asarray(out["imgs_w"]), np.asarray(out["msgs"])
    psnr = float(metrics.psnr(out["imgs_w"], img)[0])
    print(f"embedded {model.nbits} bits; PSNR {psnr:.2f} dB")

    # clean + attacked decode
    for name, attacked in [("clean", imgs_w),
                           ("jpeg50", jpeg_exact(imgs_w, 50))]:
        preds = model.detect(attacked, is_video=False)["preds"]
        bits = np.asarray(preds)[..., 1:] > 0
        acc = float((bits == (msgs > 0.5)).mean())
        print(f"bit accuracy after {name}: {acc:.4f}")

    os.makedirs(args.out_dir, exist_ok=True)
    save_img(img[0], os.path.join(args.out_dir, "original.png"))
    save_img(imgs_w[0], os.path.join(args.out_dir, "watermarked.png"))
    save_img(create_diff_img(img[0], imgs_w[0]),
             os.path.join(args.out_dir, "difference_x10.png"))
    print(f"wrote {args.out_dir}/{{original,watermarked,difference_x10}}.png")


if __name__ == "__main__":
    main()
