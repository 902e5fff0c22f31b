"""Video watermarking walkthrough (analog of notebooks/video_inference.ipynb).

  python examples/video_watermarking.py --input in.mp4
  python examples/video_watermarking.py            # synthetic clip
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="outputs/example_video.mp4")
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()

    import os
    import videoseal_tpu as vs
    from videoseal_tpu import native
    from videoseal_tpu.ops import metrics
    from videoseal_tpu.evals.attacks import video_codec_exact

    model = vs.load(args.card, checkpoint=args.checkpoint)

    if args.input:
        r = native.VideoReader(args.input)
        clip = r.read(args.frames).astype(np.float32) / 255.0
        fps = int(round(r.fps))
        r.close()
    else:
        from videoseal_tpu.evals.full import synthetic_samples
        clip = next(synthetic_samples(1, (args.frames, 360, 640, 3)))
        fps = 24

    out = model.embed(clip, is_video=True)
    imgs_w = np.asarray(out["imgs_w"])
    msgs = np.asarray(out["msgs"])[:1]
    print(f"embedded; PSNR {float(metrics.psnr(out['imgs_w'], clip, is_video=True)):.2f} dB")

    attacked = video_codec_exact(imgs_w, "h264", crf=30) \
        if native.available() else imgs_w
    msg = np.asarray(model.extract_message(attacked))
    acc = float((msg == (msgs > 0.5)).mean())
    print(f"bit accuracy after H264 crf30: {acc:.4f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if native.available():
        native.encode_file(args.out, imgs_w, codec="h264", crf=18, fps=fps)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
