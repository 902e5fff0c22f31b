"""Quantify the quality delta between the two planar serving JND placements.

The reference's video serving runs the JND attenuation at PROCESSING
resolution (`lowres_attenuation=True`: reference inference_streaming.py:28,
evals/full.py:13,20 "recommended for high-res", impl
videoseal/models/videoseal.py:321-331); full-res JND is the image-mode
default. Round 5 made lowres the scored planar bench mode, so this harness
records what that placement costs in quality: per-mode PSNR/SSIM/L-inf vs
the original frames, bit accuracy through the extractor, and the
mode-vs-mode pixel delta.

  python -m videoseal_tpu.evals.lowres_quality --height 1080 --width 1920

Output: one JSON line per mode plus a `delta` line, e.g. appended to
PERF.md's round-5 notes.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def run(card: str, height: int, width: int, frames: int, seed: int) -> list[dict]:
    import jax.numpy as jnp

    from .. import load
    from ..kernels.fused_planar import pack_planar, unpack_planar
    from ..ops.metrics import psnr, ssim

    model = load(card)
    rng = np.random.default_rng(seed)
    # smooth-ish synthetic content: JND heatmaps on pure noise saturate,
    # which would understate the placement difference
    low = rng.uniform(0, 255, (frames, height // 8, width // 8, 3))
    imgs = np.clip(
        np.kron(low, np.ones((1, 8, 8, 1))) +
        rng.normal(0, 6, (frames, height, width, 3)), 0, 255
    ).astype(np.uint8)
    imgs_p = pack_planar(jnp.asarray(imgs))
    msgs = model.get_random_msg(1)
    bits = np.asarray(msgs)[0]

    out = []
    wm = {}
    for mode in (False, True):
        o = model.embed_planar(imgs_p, height, width, msgs=msgs,
                               lowres_attenuation=mode)
        w = np.asarray(unpack_planar(o["imgs_w"], height, width))
        wm[mode] = w
        x = jnp.asarray(imgs, jnp.float32) / 255.0
        y = jnp.asarray(w, jnp.float32) / 255.0
        det = np.asarray(model.detect_planar(o["imgs_w"], height, width)["preds"])
        per_frame = ((det[:, 1:] > 0).astype(np.float32) == bits).mean()
        pooled = ((det[:, 1:].mean(0) > 0).astype(np.float32) == bits).mean()
        out.append({
            "mode": "lowres_attenuation" if mode else "fullres_jnd",
            "psnr": round(float(jnp.mean(psnr(x, y))), 3),
            "ssim": round(float(jnp.mean(ssim(x, y))), 5),
            "linf_u8": int(np.abs(w.astype(np.int16)
                                  - imgs.astype(np.int16)).max()),
            "bit_acc_per_frame": round(float(per_frame), 4),
            "bit_acc_pooled": round(float(pooled), 4),
        })
    d = np.abs(wm[True].astype(np.int16) - wm[False].astype(np.int16))
    out.append({"mode": "delta_lowres_vs_fullres",
                "max_u8": int(d.max()),
                "mean_u8": round(float(d.mean()), 4),
                "psnr_delta": round(out[1]["psnr"] - out[0]["psnr"], 3),
                "bit_acc_pooled_delta": round(
                    out[1]["bit_acc_pooled"] - out[0]["bit_acc_pooled"], 4)})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    for row in run(args.card, args.height, args.width, args.frames, args.seed):
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
