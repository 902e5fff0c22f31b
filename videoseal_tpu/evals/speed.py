"""Speed harness (parity: videoseal/evals/speed.py:36-306).

Times embed and extract separately (ms/frame) after a compile warmup, device-
resident inputs, block_until_ready timing — the TPU equivalent of the
reference's cuda-synchronized timers.

  python -m videoseal_tpu.evals.speed --card videoseal_1.0 --num_frames 240
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def test_speed(model, frames, num_runs: int = 3, is_video: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    frames = jax.device_put(jnp.asarray(frames, jnp.float32))
    msgs = model.get_random_msg(1 if is_video else frames.shape[0])

    out = model.embed(frames, msgs=msgs, is_video=is_video)
    jax.block_until_ready(out["imgs_w"])  # warmup/compile
    t_embed = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        out = model.embed(frames, msgs=msgs, is_video=is_video)
        jax.block_until_ready(out["imgs_w"])
        t_embed.append(time.perf_counter() - t0)

    imgs_w = out["imgs_w"]
    preds = model.detect(imgs_w, is_video=is_video)["preds"]
    jax.block_until_ready(preds)
    t_extract = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        preds = model.detect(imgs_w, is_video=is_video)["preds"]
        jax.block_until_ready(preds)
        t_extract.append(time.perf_counter() - t0)

    f = frames.shape[0]
    return {
        "frames": f,
        "embed_ms_per_frame": 1e3 * min(t_embed) / f,
        "extract_ms_per_frame": 1e3 * min(t_extract) / f,
        "embed_fps": f / min(t_embed),
        "extract_fps": f / min(t_extract),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num_frames", type=int, default=64)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--num_runs", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import videoseal_tpu as vs
    model = vs.load(args.card, checkpoint=args.checkpoint)
    if args.dtype != "float32":
        model = model.with_dtype(args.dtype)
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (args.num_frames, args.height, args.width, 3)
                         ).astype(np.float32)
    stats = test_speed(model, frames, args.num_runs)
    print(json.dumps({"card": args.card, "dtype": args.dtype,
                      "resolution": f"{args.height}x{args.width}", **stats}))


if __name__ == "__main__":
    main()
