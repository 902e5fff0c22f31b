"""Benchmark: 1080p frames/sec/chip, embed + extract, flagship card.

Protocol (matches the north star in BASELINE.json): watermark-embed a chunk
of 1080p frames with videoseal_1.0 (256-bit, chunked temporal propagation,
JND attenuation at full res) AND run the extractor over the watermarked
frames. Frames stay device-resident (production serving keeps video buffers
on device; host IO is a separate pipelined path). Reports one JSON line;
vs_baseline is the ratio to the 2,000 fps/chip target.

Usage: python bench.py [--frames 64] [--runs 5] [--height 1080 --width 1920]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--dtype", default="bfloat16",
                    help="model compute dtype (full-res blend stays f32)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import videoseal_tpu as vs
    from videoseal_tpu.models.videoseal import embed_pipeline, detect_pipeline

    model = vs.load(args.card)
    if args.dtype != "float32":
        model = model.with_dtype(args.dtype)
    cfg = model.cfg
    emb_mod, ext_mod = model.embedder_spec.module, model.extractor_spec.module
    evars, xvars = model.embedder_vars, model.extractor_vars
    att = model.attenuation

    @jax.jit
    def embed_extract(frames, msgs):
        imgs_w, _ = embed_pipeline(emb_mod, att, cfg, evars, frames, msgs,
                                   jnp.float32(0.2), jnp.float32(1.0),
                                   is_video=True, lowres_attenuation=False)
        preds = detect_pipeline(ext_mod, cfg, xvars, imgs_w)
        return imgs_w, preds

    rng = np.random.default_rng(0)
    frames = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (args.frames, args.height, args.width, 3)), jnp.float32))
    msgs = jnp.asarray(rng.integers(0, 2, (1, cfg.nbits)), jnp.int32)

    # warmup/compile
    out = embed_extract(frames, msgs)
    jax.block_until_ready(out)

    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out = embed_extract(frames, msgs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    best = min(times)
    fps = args.frames / best
    print(json.dumps({
        "metric": f"{args.height}p_frames_per_sec_embed_extract",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
