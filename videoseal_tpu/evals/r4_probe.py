"""Round-4 regression attribution probe (perf tool).

BENCH went 1697 -> 1662 after (TH=96, fused detect downscale, per-dy dwconv,
multi-block ConvNeXt). This isolates each suspect on the real chip:

  blend          fused_jnd_blend_planar, no detect output
  blend+detect   same kernel with detect_size=256 (in-kernel downscale)
  resize_det     the old detect-side resize it replaces
  extractor_multi  detect over proc-res frames, multi-block kernels (current)
  extractor_single same with blocks_per_step forced to 1 (round-3 form)

Usage: python -m videoseal_tpu.evals.r4_probe [--stages blend,extract]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--stages", default="blend,extract")
    args = ap.parse_args()
    stages = args.stages.split(",")

    import jax.numpy as jnp
    import videoseal_tpu as vs
    from videoseal_tpu.evals.stage_bench import time_stage, _perturb
    from videoseal_tpu.kernels import fused_planar as fp

    model = vs.load("videoseal_1.0").with_dtype("bfloat16")
    cfg = model.cfg
    s = cfg.img_size
    rng = np.random.default_rng(0)

    def report(stage, dt):
        print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 2),
                          "per_frame_us": round(dt * 1e6 / args.frames, 1)}),
              flush=True)

    if "blend" in stages:
        frames_u8 = np.asarray(rng.integers(
            0, 256, (args.frames, args.height, args.width, 3)), np.uint8)
        imgs_p = fp.pack_planar(frames_u8)
        preds = jnp.asarray(
            rng.uniform(-1, 1, (args.frames, s, s)), jnp.float32)

        def blend(a, e):
            ip, pr = a
            return fp.fused_jnd_blend_planar(
                ip, pr, jnp.float32(0.2) * (1 + e), jnp.float32(1.0),
                h=args.height, w=args.width)
        report("blend", time_stage(blend, (imgs_p, preds), args.k))

        def blend_det(a, e):
            ip, pr = a
            return fp.fused_jnd_blend_planar(
                ip, pr, jnp.float32(0.2) * (1 + e), jnp.float32(1.0),
                h=args.height, w=args.width, detect_size=s)
        report("blend+detect", time_stage(blend_det, (imgs_p, preds), args.k))

        wm_p = fp.fused_jnd_blend_planar(
            imgs_p, preds, 0.2, 1.0, h=args.height, w=args.width)

        def resize_det(a, e):
            gained = fp.resize_planar(a, args.height, args.width, s, s,
                                      r0=0, c0=0, precision="default",
                                      gain=1.0 + e)
            return gained
        report("resize_det", time_stage(resize_det, wm_p, args.k))

    if "extract" in stages:
        frames256 = jnp.asarray(
            rng.uniform(0, 1, (args.frames, s, s, 3)), jnp.bfloat16)
        xvars = model.extractor_vars

        # A/B the block-grouping knob EXPLICITLY (advisor round-4 finding:
        # monkeypatching blocks_per_step was a no-op once the production
        # default reverted to max_block_group=1 — both stages measured the
        # single-block config). The multi variant reproduces _detect_resized's
        # fused path with max_block_group raised via the real kwarg.
        from videoseal_tpu.kernels.convnext_fused import convnext_apply_fused
        from videoseal_tpu.modules.pixel_decoder import PixelDecoder
        enc = model.extractor_spec.module.encoder

        def make_ext(max_block_group):
            def ext(a, e):
                xv, fr = a
                x = _perturb(fr, e).astype(jnp.bfloat16)
                feats = convnext_apply_fused(
                    xv["params"]["encoder"], x * 2 - 1,
                    depths=tuple(enc.get("depths", (3, 3, 9, 3))),
                    dims=tuple(enc.get("dims", (96, 192, 384, 768))),
                    stem_stride=enc.get("stem_stride", 4),
                    max_block_group=max_block_group)
                preds = PixelDecoder(
                    **model.extractor_spec.module.pixel_decoder).apply(
                    {"params": xv["params"]["pixel_decoder"]}, feats)
                return preds.astype(jnp.float32)
            return ext

        report("extractor_multi",
               time_stage(make_ext(4), (xvars, frames256), args.k))
        report("extractor_single",
               time_stage(make_ext(1), (xvars, frames256), args.k))


if __name__ == "__main__":
    main()
