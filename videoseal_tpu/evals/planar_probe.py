"""Isolated timing for the planar JND+blend kernel at different tile heights.

The round-3 trace ledger attributes 13.9 ms pipelined / 17.3 ms isolated to
`fused_jnd_blend_planar` at TH=64 and named TH=128/TIN=160 as the unmeasured
lever. Round-4 measurements (this probe, 128f @1080p): TH=64 14.25 ms,
TH=96 13.36 ms (now the module default), TH=128 OOMs the 16 MB scoped-VMEM
stack. Tile geometry is passed explicitly (th=/tin= kwargs), so A/B runs
need no module monkey-patching and any jit-cache state is irrelevant.

Usage:
  python -m videoseal_tpu.evals.planar_probe --th 64
  python -m videoseal_tpu.evals.planar_probe --th 128

Prints one JSON line: {"th": ..., "ms": ..., "per_frame_us": ...}.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--th", type=int, default=64)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--proc", type=int, default=256)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--lowres_stages", action="store_true",
                    help="also time the lowres-attenuation mode pieces: "
                         "lowres blend kernel, proc-res JND heatmaps, "
                         "all-frames resize")
    args = ap.parse_args()

    from videoseal_tpu.kernels import fused_planar as fp

    assert args.th % 32 == 0, "TH must be a multiple of 32 (u8 sublane tiling)"
    th, tin = args.th, args.th + 32    # tin covers th + 8 halo, 32-row grain

    import jax.numpy as jnp
    from videoseal_tpu.evals.stage_bench import time_stage

    rng = np.random.default_rng(0)
    frames_u8 = np.asarray(rng.integers(
        0, 256, (args.frames, args.height, args.width, 3)), np.uint8)
    imgs_p = fp.pack_planar(frames_u8, th=th, tin=tin)
    preds = jnp.asarray(rng.uniform(-1, 1, (args.frames, args.proc, args.proc)),
                        jnp.float32)

    def blend(a, e):
        ip, pr = a
        return fp.fused_jnd_blend_planar(
            ip, pr, jnp.float32(0.2) * (1 + e), jnp.float32(1.0),
            h=args.height, w=args.width, th=th, tin=tin)

    dt = time_stage(blend, (imgs_p, preds), args.k)
    print(json.dumps({"th": th, "tin": tin,
                      "ms": round(dt * 1e3, 2),
                      "per_frame_us": round(dt * 1e6 / args.frames, 1)}),
          flush=True)

    if not args.lowres_stages:
        return

    # -- lowres-attenuation serving-mode stages (round 5) -------------------
    def blend_lowres(a, e):
        ip, pr = a
        return fp.fused_jnd_blend_planar(
            ip, pr, jnp.float32(0.2) * (1 + e), jnp.float32(1.0),
            h=args.height, w=args.width, th=th, tin=tin, lowres=True)

    dt = time_stage(blend_lowres, (imgs_p, preds), args.k)
    print(json.dumps({"stage": "blend_lowres", "th": th,
                      "ms": round(dt * 1e3, 2),
                      "per_frame_us": round(dt * 1e6 / args.frames, 1)}),
          flush=True)

    from videoseal_tpu.evals.stage_bench import _perturb
    from videoseal_tpu.modules.jnd import build_attenuation
    att = build_attenuation("jnd_1_1")
    frames_res = jnp.asarray(rng.uniform(
        0, 1, (args.frames, args.proc, args.proc, 3)), jnp.float32)

    def heat(a, e):
        return att.heatmaps(_perturb(a, e))
    dt = time_stage(heat, frames_res, args.k)
    print(json.dumps({"stage": "jnd_heatmaps_procres",
                      "ms": round(dt * 1e3, 2),
                      "per_frame_us": round(dt * 1e6 / args.frames, 1)}),
          flush=True)

    def resize_all(a, e):
        return fp.resize_planar(a, args.height, args.width, args.proc,
                                args.proc, precision="default",
                                gain=1.0 + e)
    dt = time_stage(resize_all, imgs_p, args.k)
    print(json.dumps({"stage": "resize_planar_allframes",
                      "ms": round(dt * 1e3, 2),
                      "per_frame_us": round(dt * 1e6 / args.frames, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
