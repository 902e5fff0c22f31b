"""Follow-up stage timing: full pipeline + JND/blend decomposition.

Validates the stage harness against bench.py's end-to-end number and breaks
the dominant full-res stage into parts: Pallas delta kernel alone, elementwise
blend alone, an HBM copy baseline for calibration.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from .stage_bench import time_stage, _perturb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import videoseal_tpu as vs
    from videoseal_tpu.models.videoseal import embed_pipeline, detect_pipeline
    from videoseal_tpu.kernels.fused_blend import fused_jnd_delta

    model = vs.load(args.card).with_dtype("bfloat16")
    cfg = model.cfg
    emb_mod, ext_mod = model.embedder_spec.module, model.extractor_spec.module

    rng = np.random.default_rng(0)
    frames_u8 = jnp.asarray(rng.integers(
        0, 256, (args.frames, args.height, args.width, 3)), jnp.uint8)
    msgs = jnp.asarray(rng.integers(0, 2, (1, cfg.nbits)), jnp.int32)
    predsf = jnp.asarray(rng.uniform(-1, 1, (args.frames, args.height,
                                             args.width)), jnp.float32)

    def report(stage, dt):
        print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 2),
                          "per_frame_us": round(dt * 1e6 / args.frames, 1)}),
              flush=True)

    # 1) full embed+extract (should reproduce bench.py's ~117 ms)
    def full(a, e):
        fr, mm = a
        imgs_w, _ = embed_pipeline(emb_mod, model.attenuation, cfg,
                                   model.embedder_vars, fr, mm,
                                   jnp.float32(0.2) * (1 + e), jnp.float32(1.0),
                                   is_video=True, lowres_attenuation=False)
        preds = detect_pipeline(ext_mod, cfg, model.extractor_vars, imgs_w)
        return imgs_w, preds
    report("full_embed_extract", time_stage(full, (frames_u8, msgs), args.k))

    # 2) delta kernel alone (no downstream blend)
    def delta_only(a, e):
        fr, pr = a
        return fused_jnd_delta(fr, pr, jnp.float32(0.2) * (1 + e))
    report("fused_jnd_delta(only)", time_stage(
        delta_only, (frames_u8, predsf), args.k))

    # 3) elementwise blend alone (delta precomputed)
    delta0 = jnp.asarray(rng.uniform(-0.01, 0.01, predsf.shape), jnp.float32)

    def blend_only(a, e):
        fr, d = a
        out = fr.astype(jnp.float32) + 255.0 * _perturb(d, e)[..., None]
        return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
    report("blend_elementwise(only)", time_stage(
        blend_only, (frames_u8, delta0), args.k))

    # 4) HBM copy baseline: one read+write of the u8 frames
    def copy_u8(a, e):
        return a + jnp.uint8(e.astype(jnp.int32) % 2)
    report("hbm_copy_u8(frames)", time_stage(copy_u8, frames_u8, args.k))

    def copy_f32(a, e):
        return _perturb(a, e) + 1.0
    report("hbm_copy_f32(preds_plane)", time_stage(copy_f32, predsf, args.k))


if __name__ == "__main__":
    main()
