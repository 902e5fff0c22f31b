"""Per-stage TPU timing for the serving pipeline (perf work tool).

Times each pipeline stage with the honest chained-iteration methodology from
bench.py (tunnelled-TPU `block_until_ready` returns at enqueue time, so every
measurement is anchored by a host readback that data-depends on all K
iterations; one fetch RTT is measured and subtracted).

CRITICAL detail: a loop body computing `fn(invariant_args)` is hoisted out of
`fori_loop` by XLA (licm) and measures nothing. Every stage here is expressed
as `fn(eps)` where `eps` is a traced float that carries the previous
iteration's checksum: the stage weaves it into an input value-preservingly
(`x * (1 + eps)` with eps ~ 1e-30*acc underflowing to 0 in the input dtype),
forcing serialized re-execution without changing the measured math.

Usage:
  python -m videoseal_tpu.evals.stage_bench [--frames 128] [--card videoseal_1.0]

Prints one JSON line per stage: {"stage": ..., "ms": ..., "per_frame_us": ...}.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def time_stage(fn, args, k: int = 8):
    """fn(args, eps: f32 scalar) -> pytree. Returns seconds per iteration.

    `args` is a pytree of device arrays passed as jit ARGUMENTS — closing
    over them would embed them as constants in the HLO and blow the remote
    compiler's request size limit (PERF.md gotcha)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(args, kk):
        def body(i, acc):
            leaves = jax.tree_util.tree_leaves(fn(args, 1e-30 * acc))
            s = sum(l[(0,) * l.ndim].astype(jnp.float32) if l.ndim
                    else l.astype(jnp.float32) for l in leaves)
            return acc + s
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))

    _ = float(chained(args, 1))  # compile + warm
    t0 = time.perf_counter()
    _ = float(chained(args, 1))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(args, k))
    total = time.perf_counter() - t0
    return (total - rtt) / (k - 1)


def _perturb(x, eps):
    """Value-preserving data dependence: (1 + eps) rounds to 1.0 in x.dtype."""
    import jax.numpy as jnp
    return x * (1 + eps).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--decompose", action="store_true",
                    help="also run the full-pipeline check + JND/blend "
                         "decomposition + HBM copy baselines (the former "
                         "stage_bench2, folded in per the round-4 advisor)")
    args = ap.parse_args()

    import jax.numpy as jnp
    import videoseal_tpu as vs
    from videoseal_tpu.kernels.unet_fused import unet_apply_fused
    from videoseal_tpu.kernels.unet_s2d import unet_apply_s2d
    from videoseal_tpu.ops.resize import resize_bilinear

    model = vs.load(args.card).with_dtype("bfloat16")
    cfg = model.cfg
    emb = model.embedder_spec.module
    evars, xvars = model.embedder_vars, model.extractor_vars

    rng = np.random.default_rng(0)
    n_keys = args.frames // cfg.step_size
    keys = jnp.asarray(rng.uniform(0, 1, (n_keys, cfg.img_size, cfg.img_size, 1)),
                       jnp.bfloat16)
    msgs = jnp.asarray(rng.integers(0, 2, (1, cfg.nbits)), jnp.int32)
    key_msgs = jnp.broadcast_to(msgs, (n_keys, cfg.nbits))
    frames_u8 = jnp.asarray(rng.integers(
        0, 256, (args.frames, args.height, args.width, 3)), jnp.uint8)
    frames256 = jnp.asarray(rng.uniform(
        0, 1, (args.frames, cfg.img_size, cfg.img_size, 3)), jnp.bfloat16)

    u = emb.unet
    ukw = dict(nbits=emb.nbits, hidden_size=emb.hidden_size,
               z_channels_mults=tuple(u["z_channels_mults"]),
               activation=u.get("activation", "relu"),
               normalization=u.get("normalization", "batch"),
               num_blocks=u.get("num_blocks", 8),
               last_tanh=u.get("last_tanh", True))
    p, st = evars["params"], evars.get("batch_stats", {})

    def report(stage, dt):
        print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 2),
                          "per_frame_us": round(dt * 1e6 / args.frames, 1)}),
              flush=True)

    def unet_fused_stage(a, e):
        pp, ss, kk, mm = a
        return unet_apply_fused(pp, ss, _perturb(kk, e), mm, **ukw)
    report("unet_fused(keys)", time_stage(
        unet_fused_stage, (p, st, keys, key_msgs), args.k))

    for sched in [None, (4, 2, 1, 1), (4, 4, 1, 1), (4, 4, 2, 1), (8, 4, 2, 1)]:
        name = "inferred" if sched is None else str(sched)

        def s2d_stage(a, e, s=sched):
            pp, ss, kk, mm = a
            return unet_apply_s2d(pp, ss, _perturb(kk, e), mm, schedule=s, **ukw)
        try:
            report(f"unet_s2d{name}(keys)", time_stage(
                s2d_stage, (p, st, keys, key_msgs), args.k))
        except Exception as ex:  # schedule may be unsupported
            print(json.dumps({"stage": f"unet_s2d{name}", "error": str(ex)[:200]}),
                  flush=True)

    from videoseal_tpu.models.videoseal import detect_pipeline

    def ext_stage(a, e):
        xv, fr = a
        return detect_pipeline(model.extractor_spec.module, cfg, xv,
                               _perturb(fr, e))
    report("extractor(frames@256)", time_stage(
        ext_stage, (xvars, frames256), args.k))

    def down(a, e):
        fr = a[:: cfg.step_size].astype(jnp.float32)
        return resize_bilinear(_perturb(fr, e), cfg.img_size, cfg.img_size,
                               precision=cfg.resize_precision)
    report("resize_down(keys)", time_stage(down, frames_u8, args.k))

    preds1 = jnp.asarray(rng.uniform(-1, 1, (args.frames, cfg.img_size,
                                              cfg.img_size, 1)), jnp.float32)

    def up(a, e):
        return resize_bilinear(_perturb(a, e), args.height, args.width,
                               precision=cfg.resize_precision)
    report("resize_up(preds)", time_stage(up, preds1, args.k))

    from videoseal_tpu.kernels.fused_blend import fused_jnd_delta
    predsf = jnp.asarray(rng.uniform(-1, 1, (args.frames, args.height,
                                             args.width)), jnp.float32)

    def blend_u8(a, e):
        fr, pr = a
        # dependence rides the scalar knob: the frames stay untouched uint8
        delta = fused_jnd_delta(fr, pr, jnp.float32(0.2) * (1 + e))
        out = fr.astype(jnp.float32) + 255.0 * delta[..., None]
        return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
    report("fused_jnd_delta+blend(fullres)", time_stage(
        blend_u8, (frames_u8, predsf), args.k))

    if not args.decompose:
        return

    # -- decomposition stages (formerly stage_bench2) -----------------------
    from videoseal_tpu.models.videoseal import embed_pipeline

    # full embed+extract: validates the stage harness vs bench.py end-to-end
    def full(a, e):
        fr, mm = a
        imgs_w, _ = embed_pipeline(emb, model.attenuation, cfg,
                                   evars, fr, mm,
                                   jnp.float32(0.2) * (1 + e),
                                   jnp.float32(1.0),
                                   is_video=True, lowres_attenuation=False)
        preds = detect_pipeline(model.extractor_spec.module, cfg,
                                xvars, imgs_w)
        return imgs_w, preds
    report("full_embed_extract", time_stage(full, (frames_u8, msgs), args.k))

    # delta kernel alone (no downstream blend)
    def delta_only(a, e):
        fr, pr = a
        return fused_jnd_delta(fr, pr, jnp.float32(0.2) * (1 + e))
    report("fused_jnd_delta(only)", time_stage(
        delta_only, (frames_u8, predsf), args.k))

    # elementwise blend alone (delta precomputed)
    delta0 = jnp.asarray(rng.uniform(-0.01, 0.01, predsf.shape), jnp.float32)

    def blend_only(a, e):
        fr, d = a
        out = fr.astype(jnp.float32) + 255.0 * _perturb(d, e)[..., None]
        return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
    report("blend_elementwise(only)", time_stage(
        blend_only, (frames_u8, delta0), args.k))

    # HBM copy baselines for calibration
    def copy_u8(a, e):
        return a + jnp.uint8(e.astype(jnp.int32) % 2)
    report("hbm_copy_u8(frames)", time_stage(copy_u8, frames_u8, args.k))

    def copy_f32(a, e):
        return _perturb(a, e) + 1.0
    report("hbm_copy_f32(preds_plane)", time_stage(copy_f32, predsf, args.k))


if __name__ == "__main__":
    main()
