"""Speed harness (parity: videoseal/evals/speed.py:36-306).

Times embed and extract separately (ms/frame). Measurement is anchored by a
host readback of a scalar that data-depends on every chained iteration —
on tunnelled/remote devices `block_until_ready` can return at enqueue time,
so naive wall-clock timing reports dispatch latency, not execution
(the TPU equivalent of the reference's torch.cuda.synchronize discipline).

  python -m videoseal_tpu.evals.speed --card videoseal_1.0 --num_frames 64
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timed_chain(fn, x, k: int):
    """Marginal per-iteration seconds of y=fn(y) chained k times."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x0, n):
        def body(i, carry):
            y, acc = carry
            y2 = fn(y)
            return (y2, acc + y2.reshape(-1)[0].astype(jnp.float32))
        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))
        return acc

    _ = float(chained(x, 1))  # compile
    t0 = time.perf_counter()
    _ = float(chained(x, 1))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(x, k))
    total = time.perf_counter() - t0
    return max((total - rtt) / (k - 1), 1e-9)


def test_speed(model, frames, num_runs: int = 8, is_video: bool = True,
               trace_dir: str | None = None) -> dict:
    """Timed embed/extract. With trace_dir, one warm embed+extract pass runs
    under jax.profiler.trace — the artifact opens in XProf/TensorBoard
    (the reference's tracing story is wall-clock only, SURVEY §5; this is the
    TPU-native equivalent)."""
    import jax
    import jax.numpy as jnp
    from ..models.videoseal import embed_pipeline, detect_pipeline

    frames = jax.device_put(jnp.asarray(frames, jnp.float32))
    msgs = jnp.asarray(model.get_random_msg(1))
    cfg = model.cfg
    emb_mod, ext_mod = model.embedder_spec.module, model.extractor_spec.module

    def embed_once(fr):
        return embed_pipeline(emb_mod, model.attenuation, cfg,
                              model.embedder_vars, fr, msgs,
                              jnp.float32(model.scaling_w),
                              jnp.float32(model.scaling_i),
                              is_video=is_video, lowres_attenuation=False)[0]

    def extract_once(fr):
        preds = detect_pipeline(ext_mod, cfg, model.extractor_vars, fr)
        # keep the chain shape-stable: fold logits back into a frame-shaped perturbation
        return fr * 0.999 + preds.reshape(-1)[0] * 1e-6

    k = max(num_runs, 4)
    t_embed = _timed_chain(embed_once, frames, k)
    t_extract = _timed_chain(extract_once, frames, k)

    if trace_dir:
        ef = jax.jit(embed_once)
        xf = jax.jit(extract_once)
        jax.block_until_ready(ef(frames))  # compile outside the trace
        jax.block_until_ready(xf(frames))
        with jax.profiler.trace(trace_dir):
            with jax.profiler.TraceAnnotation("embed"):
                out = ef(frames)
            with jax.profiler.TraceAnnotation("extract"):
                out2 = xf(out)
            jax.block_until_ready((out, out2))

    f = frames.shape[0]
    return {
        "frames": f,
        "embed_ms_per_frame": 1e3 * t_embed / f,
        "extract_ms_per_frame": 1e3 * t_extract / f,
        "embed_fps": f / t_embed,
        "extract_fps": f / t_extract,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num_frames", type=int, default=64)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--num_runs", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--trace_dir", default=None,
                    help="capture a jax.profiler trace of one embed+extract")
    args = ap.parse_args()

    import videoseal_tpu as vs
    model = vs.load(args.card, checkpoint=args.checkpoint)
    if args.dtype != "float32":
        model = model.with_dtype(args.dtype)
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (args.num_frames, args.height, args.width, 3)
                         ).astype(np.float32)
    stats = test_speed(model, frames, args.num_runs, trace_dir=args.trace_dir)
    print(json.dumps({"card": args.card, "dtype": args.dtype,
                      "resolution": f"{args.height}x{args.width}", **stats}))


if __name__ == "__main__":
    main()
