"""FLOPs / params accounting (parity: videoseal/evals/flops.py:36-57).

Uses XLA's own cost analysis of the compiled embed/extract programs instead
of the reference's calflops hooks — this counts what actually runs on the
chip, including resizes and attenuation.

  python -m videoseal_tpu.evals.flops --card videoseal_1.0
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _count_params(tree) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def cost_analysis(model, frames_shape=(8, 256, 256, 3)) -> dict:
    import jax
    import jax.numpy as jnp
    from ..models.videoseal import embed_pipeline, detect_pipeline

    cfg = model.cfg
    frames = jnp.zeros(frames_shape, jnp.float32)
    msgs = jnp.zeros((1, cfg.nbits), jnp.int32)

    def embed(fr, ms):
        return embed_pipeline(model.embedder_spec.module, model.attenuation, cfg,
                              model.embedder_vars, fr, ms, 0.2, 1.0,
                              is_video=True, lowres_attenuation=False)[0]

    def detect(fr):
        return detect_pipeline(model.extractor_spec.module, cfg,
                               model.extractor_vars, fr)

    out = {}
    for name, fn, args in [("embed", embed, (frames, msgs)),
                           ("extract", detect, (frames,))]:
        try:
            compiled = jax.jit(fn).lower(*args).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            out[f"{name}_gflops"] = round(float(ca.get("flops", 0)) / 1e9, 3)
            out[f"{name}_gflops_per_frame"] = round(
                float(ca.get("flops", 0)) / 1e9 / frames_shape[0], 3)
        except Exception as e:  # cost analysis availability differs per backend
            out[f"{name}_gflops"] = f"unavailable ({type(e).__name__})"
    out["embedder_params_M"] = round(_count_params(model.embedder_vars) / 1e6, 3)
    out["extractor_params_M"] = round(_count_params(model.extractor_vars) / 1e6, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    import videoseal_tpu as vs
    model = vs.load(args.card)
    print(json.dumps({"card": args.card,
                      **cost_analysis(model, (args.frames, 256, 256, 3))}))


if __name__ == "__main__":
    main()
