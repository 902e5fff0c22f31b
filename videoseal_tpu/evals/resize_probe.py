"""Probe: planar u8 -> proc-res resize formulations (detect-side cost).

resize_planar converts the (F,3,1088,2048) u8 watermarked planes to f32
before its two resize einsums — a full-res f32 materialization (~34 MB/frame
of HBM traffic). Variants test contraction order and convert dtype to find
what XLA fuses.

Run: python -m videoseal_tpu.evals.resize_probe [--frames 128]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=2048)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ..ops.resize import _resize_matrix
    from .stage_bench import time_stage, _perturb

    F, H, W, S = args.frames, args.h, args.w, args.s
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (F, 3, H, W)), jnp.uint8)
    mh = jnp.asarray(_resize_matrix(H, S, antialias=True), jnp.bfloat16)
    mw = jnp.asarray(_resize_matrix(W, S, antialias=True), jnp.bfloat16)

    def u8eps(a, eps):
        # value-preserving data dependence for a u8 input
        return a + (eps * 1e-20).astype(jnp.uint8)

    def current(a, eps):   # f32 convert, H then W contraction
        y = u8eps(a, eps).astype(jnp.float32) * (1.0 / 255.0)
        y = jnp.einsum("Hh,fchw->fcHw", mh.astype(jnp.float32), y,
                       precision="default")
        y = jnp.einsum("Ww,fchw->fchW", mw.astype(jnp.float32), y,
                       precision="default")
        return jnp.transpose(y, (0, 2, 3, 1))

    def bf16_h_first(a, eps):
        y = u8eps(a, eps).astype(jnp.bfloat16)
        y = jnp.einsum("Hh,fchw->fcHw", mh, y, precision="default")
        y = jnp.einsum("Ww,fchw->fchW", mw, y, precision="default")
        return jnp.transpose(y, (0, 2, 3, 1)).astype(jnp.float32) * (1 / 255.0)

    def bf16_w_first(a, eps):
        y = u8eps(a, eps).astype(jnp.bfloat16)
        y = jnp.einsum("Ww,fchw->fchW", mw, y, precision="default")
        y = jnp.einsum("Hh,fchw->fcHw", mh, y, precision="default")
        return jnp.transpose(y, (0, 2, 3, 1)).astype(jnp.float32) * (1 / 255.0)

    def i8_w_first(a, eps):
        # int8 MXU pass for the full-res contraction: quantize mw to int8?
        # (placeholder: f32 accumulate from u8-as-int8 is lossy for >127;
        # measure the traffic shape only)
        y = u8eps(a, eps)
        yi = (y >> 1).astype(jnp.int8)    # traffic-equivalent probe
        z = jax.lax.dot_general(
            yi.reshape(F * 3 * H, W), jnp.asarray(
                np.round(np.asarray(mw, np.float32).T * 64).astype(np.int8)),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        z = z.reshape(F, 3, H, S).astype(jnp.bfloat16)
        z = jnp.einsum("Hh,fchw->fcHw", mh, z, precision="default")
        return jnp.transpose(z, (0, 2, 3, 1))

    for name, fn in (("current_f32", current), ("bf16_h_first", bf16_h_first),
                     ("bf16_w_first", bf16_w_first), ("i8_w_first", i8_w_first)):
        dt = time_stage(fn, x, args.k)
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                          "per_frame_us": round(dt * 1e6 / F, 1)}), flush=True)


if __name__ == "__main__":
    main()
