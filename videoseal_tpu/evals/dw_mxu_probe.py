"""Can the extractor's depthwise 7x7 move off the VPU onto the MXU?

Round-4's attribution ledger (PERF.md) left one named extractor lever:
"per-channel banded matmuls on the idle MXU (channels-first layout)". This
probe measures every MXU formulation of dw7x7 against the VPU tap-loop the
production kernel uses (kernels/convnext_block.py:88-99), per extractor
stage geometry (ref modules/convnext.py:21-57; dims (96,192,384,768),
spatial 64/32/16/8 at the 256^2 processing size, depths (3,3,9,3)):

  vpu      — 49 shift-FMA taps, channels-last (C in lanes): the production
             form. Its isolated XLA time approximates the in-kernel cost
             (the fused block runs at ~90% of this floor + matmul time).
  mxu_band — channels-first per-channel banded matmul with the 7 dy-shifted
             slabs CONCATENATED along the contraction (K = 7*(W+6), N = W):
             one batched matmul per block, batch = C, M = F*H. The band
             matrix B[c, dy*(W+6)+k, v] = wt[c, dy, k-v] reproduces the
             zero-pad dwconv exactly.
  mxu_band_t — mxu_band plus the two relayouts a channels-last pipeline
             must pay per block (NHWC -> NCHW and back): the honest
             end-to-end cost of bolting this onto the existing kernel.
  mxu_diag — dense conv7x7 with a diagonal C->C kernel (wastes C x FLOPs
             but uses XLA's native MXU conv path).

Theory first (why this is expected to be close): dw conv has NO contraction
dim with shared weights — every contraction (dx, dy) carries per-channel
weights, and the channel dim itself is never contracted. So the MXU either
runs C independent small matmuls (util <= (W/128)^2 unless K is stacked),
or pays C x (diag) / R x (shared tap basis) FLOP inflation. The probe
quantifies where between those ceilings the real lowering lands.

  python -m videoseal_tpu.evals.dw_mxu_probe [--frames 128] [--k 8]

One JSON line per (stage, form): ms totals are PER STAGE (all blocks, all
frames). Conclusions go to PERF.md's round-5 ledger.
"""

from __future__ import annotations

import argparse
import functools
import json

import numpy as np

# (C, H=W, depth) per extractor stage at the 256^2 processing size
STAGES = [(96, 64, 3), (192, 32, 3), (384, 16, 9), (768, 8, 3)]


def band_matrix(wt: np.ndarray, w: int) -> np.ndarray:
    """wt (C, 7, 7) tap weights -> B (C, 7*(w+6), w) with
    B[c, dy*(w+6)+k, v] = wt[c, dy, k-v] for 0 <= k-v <= 6 (zero-pad conv
    semantics: the input is pre-padded by 3 in W, so out col v contracts
    padded cols v..v+6)."""
    c = wt.shape[0]
    b = np.zeros((c, 7 * (w + 6), w), wt.dtype)
    for dy in range(7):
        for v in range(w):
            b[:, dy * (w + 6) + v:dy * (w + 6) + v + 7, v] = wt[:, dy, :]
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from .stage_bench import _perturb, time_stage

    rng = np.random.default_rng(0)
    for ci, (c, hw, depth) in enumerate(STAGES):
        f, h, w = args.frames, hw, hw
        x = jnp.asarray(rng.normal(0, 1, (f, h, w, c)), jnp.bfloat16)
        wt = rng.normal(0, 0.1, (c, 7, 7)).astype(np.float32)
        dw_hwc = jnp.asarray(np.transpose(wt, (1, 2, 0)))       # (7, 7, c)
        bmat = jnp.asarray(band_matrix(wt, w), jnp.bfloat16)    # (c, 7(w+6), w)

        def vpu(a, e, depth=depth, f=f, h=h, w=w, c=c):
            # depth iterations CHAINED (y feeds the next conv) — identical
            # per-iteration bodies would be CSE'd by XLA into one conv
            xb, dwt = a
            y = _perturb(xb, e)
            for _ in range(depth):
                xp = jnp.pad(y, ((0, 0), (3, 3), (3, 3), (0, 0)))
                acc = None
                for dy in range(7):
                    xr = jax.lax.slice(xp, (0, dy, 0, 0),
                                       (f, dy + h, w + 6, c)
                                       ).astype(jnp.float32)
                    part = None
                    for dx in range(7):
                        tap = jax.lax.slice(xr, (0, 0, dx, 0),
                                            (f, h, dx + w, c))
                        t = tap * dwt[dy, dx]
                        part = t if part is None else part + t
                    acc = part if acc is None else acc + part
                y = acc.astype(jnp.bfloat16)
            return y

        def band_core(xcf, bm, f=f, h=h, w=w, c=c):
            # xcf (f, c, h+6, w+6) channels-first, padded -> one conv
            slabs = [jax.lax.slice(xcf, (0, 0, dy, 0),
                                   (f, c, dy + h, w + 6)) for dy in range(7)]
            xcat = jnp.concatenate(slabs, axis=-1)       # (f, c, h, 7(w+6))
            return jnp.einsum("fchk,ckv->fchv", xcat, bm,
                              preferred_element_type=jnp.float32)

        def mxu_band(a, e, depth=depth):
            # stays channels-first across blocks (chained, no CSE)
            xb, bm = a
            y = jnp.transpose(_perturb(xb, e), (0, 3, 1, 2))
            for _ in range(depth):
                xcf = jnp.pad(y, ((0, 0), (0, 0), (3, 3), (3, 3)))
                y = band_core(xcf, bm).astype(jnp.bfloat16)
            return y

        def mxu_band_t(a, e, depth=depth):
            # pays the per-block NHWC<->NCHW relayouts a channels-last
            # pipeline needs (the pwconv matmuls + LN/GRN want C in lanes)
            xb, bm = a
            y = _perturb(xb, e)
            for _ in range(depth):
                xcf = jnp.pad(jnp.transpose(y, (0, 3, 1, 2)),
                              ((0, 0), (0, 0), (3, 3), (3, 3)))
                o = band_core(xcf, bm)
                y = jnp.transpose(o, (0, 2, 3, 1)).astype(jnp.bfloat16)
            return y

        dense = np.zeros((7, 7, c, c), np.float32)
        for cc in range(c):
            dense[:, :, cc, cc] = wt[cc]
        dense = jnp.asarray(dense, jnp.bfloat16)

        def mxu_diag(a, e, depth=depth):
            xb, dk = a
            y = _perturb(xb, e)
            for _ in range(depth):
                y = jax.lax.conv_general_dilated(
                    y, dk, (1, 1), [(3, 3), (3, 3)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return y

        forms = [("vpu", vpu, (x, dw_hwc)),
                 ("mxu_band", mxu_band, (x, bmat)),
                 ("mxu_band_t", mxu_band_t, (x, bmat)),
                 ("mxu_diag", mxu_diag, (x, dense))]
        for name, fn, a in forms:
            dt = time_stage(fn, a, args.k)
            print(json.dumps({
                "stage": ci, "c": c, "hw": hw, "depth": depth, "form": name,
                "ms": round(dt * 1e3, 2),
                "gmac": round(depth * f * 49 * c * h * w / 1e9, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
