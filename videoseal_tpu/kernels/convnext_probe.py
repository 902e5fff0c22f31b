"""Probe: ConvNeXt block kernel cost decomposition (perf tool).

Variants of convnext_block.convnext_block_fused at stage-0 shape
(128 x 64x64x96) isolating: dwconv tap-loop vs shift-hoisted dwconv,
exact-erf GELU vs identity, full block.

Run: python -m videoseal_tpu.kernels.convnext_probe
"""

from __future__ import annotations

import functools
import json

import numpy as np


def build(variant: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .convnext_block import _gelu_exact

    def kern(x_ref, dw_ref, dwb_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
             gg_ref, gb_ref, w2_ref, b2_ref, out_ref, *, h, w, c):
        xpad = x_ref[0]
        dw = dw_ref[:]

        if variant.startswith("dwconv_taps"):
            acc = jnp.zeros((h, w, c), jnp.float32)
            for dy in range(7):
                for dx in range(7):
                    tap = jax.lax.slice(xpad, (dy, dx, 0), (dy + h, dx + w, c))
                    acc = acc + tap.astype(jnp.float32) * dw[dy, dx].astype(jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)
            return

        if variant.startswith("dwconv_shift"):
            xf = xpad.astype(jnp.float32)
            acc = jnp.zeros((h, w, c), jnp.float32)
            for dx in range(7):
                xs = jax.lax.slice(xf, (0, dx, 0), (h + 6, dx + w, c))
                for dy in range(7):
                    acc = acc + jax.lax.slice(xs, (dy, 0, 0), (dy + h, w, c)) \
                        * dw[dy, dx].astype(jnp.float32)
            out_ref[0] = acc.astype(out_ref.dtype)
            return

        if variant.startswith("dwconv_perdy"):
            # convert once per dy row-band; independent per-dy partials
            # (the round-4 production kernel form)
            dwf = dw.astype(jnp.float32)
            acc = None
            for dy in range(7):
                xr = jax.lax.slice(xpad, (dy, 0, 0),
                                   (dy + h, w + 6, c)).astype(jnp.float32)
                part = None
                for dx in range(7):
                    tap = jax.lax.slice(xr, (0, dx, 0), (h, dx + w, c))
                    t = tap * dwf[dy, dx]
                    part = t if part is None else part + t
                acc = part if acc is None else acc + part
            out_ref[0] = acc.astype(out_ref.dtype)
            return

        if variant.startswith("dwconv_bf16"):
            # taps + accumulation fully in bf16 (parity cost ~2^-8 rel;
            # probes whether the VPU runs bf16 vector FMAs at higher rate)
            acc = None
            dwb16 = dw.astype(jnp.bfloat16)
            for dy in range(7):
                for dx in range(7):
                    tap = jax.lax.slice(xpad, (dy, dx, 0), (dy + h, dx + w, c))
                    t = tap * dwb16[dy, dx]
                    acc = t if acc is None else acc + t
            out_ref[0] = acc.astype(out_ref.dtype)
            return

        # full block; dwconv formulation + gelu by variant
        if variant.endswith("bf16dw"):
            dwb16 = dw.astype(jnp.bfloat16)
            acc16 = None
            for dy in range(7):
                for dx in range(7):
                    tap = jax.lax.slice(xpad, (dy, dx, 0), (dy + h, dx + w, c))
                    t = tap * dwb16[dy, dx]
                    acc16 = t if acc16 is None else acc16 + t
            acc = acc16.astype(jnp.float32)
        else:
            xf = xpad.astype(jnp.float32)
            acc = jnp.zeros((h, w, c), jnp.float32)
            for dx in range(7):
                xs = jax.lax.slice(xf, (0, dx, 0), (h + 6, dx + w, c))
                for dy in range(7):
                    acc = acc + jax.lax.slice(xs, (dy, 0, 0), (dy + h, w, c)) \
                        * dw[dy, dx].astype(jnp.float32)
        acc = acc + dwb_ref[:].astype(jnp.float32)
        mu = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(acc - mu), axis=-1, keepdims=True)
        xn = (acc - mu) * jax.lax.rsqrt(var + 1e-6)
        xn = xn * lnw_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
        flat = xn.reshape(h * w, c).astype(jnp.bfloat16)
        hmid = jnp.dot(flat, w1_ref[:], preferred_element_type=jnp.float32)
        hmid = hmid + b1_ref[:].astype(jnp.float32)
        if variant == "block_gelu":
            hmid = _gelu_exact(hmid)
        elif variant == "block_gelu_sigmoid":
            # x*sigmoid(1.702x): ~5 VPU ops vs ~14 (max abs err 0.02)
            hmid = hmid * jax.nn.sigmoid(1.702 * hmid)
        elif variant.startswith("block_gelu_tanh"):
            # the standard "approximate" gelu (max abs err ~3e-4)
            inner = 0.7978845608 * (hmid + 0.044715 * hmid * hmid * hmid)
            hmid = 0.5 * hmid * (1.0 + jnp.tanh(inner))
        hmid = hmid.astype(jnp.bfloat16)
        hf = hmid.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(hf * hf, axis=0, keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        hmid = ((gg_ref[:].astype(jnp.float32) * nx) * hf
                + gb_ref[:].astype(jnp.float32) + hf).astype(jnp.bfloat16)
        out = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
        out = out + b2_ref[:].astype(jnp.float32)
        res = jax.lax.slice(xpad, (3, 3, 0), (3 + h, 3 + w, c))
        out_ref[0] = (out.reshape(h, w, c) + res.astype(jnp.float32)
                      ).astype(out_ref.dtype)

    return kern


def run(variant: str, b=128, h=64, w=64, c=96, k=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..evals.stage_bench import time_stage, _perturb

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (b, h + 6, w + 6, c)), jnp.bfloat16)
    dw = jnp.asarray(rng.normal(0, 0.1, (7, 7, c)), jnp.float32)
    vec_c = jnp.asarray(rng.normal(0, 1, (c,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (c, 4 * c)), jnp.bfloat16)
    vec_4c = jnp.asarray(rng.normal(0, 1, (4 * c,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (4 * c, c)), jnp.bfloat16)

    kern = functools.partial(build(variant), h=h, w=w, c=c)

    def call(a, e):
        xx = _perturb(a, e)
        return pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h + 6, w + 6, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((7, 7, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, 4 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * c,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        )(xx, dw, vec_c, vec_c, vec_c, w1, vec_4c, vec_4c, vec_4c, w2, vec_c)

    dt = time_stage(call, x, k)
    print(json.dumps({"variant": variant, "ms": round(dt * 1e3, 2),
                      "us_per_frame": round(dt * 1e6 / b, 1)}), flush=True)


def main():
    import sys
    if "--dw" in sys.argv:
        # round-4 dwconv formulation head-to-head (stage-0 and stage-1 shapes)
        for v in ("dwconv_taps", "dwconv_shift", "dwconv_perdy", "dwconv_bf16",
                  "block_gelu_tanh", "block_gelu_tanh_bf16dw"):
            run(v)
        for v in ("dwconv_perdy", "dwconv_bf16", "block_gelu_tanh",
                  "block_gelu_tanh_bf16dw"):
            run(v, b=128, h=32, w=32, c=192)
        return
    for v in ("block_nogelu", "block_gelu", "block_gelu_sigmoid",
              "block_gelu_tanh"):
        run(v)
    # the real production block for reference
    from ..evals.stage_bench import time_stage, _perturb
    import jax.numpy as jnp
    from .convnext_block import convnext_block_fused
    import jax
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (128, 64, 64, 96)), jnp.bfloat16)
    params = {
        "dwconv": {"kernel": jnp.asarray(rng.normal(0, 0.1, (7, 7, 1, 96)), jnp.float32),
                   "bias": jnp.zeros((96,), jnp.float32)},
        "norm": {"weight": jnp.ones((96,)), "bias": jnp.zeros((96,))},
        "pwconv1": {"kernel": jnp.asarray(rng.normal(0, 0.05, (96, 384)), jnp.float32),
                    "bias": jnp.zeros((384,))},
        "grn": {"gamma": jnp.ones((384,)), "beta": jnp.zeros((384,))},
        "pwconv2": {"kernel": jnp.asarray(rng.normal(0, 0.05, (384, 96)), jnp.float32),
                    "bias": jnp.zeros((96,))},
    }
    dt = time_stage(lambda a, e: convnext_block_fused(_perturb(a, e), params), x, 8)
    print(json.dumps({"variant": "production_block", "ms": round(dt * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
