"""Probe: how to run the UNet's small-channel 3x3 convs at MXU rate.

The per-level UNet timing (evals/unet_bench.py) shows encoder+decoder at
~37 ms for ~2 ms of bf16 roofline FLOPs: XLA's conv emitter runs these
shapes at a few TF/s whatever the layout (PERF.md round-1 measurement, and
the s2d repack only moved 34 -> 32 ms). Variants here test whether hand
im2col-as-matmul formulations reach MXU rate on the dominant shapes.

Run: python -m videoseal_tpu.kernels.conv_probe
"""

from __future__ import annotations

import functools
import json

import numpy as np


def run(variant: str, b: int, h: int, c_in: int, c_out: int, k: int = 8):
    import jax
    import jax.numpy as jnp
    from ..evals.stage_bench import time_stage, _perturb

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (b, h, h, c_in)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, c_in, c_out)), jnp.bfloat16)

    if variant == "lax_conv":
        def fn(a, eps):
            return jax.lax.conv_general_dilated(
                _perturb(a, eps), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    elif variant == "im2col_dot":
        wk = w.reshape(9 * c_in, c_out)

        def fn(a, eps):
            a = _perturb(a, eps)
            ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [jax.lax.slice(ap, (0, dy, dx, 0),
                                  (b, dy + h, dx + h, c_in))
                    for dy in range(3) for dx in range(3)]
            patches = jnp.concatenate(cols, axis=-1).reshape(b * h * h,
                                                             9 * c_in)
            y = jnp.dot(patches, wk, preferred_element_type=jnp.float32)
            return y.reshape(b, h, h, c_out).astype(jnp.bfloat16)
    elif variant == "nine_dots":
        def fn(a, eps):
            a = _perturb(a, eps)
            ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = None
            for dy in range(3):
                for dx in range(3):
                    sl = jax.lax.slice(ap, (0, dy, dx, 0),
                                       (b, dy + h, dx + h, c_in))
                    t = jnp.dot(sl.reshape(b * h * h, c_in), w[dy, dx],
                                preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
            return acc.reshape(b, h, h, c_out).astype(jnp.bfloat16)
    else:
        raise ValueError(variant)

    dt = time_stage(fn, x, k)
    macs = b * h * h * 9 * c_in * c_out
    print(json.dumps({"variant": variant, "shape": f"{b}x{h}^2x{c_in}->{c_out}",
                      "ms": round(dt * 1e3, 2),
                      "tf_s": round(2 * macs / dt / 1e12, 1)}), flush=True)


def main():
    for shape in ((32, 128, 64, 64), (32, 256, 16, 16), (32, 64, 128, 128)):
        for v in ("lax_conv", "im2col_dot", "nine_dots"):
            run(v, *shape)


if __name__ == "__main__":
    main()
