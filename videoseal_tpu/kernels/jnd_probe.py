"""Probe: where does fused_jnd_delta's time go? (perf tool, not a prod path)

Three kernels sharing fused_blend's exact grid/DMA structure:
  copy  — DMA in, scale, DMA out (pure pipeline cost)
  sums  — the 5x5/Sobel separable sums, no transcendentals
  full  — the real JND math (sqrt/log/exp)
plus tile-size and transcendental-variant sweeps.

Run: python -m videoseal_tpu.kernels.jnd_probe
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def _build(mode: str, th: int, w: int, wp: int, n_tiles: int, n_steps: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(sw_ref, lum_hbm, pred_hbm, out_ref, lum_vmem, pred_vmem,
             sem_lum, sem_pred):
        f = pl.program_id(0)
        i = pl.program_id(1)
        step = f * n_tiles + i
        slot = jax.lax.rem(step, 2)
        nxt = jax.lax.rem(step + 1, 2)

        def dma_lum(s, sl):
            fs = jax.lax.div(s, n_tiles)
            ts = jax.lax.rem(s, n_tiles)
            return pltpu.make_async_copy(
                lum_hbm.at[fs, pl.ds(ts * th, th + 8)], lum_vmem.at[sl],
                sem_lum.at[sl])

        def dma_pred(s, sl):
            fs = jax.lax.div(s, n_tiles)
            ts = jax.lax.rem(s, n_tiles)
            return pltpu.make_async_copy(
                pred_hbm.at[fs, pl.ds(ts * th, th)], pred_vmem.at[sl],
                sem_pred.at[sl])

        @pl.when(step == 0)
        def _():
            dma_lum(step, slot).start()
            dma_pred(step, slot).start()

        @pl.when(step + 1 < n_steps)
        def _():
            dma_lum(step + 1, nxt).start()
            dma_pred(step + 1, nxt).start()

        dma_lum(step, slot).wait()
        dma_pred(step, slot).wait()
        lum = lum_vmem[slot]
        sw = sw_ref[0]

        if mode == "copy":
            out_ref[0] = sw * jax.lax.slice(lum, (4, 0), (4 + th, w)) \
                + pred_vmem[slot]
            return

        def vsum(src, n, top):
            acc = jax.lax.slice(src, (top, 0), (top + th, wp))
            for d in range(1, n):
                acc = acc + jax.lax.slice(src, (top + d, 0), (top + d + th, wp))
            return acc

        def hsum(src, n, left):
            acc = jax.lax.slice(src, (0, left), (th, left + w))
            for d in range(1, n):
                acc = acc + jax.lax.slice(src, (0, left + d), (th, left + d + w))
            return acc

        col5 = vsum(lum, 5, 2)
        col3 = vsum(lum, 3, 3)
        center = jax.lax.slice(lum, (4, 2), (4 + th, 2 + w))
        la = (hsum(col5, 5, 0) + hsum(col3, 3, 1) - 2.0 * center) * (1.0 / 32.0)

        t = (jax.lax.slice(lum, (3, 0), (3 + th, wp))
             + 2.0 * jax.lax.slice(lum, (4, 0), (4 + th, wp))
             + jax.lax.slice(lum, (5, 0), (5 + th, wp)))
        gx = (jax.lax.slice(t, (0, 3), (th, 3 + w))
              - jax.lax.slice(t, (0, 1), (th, 1 + w)))
        s_diff = (jax.lax.slice(lum, (3, 0), (3 + th, wp))
                  - jax.lax.slice(lum, (5, 0), (5 + th, wp)))
        gy = (jax.lax.slice(s_diff, (0, 1), (th, 1 + w))
              + 2.0 * jax.lax.slice(s_diff, (0, 2), (th, 2 + w))
              + jax.lax.slice(s_diff, (0, 3), (th, 3 + w)))
        cm2 = gx * gx + gy * gy

        if mode == "sums":
            out_ref[0] = (sw * (la + cm2)) * pred_vmem[slot]
            return

        if mode == "full":
            lo = 17.0 * (1.0 - jnp.sqrt(la * (1.0 / 127.0) + 1e-5))
            hi = (3.0 / 128.0) * (la - 127.0) + 3.0
            la = jnp.where(la <= 127.0, lo, hi)
            cm = jnp.sqrt(cm2)
            cm = 16.0 * jnp.exp(jnp.log(jnp.maximum(cm, 1e-20)) * 2.4) \
                / (cm2 + 676.0)
            cm = jnp.where(cm2 > 0.0, cm, 0.0)
            cm = 0.117 * cm
        else:  # full_nosqrt: cm^2.4/(cm2+676) == cm2^1.2/(cm2+676)
            lo = 17.0 * (1.0 - jnp.sqrt(la * (1.0 / 127.0) + 1e-5))
            hi = (3.0 / 128.0) * (la - 127.0) + 3.0
            la = jnp.where(la <= 127.0, lo, hi)
            cm = 16.0 * jnp.exp(jnp.log(jnp.maximum(cm2, 1e-40)) * 1.2) \
                / (cm2 + 676.0)
            cm = jnp.where(cm2 > 0.0, cm, 0.0)
            cm = 0.117 * cm

        h = jnp.maximum(la + cm - 0.3 * jnp.minimum(la, cm), 0.0) * (1.0 / 255.0)
        out_ref[0] = (sw * h) * pred_vmem[slot]

    return kern


def run(mode: str, th: int, frames: int = 128, h: int = 1080, w: int = 1920,
        k: int = 8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..evals.stage_bench import time_stage

    wq = -(-w // 128) * 128
    wp = wq + 128
    n_tiles = h // th
    rng = np.random.default_rng(0)
    lum = jnp.asarray(rng.uniform(0, 255, (frames, h + 8, wp)), jnp.float32)
    pred = jnp.asarray(rng.uniform(-1, 1, (frames, h, wq)), jnp.float32)

    kern = _build(mode, th, wq, wp, n_tiles, frames * n_tiles)

    def call(a, e):
        lum_, pred_ = a
        sw = jnp.reshape(jnp.float32(0.2) * (1 + e), (1,))
        return pl.pallas_call(
            kern,
            grid=(frames, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, th, wq), lambda fi, i: (fi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((frames, h, wq), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, th + 8, wp), jnp.float32),
                            pltpu.VMEM((2, th, wq), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
        )(sw, lum_, pred_)

    dt = time_stage(call, (lum, pred), k)
    gb = frames * (h + 8) * wp * 4 + frames * h * wq * 4 * 2
    print(json.dumps({"mode": mode, "th": th, "ms": round(dt * 1e3, 2),
                      "eff_GBps": round(gb / dt / 1e9, 1)}), flush=True)


def main():
    for mode in ("copy", "sums", "full", "full_nosqrt"):
        run(mode, th=72)
    for th in (40, 120, 216):
        run("full", th=th)


if __name__ == "__main__":
    main()
