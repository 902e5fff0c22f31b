"""Pallas TPU kernel: fused JND heatmap + attenuate + blend + clamp.

The hottest full-resolution stage of watermark embedding
(BASELINE.json north star). The reference computes it as several separate
full-res passes — luminance, 5x5 luminance-masking conv, two Sobel convs,
the la/cm combine, heatmap x prediction, blend, clamp
(modules/jnd.py:80-114 + models/videoseal.py:333-344) — each reading/writing
HBM. This kernel does ONE pass: per (frame, row-tile) grid step it DMAs an
image tile (with 2-pixel halo) and the matching watermark-prediction tile
into VMEM, evaluates the whole chain on the VPU, and writes the watermarked
tile.

Layout note (Mosaic tiling): channels-last (.., W, 3) arrays tile as
(sublane, lane=3) — catastrophic lane padding — so the kernel operates
CHANNELS-FIRST internally: (F, 3, H, W) blocks tile on (H, W) with zero
waste and every op is a clean 2D (sublane x lane) VPU op. The NHWC<->NCHW
transposes happen outside (one cheap fused XLA pass each way).

Math parity: JND(in_channels=1, out_channels=1|3, blue=False) — jnd_1_1 is
what all four model-zoo cards use (configs/attenuation.yaml) — with additive
blending: out = clip(si*img + sw*h(img)*pred, 0, 1). out_channels 1 vs 3 are
identical here because the 3-channel heatmap tiles the same plane.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 5x5 luminance-masking kernel weights (jnd.py:39-45)
_LUM_W = np.array([[1., 1., 1., 1., 1.],
                   [1., 2., 2., 2., 1.],
                   [1., 2., 0., 2., 1.],
                   [1., 2., 2., 2., 1.],
                   [1., 1., 1., 1., 1.]], np.float32)


def _pick_tile(h: int, w: int = 1920) -> int | None:
    """Largest row-tile dividing h, multiple of 8 (Mosaic sublane constraint
    on the output block), sized so the kernel's VMEM working set (~30 live
    (th, w) f32 planes + the image tile) stays within the ~16MB scoped
    budget."""
    cap = max(8, min(160, (10 * 1024 * 1024) // (30 * 4 * max(w, 1))))
    for th in (160, 144, 128, 120, 112, 96, 88, 80, 72, 64, 56, 48, 40, 32,
               24, 16, 8):
        if th <= cap and h % th == 0:
            return th
    return None


def supports_fused_blend(h: int, w: int, pred_channels: int,
                         attenuation, blending_method: str) -> bool:
    from ..modules.jnd import JND
    th = _pick_tile(h, w)
    if th is None:
        return False
    vmem_bytes = 4 * ((th + 4) * (w + 4) * 3          # image tile
                      + th * w * pred_channels        # pred tile
                      + th * w * 3                    # out tile
                      + 3 * (th + 4) * (w + 4))       # lum + rotating temporaries
    return (isinstance(attenuation, JND)
            and attenuation.in_channels == 1
            and attenuation.out_channels in (1, 3)
            and not attenuation.blue
            and blending_method == "additive"
            and pred_channels in (1, 3)
            and vmem_bytes < 13 * 1024 * 1024)


def _kernel(si_ref, sw_ref, img_hbm, pred_hbm, out_ref,
            img_vmem, pred_vmem, sem_img, sem_pred, *, th: int, w: int,
            wp: int, pred_c: int):
    f = pl.program_id(0)
    i = pl.program_id(1)

    cp_img = pltpu.make_async_copy(
        img_hbm.at[f, :, pl.ds(i * th, th + 8)], img_vmem, sem_img)
    cp_img.start()
    cp_pred = pltpu.make_async_copy(
        pred_hbm.at[f, :, pl.ds(i * th, th)], pred_vmem, sem_pred)
    cp_pred.start()
    cp_img.wait()
    cp_pred.wait()

    x = img_vmem[:]                      # (3, th+8, wp), [0,1]
    lum = (0.299 * 255.0) * x[0] + (0.587 * 255.0) * x[1] + (0.114 * 255.0) * x[2]

    # luminance masking: 5x5 weighted mean / 32 (jnd.py:63-69)
    la = jnp.zeros((th, w), jnp.float32)
    for dy in range(5):
        for dx in range(5):
            wgt = float(_LUM_W[dy, dx])
            if wgt != 0.0:
                la = la + wgt * jax.lax.slice(lum, (2 + dy, dx),
                                               (2 + dy + th, dx + w))
    la = la * (1.0 / 32.0)
    lo = 17.0 * (1.0 - jnp.sqrt(la * (1.0 / 127.0) + 1e-5))
    hi = (3.0 / 128.0) * (la - 127.0) + 3.0
    la = jnp.where(la <= 127.0, lo, hi)

    # contrast masking: Sobel magnitudes (jnd.py:71-77); slices anchored at
    # the tile center (+4 rows: 8-aligned halo; +2 cols) of the padded tile
    def sl(dy, dx):
        return jax.lax.slice(lum, (4 + dy, 2 + dx), (4 + dy + th, 2 + dx + w))

    gx = (sl(-1, 1) + 2.0 * sl(0, 1) + sl(1, 1)
          - sl(-1, -1) - 2.0 * sl(0, -1) - sl(1, -1))
    gy = (sl(-1, -1) + 2.0 * sl(-1, 0) + sl(-1, 1)
          - sl(1, -1) - 2.0 * sl(1, 0) - sl(1, 1))
    cm2 = gx * gx + gy * gy
    cm = jnp.sqrt(cm2)
    cm = 16.0 * jnp.exp(jnp.log(jnp.maximum(cm, 1e-20)) * 2.4) / (cm2 + 676.0)
    cm = jnp.where(cm2 > 0.0, cm, 0.0)
    cm = 0.117 * cm

    h = jnp.maximum(la + cm - 0.3 * jnp.minimum(la, cm), 0.0) * (1.0 / 255.0)

    si = si_ref[0]
    sw = sw_ref[0]
    swh = sw * h                                            # (th, w)
    pred = pred_vmem[:]                                     # (pred_c, th, w)
    img_c = jax.lax.slice(img_vmem[:], (0, 4, 2), (3, 4 + th, 2 + w))
    out = si * img_c + swh[None] * pred                     # bcast 1|3 channels
    out_ref[0] = jnp.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_jnd_blend(imgs: jnp.ndarray, preds: jnp.ndarray,
                    scaling_i, scaling_w, interpret: bool = False) -> jnp.ndarray:
    """imgs: (F, H, W, 3) in [0,1]; preds: (F, H, W, 1|3) watermark preds.

    Returns clip(si*imgs + sw*jnd_heatmap(imgs)*preds, 0, 1), identical to
    JND(1, 1|3).heatmaps + additive blend + clamp.
    """
    f, h, w, _ = imgs.shape
    pred_c = preds.shape[-1]
    th = _pick_tile(h, w)
    assert th is not None, f"no row tile divides H={h}"

    # NHWC -> NCHW for Mosaic-friendly (H, W) tiling. Mosaic DMA slices must
    # be 8-aligned on the sublane dim and 128-aligned on the lane dim, so:
    # rows pad 4 each side (slice = th+8), cols pad to wq+128 where
    # wq = round_up(w, 128); the kernel computes on wq columns (the tail is
    # padding garbage) and the caller slices back to w.
    wq = -(-w // 128) * 128
    wp = wq + 128
    imgs_t = jnp.moveaxis(imgs.astype(jnp.float32), -1, 1)      # (F,3,H,W)
    imgs_t = jnp.pad(imgs_t, ((0, 0), (0, 0), (4, 4), (2, wp - w - 2)))
    preds_t = jnp.moveaxis(preds.astype(jnp.float32), -1, 1)    # (F,C,H,W)
    preds_t = jnp.pad(preds_t, ((0, 0), (0, 0), (0, 0), (0, wq - w)))

    kern = functools.partial(_kernel, th=th, w=wq, wp=wp, pred_c=pred_c)
    si = jnp.reshape(jnp.asarray(scaling_i, jnp.float32), (1,))
    sw = jnp.reshape(jnp.asarray(scaling_w, jnp.float32), (1,))

    out = pl.pallas_call(
        kern,
        grid=(f, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, th, wq), lambda fi, i: (fi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, 3, h, wq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, th + 8, wp), jnp.float32),
            pltpu.VMEM((pred_c, th, wq), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(si, sw, imgs_t, preds_t)
    return jnp.moveaxis(out[..., :w], 1, -1)  # crop pad, back to NHWC
