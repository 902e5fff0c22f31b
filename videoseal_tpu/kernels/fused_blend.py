"""Pallas TPU kernel: fused JND heatmap + attenuate + blend + clamp.

The hottest full-resolution stage of watermark embedding
(BASELINE.json north star). The reference computes it as several separate
full-res passes — luminance, 5x5 luminance-masking conv, two Sobel convs,
the la/cm combine, heatmap x prediction, blend, clamp
(modules/jnd.py:80-114 + models/videoseal.py:333-344) — each reading/writing
HBM. This kernel does ONE pass with DOUBLE-BUFFERED DMA: while tile k
computes, tile k+1's image+prediction DMAs are in flight, so the VPU never
waits on HBM.

Layout notes (Mosaic tiling):
* channels-last (.., W, 3) tiles as (sublane, lane=3) — catastrophic lane
  padding — so the kernel runs CHANNELS-FIRST: (F, 3, H, W) blocks tile on
  (H, W) with zero waste; NHWC<->NCHW transposes happen outside (XLA fuses
  the input transpose with the halo pad into one copy).
* DMA slices must be 8-aligned on the sublane dim and 128-aligned on the
  lane dim: rows pad 4 each side (slice th+8 with th % 8 == 0), cols pad to
  a 128 multiple; the kernel computes on padded columns and the caller
  crops.

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


def _pow12(u):
    """u**1.2 = cm**2.4 on u = cm**2 > 0 (modules/jnd.py:96) without the
    sqrt the cm formulation implies: log(cm) = 0.5*log(cm2).

    Negative result, measured round 3: a transcendental-free Newton
    fifth-root version (bit-hack guess + 3 iterations, ~1e-5 rel err) ran
    1.06x SLOWER than this (18.3 vs 17.3 ms isolated planar blend @128f
    1080p) — v5e's VPU exp/log are fast primitives; the blend kernels are
    bound by total vector-op count, not by transcendentals."""
    return jnp.exp(jnp.log(u) * 1.2)


def _pick_tile(h: int, w: int = 1920) -> int | None:
    """Largest row-tile dividing h, multiple of 8 (Mosaic sublane constraint
    on the output block), sized so the kernel's VMEM working set (~30 live
    (th, w) f32 planes + double-buffered tiles) stays within the ~16MB
    scoped budget."""
    cap = max(8, min(256, (10 * 1024 * 1024) // (14 * 4 * max(w, 1))))
    for th in (256, 240, 216, 192, 160, 144, 128, 120, 112, 96, 88, 80, 72,
               64, 56, 48, 40, 32, 24, 16, 8):
        if th <= cap and h % th == 0:
            return th
    return None


def supports_fused_blend(h: int, w: int, pred_channels: int,
                         attenuation, blending_method: str) -> bool:
    from ..modules.jnd import JND
    th = _pick_tile(h, w)
    if th is None:
        return False
    vmem_bytes = 4 * (2 * (th + 8) * (w + 132) * 3    # double-buffered img tiles
                      + 2 * th * w * pred_channels    # double-buffered pred tiles
                      + 2 * th * w * 3                # out blocks
                      + 3 * (th + 8) * (w + 132))     # lum + rotating temporaries
    return (isinstance(attenuation, JND)
            and attenuation.in_channels == 1
            and attenuation.out_channels in (1, 3)
            and not attenuation.blue
            and blending_method == "additive"
            and pred_channels in (1, 3)
            and vmem_bytes < 14 * 1024 * 1024)


def _kernel(si_ref, sw_ref, img_hbm, pred_hbm, out_ref,
            img_vmem, pred_vmem, sem_img, sem_pred, *, th: int, w: int,
            wp: int, pred_c: int, n_tiles: int, n_steps: int, out_dtype):
    f = pl.program_id(0)
    i = pl.program_id(1)
    step = f * n_tiles + i
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    def dma_img(s, sl):
        fs = jax.lax.div(s, n_tiles)
        ts = jax.lax.rem(s, n_tiles)
        return pltpu.make_async_copy(
            img_hbm.at[fs, :, pl.ds(ts * th, th + 8)], img_vmem.at[sl],
            sem_img.at[sl])

    def dma_pred(s, sl):
        fs = jax.lax.div(s, n_tiles)
        ts = jax.lax.rem(s, n_tiles)
        return pltpu.make_async_copy(
            pred_hbm.at[fs, :, pl.ds(ts * th, th)], pred_vmem.at[sl],
            sem_pred.at[sl])

    @pl.when(step == 0)
    def _():
        dma_img(step, slot).start()
        dma_pred(step, slot).start()

    @pl.when(step + 1 < n_steps)
    def _():
        dma_img(step + 1, nxt).start()
        dma_pred(step + 1, nxt).start()

    dma_img(step, slot).wait()
    dma_pred(step, slot).wait()

    x = img_vmem[slot]                   # (3, th+8, wp), [0,1]
    lum = ((0.299 * 255.0) * x[0] + (0.587 * 255.0) * x[1]
           + (0.114 * 255.0) * x[2])

    # luminance masking: 5x5 weighted kernel decomposed SEPARABLY
    # (jnd.py:39-45: W = ones5x5 + ones3x3 - 2*center), minimizing live
    # temporaries so row tiles can be large (fewer grid steps).
    def vsum(src, n, top):  # sum of n consecutive rows, output th rows
        acc = jax.lax.slice(src, (top, 0), (top + th, wp))
        for d in range(1, n):
            acc = acc + jax.lax.slice(src, (top + d, 0), (top + d + th, wp))
        return acc

    def hsum(src, n, left):  # sum of n consecutive cols, output w cols
        acc = jax.lax.slice(src, (0, left), (th, left + w))
        for d in range(1, n):
            acc = acc + jax.lax.slice(src, (0, left + d), (th, left + d + w))
        return acc

    col5 = vsum(lum, 5, 2)               # (th, wp)
    col3 = vsum(lum, 3, 3)
    center = jax.lax.slice(lum, (4, 2), (4 + th, 2 + w))
    la = hsum(col5, 5, 0) + hsum(col3, 3, 1) - 2.0 * center
    la = la * (1.0 / 32.0)
    lo = 17.0 * (1.0 - jnp.sqrt(la * (1.0 / 127.0) + 1e-5))
    hi = (3.0 / 128.0) * (la - 127.0) + 3.0
    la = jnp.where(la <= 127.0, lo, hi)

    # Sobel, separable: gx = (1,2,1)^T * (-1,0,1); gy = (1,0,-1)^T * (1,2,1)
    t = (jax.lax.slice(lum, (3, 0), (3 + th, wp))
         + 2.0 * jax.lax.slice(lum, (4, 0), (4 + th, wp))
         + jax.lax.slice(lum, (5, 0), (5 + th, wp)))          # vertical 1,2,1
    gx = (jax.lax.slice(t, (0, 3), (th, 3 + w))
          - jax.lax.slice(t, (0, 1), (th, 1 + w)))
    s_top = vsum(lum, 1, 3)
    s_bot = vsum(lum, 1, 5)
    s_diff = s_top - s_bot                                     # rows y-1 - y+1
    gy = (jax.lax.slice(s_diff, (0, 1), (th, 1 + w))
          + 2.0 * jax.lax.slice(s_diff, (0, 2), (th, 2 + w))
          + jax.lax.slice(s_diff, (0, 3), (th, 3 + w)))
    cm2 = gx * gx + gy * gy
    cm = 16.0 * _pow12(jnp.maximum(cm2, 1e-20)) / (cm2 + 676.0)
    cm = jnp.where(cm2 > 0.0, cm, 0.0)
    cm = 0.117 * cm

    h = jnp.maximum(la + cm - 0.3 * jnp.minimum(la, cm), 0.0) * (1.0 / 255.0)

    si = si_ref[0]
    sw = sw_ref[0]
    swh = sw * h                                            # (th, w)
    pred = pred_vmem[slot].astype(jnp.float32)              # (pred_c, th, w)
    img_c = jax.lax.slice(x, (0, 4, 2), (3, 4 + th, 2 + w))
    out = si * img_c + swh[None] * pred                     # bcast 1|3 channels
    out_ref[0] = jnp.clip(out, 0.0, 1.0).astype(out_dtype)


def _delta_kernel(sw_ref, lum_hbm, pred_hbm, out_ref,
                  lum_vmem, pred_vmem, sem_lum, sem_pred, *, th: int, w: int,
                  wp: int, n_tiles: int, n_steps: int):
    """Single-channel variant: inputs are 2D planes (no channel dim at all),
    output is the watermark DELTA sw*h(lum)*pred; the RGB blend fuses into
    one XLA elementwise pass outside. Zero layout changes anywhere."""
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

    lum = lum_vmem[slot]                  # (th+8, wp), [0,255]

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
    lo = 17.0 * (1.0 - jnp.sqrt(la * (1.0 / 127.0) + 1e-5))
    hi = (3.0 / 128.0) * (la - 127.0) + 3.0
    la = jnp.where(la <= 127.0, lo, hi)

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
    cm = 16.0 * _pow12(jnp.maximum(cm2, 1e-20)) / (cm2 + 676.0)
    cm = jnp.where(cm2 > 0.0, cm, 0.0)
    cm = 0.117 * cm

    h = jnp.maximum(la + cm - 0.3 * jnp.minimum(la, cm), 0.0) * (1.0 / 255.0)
    out_ref[0] = (sw_ref[0] * h) * pred_vmem[slot].astype(jnp.float32)


def _pick_tile_delta(h: int, w: int, lum_bytes: int = 2) -> int | None:
    """Row tile for the delta kernels: largest multiple of 8 dividing h whose
    VMEM working set (~6 live f32 temporaries + double-buffered lum/out)
    fits. Bigger tiles amortize per-step overhead (measured: th=120 runs at
    ~490 GB/s vs ~315 at th=72 on 1080p)."""
    wq = -(-w // 128) * 128
    wp = wq + 128
    for th in (216, 184, 152, 120, 104, 88, 72, 56, 40, 32, 24, 16, 8):
        if h % th:
            continue
        vmem = (2 * (th + 8) * wp * lum_bytes    # double-buffered lum tiles
                + 2 * th * wq * 4                # out blocks
                + 2 * th * wq * 4                # pred tile + band scratch
                + 6 * (th + 8) * wp * 4)         # rotating f32 temporaries
        if vmem < 14 * 1024 * 1024:
            return th
    return None


def _jnd_heatmap_tile(lum, th: int, w: int, wp: int, co: int = 2):
    """The JND la/cm math on one (th+8, wp) f32 luminance tile -> (th, w)
    heatmap in [0,1] (modules/jnd.py:63-108, jnd_1_1). Image columns sit at
    buffer offset `co` (>= 2; zeros outside) so callers with lane-aligned
    layouts (planar serving buffers, co=128) reuse the same math."""
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
    center = jax.lax.slice(lum, (4, co), (4 + th, co + w))
    la = (hsum(col5, 5, co - 2) + hsum(col3, 3, co - 1)
          - 2.0 * center) * (1.0 / 32.0)
    lo = 17.0 * (1.0 - jnp.sqrt(la * (1.0 / 127.0) + 1e-5))
    hi = (3.0 / 128.0) * (la - 127.0) + 3.0
    la = jnp.where(la <= 127.0, lo, hi)

    t = (jax.lax.slice(lum, (3, 0), (3 + th, wp))
         + 2.0 * jax.lax.slice(lum, (4, 0), (4 + th, wp))
         + jax.lax.slice(lum, (5, 0), (5 + th, wp)))
    gx = (jax.lax.slice(t, (0, co + 1), (th, co + 1 + w))
          - jax.lax.slice(t, (0, co - 1), (th, co - 1 + w)))
    s_diff = (jax.lax.slice(lum, (3, 0), (3 + th, wp))
              - jax.lax.slice(lum, (5, 0), (5 + th, wp)))
    gy = (jax.lax.slice(s_diff, (0, co - 1), (th, co - 1 + w))
          + 2.0 * jax.lax.slice(s_diff, (0, co), (th, co + w))
          + jax.lax.slice(s_diff, (0, co + 1), (th, co + 1 + w)))
    cm2 = gx * gx + gy * gy
    cm = 16.0 * _pow12(jnp.maximum(cm2, 1e-20)) / (cm2 + 676.0)
    cm = jnp.where(cm2 > 0.0, cm, 0.0)
    cm = 0.117 * cm
    return jnp.maximum(la + cm - 0.3 * jnp.minimum(la, cm), 0.0) * (1.0 / 255.0)


def _delta_up_kernel(sw_ref, lum_hbm, tmp_hbm, mh_ref, out_ref,
                     lum_vmem, tmp_vmem, sem_lum, sem_tmp, *, th: int, w: int,
                     wp: int, band: int, in_h: int, out_h: int,
                     n_tiles: int, n_steps: int):
    """Delta kernel with the prediction UPSAMPLE fused in: instead of reading
    a full-res prediction plane from HBM (the resize_up materialization), each
    tile DMAs only the `band` low-res rows it needs (width already resized by
    one XLA matmul) and lifts them with a (th, band) x (band, w) MXU matmul —
    ~30x less prediction traffic at 256->1080."""
    f = pl.program_id(0)
    i = pl.program_id(1)
    step = f * n_tiles + i
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    def band_start(ts):
        # 8-aligned (Mosaic: dynamic DMA sublane offsets must honor tiling).
        # Clip in units of 8 and multiply LAST so the alignment is provable
        # (a clip after the *8 defeats Mosaic's divisibility analysis).
        s8 = jax.lax.div(jax.lax.div(ts * th * in_h, out_h) - 1, 8)
        s8 = jnp.clip(s8, 0, (in_h - band) // 8)
        return s8 * 8

    def dma_lum(s, sl):
        fs = jax.lax.div(s, n_tiles)
        ts = jax.lax.rem(s, n_tiles)
        return pltpu.make_async_copy(
            lum_hbm.at[fs, pl.ds(ts * th, th + 8)], lum_vmem.at[sl],
            sem_lum.at[sl])

    def dma_tmp(s, sl):
        fs = jax.lax.div(s, n_tiles)
        ts = jax.lax.rem(s, n_tiles)
        return pltpu.make_async_copy(
            tmp_hbm.at[fs, pl.ds(band_start(ts), band)], tmp_vmem.at[sl],
            sem_tmp.at[sl])

    @pl.when(step == 0)
    def _():
        dma_lum(step, slot).start()
        dma_tmp(step, slot).start()

    @pl.when(step + 1 < n_steps)
    def _():
        dma_lum(step + 1, nxt).start()
        dma_tmp(step + 1, nxt).start()

    dma_lum(step, slot).wait()
    dma_tmp(step, slot).wait()

    lum = lum_vmem[slot].astype(jnp.float32)
    h = _jnd_heatmap_tile(lum, th, w, wp)
    pred = jnp.dot(mh_ref[i], tmp_vmem[slot],
                   preferred_element_type=jnp.float32)   # (th, band)@(band, w)
    out_ref[0] = (sw_ref[0] * h) * pred


@functools.partial(jax.jit, static_argnames=("interpret", "lum_dtype"))
def fused_jnd_delta_up(imgs: jnp.ndarray, pred_low: jnp.ndarray, scaling_w,
                       interpret: bool = False,
                       lum_dtype=jnp.float32) -> jnp.ndarray:
    """imgs: (F, H, W, 3) [0,1] float or uint8; pred_low: (F, s, s) watermark
    prediction at PROCESSING resolution. Returns delta (F, H, W) =
    scaling_w * jnd_heatmap(imgs) * bilinear_upscale(pred_low).

    Matches fused_jnd_delta(imgs, resize_bilinear(pred_low, H, W), sw) while
    never materializing the full-res prediction: the width resize is one
    (s -> W) matmul at low height; the height lift happens per-tile in VMEM.
    """
    from ..ops.resize import _resize_matrix

    f, h, w, _ = imgs.shape
    s = pred_low.shape[-1]
    th = _pick_tile_delta(h, w, jnp.dtype(lum_dtype).itemsize)
    assert th is not None, f"no row tile divides H={h}"
    band = -(-(th * s) // h) + 3 + 7  # +7: start is aligned DOWN to 8
    band = -(-band // 8) * 8          # sublane-align the band size
    band = min(band, s)

    sc = 255.0 if jnp.issubdtype(imgs.dtype, jnp.floating) else 1.0
    x = imgs.astype(jnp.float32)
    lum = (x[..., 0] * (0.299 * sc) + x[..., 1] * (0.587 * sc)
           + x[..., 2] * (0.114 * sc))
    wq = -(-w // 128) * 128
    wp = wq + 128
    lum = jnp.pad(lum, ((0, 0), (4, 4), (2, wp - w - 2))).astype(lum_dtype)

    # width resize first: (F, s, s) @ (s, W)^T, one MXU pass at low height
    mw = jnp.asarray(_resize_matrix(s, w, antialias=True), jnp.float32)
    tmp = jnp.einsum("Ww,fhw->fhW", mw, pred_low.astype(jnp.float32),
                     precision="highest")
    if wq != w:
        tmp = jnp.pad(tmp, ((0, 0), (0, 0), (0, wq - w)))

    # per-tile height-lift bands of the (H, s) resize matrix
    mh_full = _resize_matrix(s, h, antialias=True)     # (H, s)
    n_tiles = h // th
    mh_packed = np.zeros((n_tiles, th, band), np.float32)
    for i in range(n_tiles):
        start = min(max((i * th * s // h - 1) // 8 * 8, 0), s - band)
        rows = mh_full[i * th:(i + 1) * th]
        nz = np.nonzero(rows)[1]
        assert nz.min() >= start and nz.max() < start + band, \
            f"height-lift band too narrow at tile {i}"
        mh_packed[i, :, :] = rows[:, start:start + band]
    mh = jnp.asarray(mh_packed)

    kern = functools.partial(_delta_up_kernel, th=th, w=wq, wp=wp, band=band,
                             in_h=s, out_h=h, n_tiles=n_tiles,
                             n_steps=f * n_tiles)
    sw = jnp.reshape(jnp.asarray(scaling_w, jnp.float32), (1,))
    out = pl.pallas_call(
        kern,
        grid=(f, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mh: 230KB, resident
        ],
        out_specs=pl.BlockSpec((1, th, wq), lambda fi, i: (fi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, h, wq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 8, wp), jnp.dtype(lum_dtype)),
            pltpu.VMEM((2, band, wq), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sw, lum, tmp, mh)
    return out[..., :w]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_jnd_delta(imgs: jnp.ndarray, pred: jnp.ndarray, scaling_w,
                    interpret: bool = False) -> jnp.ndarray:
    """imgs: (F, H, W, 3) [0,1]; pred: (F, H, W) single-channel watermark
    prediction. Returns delta (F, H, W) = scaling_w * jnd_heatmap(imgs) * pred.

    Caller completes the blend with one fused XLA pass:
    imgs_w = clip(si*imgs + delta[..., None], 0, 1). This variant needs NO
    layout transposes: luminance is one fused XLA pass over NHWC, and the
    kernel works on 2D (H, W) planes.
    """
    f, h, w, _ = imgs.shape
    th = _pick_tile(h, w)
    assert th is not None, f"no row tile divides H={h}"

    # [0,1] floats scale to the JND's 0..255 domain; uint8 already is there
    sc = 255.0 if jnp.issubdtype(imgs.dtype, jnp.floating) else 1.0
    x = imgs.astype(jnp.float32)
    lum = (x[..., 0] * (0.299 * sc) + x[..., 1] * (0.587 * sc)
           + x[..., 2] * (0.114 * sc))  # (F, H, W) in 0..255
    wq = -(-w // 128) * 128
    wp = wq + 128
    lum = jnp.pad(lum, ((0, 0), (4, 4), (2, wp - w - 2)))
    pred_p = jnp.pad(pred.astype(jnp.float32), ((0, 0), (0, 0), (0, wq - w)))

    n_tiles = h // th
    kern = functools.partial(_delta_kernel, th=th, w=wq, wp=wp,
                             n_tiles=n_tiles, n_steps=f * n_tiles)
    sw = jnp.reshape(jnp.asarray(scaling_w, jnp.float32), (1,))
    out = pl.pallas_call(
        kern,
        grid=(f, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, wq), lambda fi, i: (fi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, h, wq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 8, wp), jnp.float32),
            pltpu.VMEM((2, th, wq), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sw, lum, pred_p)
    return out[..., :w]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_jnd_blend(imgs: jnp.ndarray, preds: jnp.ndarray,
                    scaling_i, scaling_w, interpret: bool = False) -> jnp.ndarray:
    """imgs: (F, H, W, 3) in [0,1]; preds: (F, H, W, 1|3) watermark preds
    (f32 or bf16 — bf16 halves the prediction DMA traffic).

    Returns clip(si*imgs + sw*jnd_heatmap(imgs)*preds, 0, 1) in imgs.dtype,
    identical to JND(1, 1|3).heatmaps + additive blend + clamp.
    """
    f, h, w, _ = imgs.shape
    pred_c = preds.shape[-1]
    th = _pick_tile(h, w)
    assert th is not None, f"no row tile divides H={h}"
    out_dtype = imgs.dtype

    wq = -(-w // 128) * 128
    wp = wq + 128
    imgs_t = jnp.moveaxis(imgs.astype(jnp.float32), -1, 1)      # (F,3,H,W)
    imgs_t = jnp.pad(imgs_t, ((0, 0), (0, 0), (4, 4), (2, wp - w - 2)))
    preds_t = jnp.moveaxis(preds, -1, 1)                        # (F,C,H,W)
    preds_t = jnp.pad(preds_t, ((0, 0), (0, 0), (0, 0), (0, wq - w)))

    n_tiles = h // th
    kern = functools.partial(_kernel, th=th, w=wq, wp=wp, pred_c=pred_c,
                             n_tiles=n_tiles, n_steps=f * n_tiles,
                             out_dtype=out_dtype)
    si = jnp.reshape(jnp.asarray(scaling_i, jnp.float32), (1,))
    sw = jnp.reshape(jnp.asarray(scaling_w, jnp.float32), (1,))

    out = pl.pallas_call(
        kern,
        grid=(f, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, th, wq), lambda fi, i: (fi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f, 3, h, wq), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, th + 8, wp), jnp.float32),
            pltpu.VMEM((2, pred_c, th, wq), preds.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(si, sw, imgs_t, preds_t)
    return jnp.moveaxis(out[..., :w], 1, -1)  # crop pad, back to NHWC
