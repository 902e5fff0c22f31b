"""Pallas TPU kernel: planar-u8 fused JND + upsample + blend (serving path).

The endgame for the full-resolution embedding stage (the reference does it as
several full-res passes: luminance, JND convs, heatmap x prediction, blend,
clamp — modules/jnd.py:80-114 + models/videoseal.py:333-344). The NHWC u8
path already fuses the JND math (fused_blend.fused_jnd_delta_up) but still
pays for a full-res f32 luminance materialization, a full-res f32 delta
write, and an XLA blend pass over it — ~40 MB of HBM traffic per frame.

This kernel instead works on PLANAR RGB uint8 frames in a padded-stride
layout (what a production decoder writes directly: planar output is a free
flag on libswscale, and video is stored planar in every codec anyway). ONE
pass per tile:

  read 3 u8 planes (+ the halo rows) and the low-res prediction band
  -> luminance + JND heatmap in VMEM (f32)
  -> prediction upsample as a banded height-lift matmul (MXU)
  -> per-plane u8 blend + round + clamp
  -> write 3 u8 planes

HBM traffic/frame @1080p: ~9.5 MB read + 6.3 MB write (vs ~40 MB for the
NHWC path) — the stage becomes DMA-bound at the u8 image size itself.

Layout (``planar_shape``): image rows at [R0, R0+H), image cols at
[C0, C0+W), zeros elsewhere. R0=28 so each 64-row output tile reads one
32-aligned 96-row u8 slice (Mosaic: u8 DMA starts must honor (32,128)
tiling); C0=128 keeps the 2-col JND halo inside the buffer with lane-aligned
DMAs. Parity: fused_blend.fused_jnd_delta_up composed with the elementwise
u8 blend (tests/test_fused_planar.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_blend import _jnd_heatmap_tile

R0 = 28          # top pad rows (>= 4 halo; chosen so tile reads stay aligned)
C0 = 128         # left pad cols (lane-aligned, >= 2 halo)
TH = 96          # output rows per tile (multiple of 32: u8 sublane tiling).
                 # Measured round 4 (evals/planar_probe, 128f @1080p):
                 # TH=64 14.25 ms, TH=96 13.36 ms, TH=128 OOMs the 16 MB
                 # scoped-VMEM stack (17.37M) at the default limit. 96 wins.
TIN = 128        # input rows per tile DMA (covers TH + 8 halo, multiple of 32)


def planar_geometry(h: int, w: int, th: int | None = None,
                    tin: int | None = None):
    """(n_tiles, padded_h, padded_w, wq) for an HxW image.

    th/tin override the module-default tile geometry (probe use:
    evals/planar_probe A/Bs tile heights without monkey-patching globals)."""
    th = th or TH
    tin = tin or TIN
    n_tiles = -(-h // th)
    hp = th * n_tiles + (tin - th)       # last tile reads (n-1)*th .. +tin
    wq = -(-w // 128) * 128
    return n_tiles, hp, wq + 2 * C0, wq


def planar_shape(f: int, h: int, w: int, th: int | None = None,
                 tin: int | None = None) -> tuple[int, int, int, int]:
    """Buffer shape (F, 3, Hp, Wb) for F HxW frames."""
    _, hp, wb, _ = planar_geometry(h, w, th, tin)
    return (f, 3, hp, wb)


def pack_planar(imgs: np.ndarray | jnp.ndarray, th: int | None = None,
                tin: int | None = None) -> jnp.ndarray:
    """(F, H, W, 3) u8 NHWC -> padded planar (F, 3, Hp, Wb) u8 (tests/compat;
    production decoders fill the planar buffer directly)."""
    f, h, w, _ = imgs.shape
    _, hp, wb, _ = planar_geometry(h, w, th, tin)
    out = jnp.zeros((f, 3, hp, wb), jnp.uint8)
    return out.at[:, :, R0:R0 + h, C0:C0 + w].set(
        jnp.transpose(jnp.asarray(imgs), (0, 3, 1, 2)))


def unpack_planar(imgs_p: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Kernel output (F, 3, Ho, Wq) u8 -> (F, H, W, 3) u8 NHWC."""
    return jnp.transpose(imgs_p[:, :, :h, :w], (0, 2, 3, 1))


def _blend_planar_kernel(*refs, wq: int, wb: int, band: int, in_h: int,
                         out_h: int, n_tiles: int, n_steps: int, th: int,
                         tin: int, bd: int = 0, ds: int = 0,
                         lowres: bool = False):
    emit = ds > 0
    if emit:
        (si_ref, sw_ref, img_hbm, tmp_hbm, mh_ref, mwd_ref, mdh_ref,
         out_ref, det_ref, img_vmem, tmp_vmem, sem_img, sem_tmp) = refs
    else:
        (si_ref, sw_ref, img_hbm, tmp_hbm, mh_ref,
         out_ref, img_vmem, tmp_vmem, sem_img, sem_tmp) = refs
    i = pl.program_id(1)
    step = pl.program_id(0) * n_tiles + i
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    def band_start(ts):
        # 8-aligned start (clip in units of 8, multiply LAST so Mosaic can
        # prove divisibility — see fused_jnd_delta_up). Must mirror the
        # host-side mh band packing exactly (same out_h = true image height).
        s8 = jax.lax.div(jax.lax.div(ts * th * in_h, out_h) - 1, 8)
        s8 = jnp.clip(s8, 0, (in_h - band) // 8)
        return s8 * 8

    def dma_img(s, sl):
        fs = jax.lax.div(s, n_tiles)
        ts = jax.lax.rem(s, n_tiles)
        return pltpu.make_async_copy(
            img_hbm.at[fs, :, pl.ds(ts * th, tin)], img_vmem.at[sl],
            sem_img.at[sl])

    def dma_tmp(s, sl):
        fs = jax.lax.div(s, n_tiles)
        ts = jax.lax.rem(s, n_tiles)
        return pltpu.make_async_copy(
            tmp_hbm.at[fs, pl.ds(band_start(ts), band)], tmp_vmem.at[sl],
            sem_tmp.at[sl])

    @pl.when(step == 0)
    def _():
        dma_img(step, slot).start()
        dma_tmp(step, slot).start()

    @pl.when(step + 1 < n_steps)
    def _():
        dma_img(step + 1, nxt).start()
        dma_tmp(step + 1, nxt).start()

    dma_img(step, slot).wait()
    dma_tmp(step, slot).wait()

    pred = jnp.dot(mh_ref[i], tmp_vmem[slot],
                   preferred_element_type=jnp.float32)   # (th, wq)
    if lowres:
        # lowres-attenuation serving mode (ref videoseal.py:321-331 /
        # inference_streaming.py:28): the JND heatmap was already multiplied
        # into the prediction at PROCESSING resolution, so the full-res VPU
        # work collapses to the u8 blend itself — convert only the live th
        # rows per plane, no luminance/JND convs, no halo.
        delta = (255.0 * sw_ref[0]) * pred
        planes = [jax.lax.slice(img_vmem[slot, c], (R0, C0),
                                (R0 + th, C0 + wq)
                                ).astype(jnp.int32).astype(jnp.float32)
                  for c in range(3)]
    else:
        # Mosaic has no direct u8<->f32 casts; hop through i32 (exact).
        # Convert only the rows the math reads (R0-4 .. R0+th+4): the DMA must
        # fetch tin (32-row granularity) but compute can skip the dead pad
        # rows.
        lo = R0 - 4
        rows = th + 8
        slabs = [jax.lax.slice(img_vmem[slot, c], (lo, 0), (lo + rows, wb)
                               ).astype(jnp.int32).astype(jnp.float32)
                 for c in range(3)]
        r, g, b = slabs
        lum = 0.299 * r + 0.587 * g + 0.114 * b          # (th+8, Wb), 0..255
        heat = _jnd_heatmap_tile(lum, th, wq, wb, co=C0)  # (th, wq) in [0,1]
        delta = (255.0 * sw_ref[0] * heat) * pred
        planes = [jax.lax.slice(p, (4, C0), (4 + th, C0 + wq)) for p in slabs]
    si = si_ref[0]
    for c, v in enumerate(planes):
        vals = jnp.clip(jnp.round(si * v + delta), 0.0, 255.0)
        out_ref[0, c] = vals.astype(jnp.int32).astype(jnp.uint8)
        if emit:
            # fused detect-side downscale: the tile's final full-res rows
            # never leave VMEM. Width matmul first (wq -> ds, bf16: vals are
            # integers <= 255, exact in bf16), then the tile's banded height
            # contribution. Bands are written to a per-tile output (STATIC
            # block index) and overlap-added by a tiny XLA epilogue — no
            # dynamic read-modify-write in the kernel.
            vd = jnp.dot(vals.astype(jnp.bfloat16), mwd_ref[:],
                         preferred_element_type=jnp.float32)     # (th, ds)
            det_ref[0, 0, c] = jnp.dot(
                mdh_ref[i].astype(jnp.bfloat16), vd.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)              # (bd, ds)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "interpret", "th", "tin",
                                    "detect_size", "lowres"))
def fused_jnd_blend_planar(imgs_p: jnp.ndarray, pred_low: jnp.ndarray,
                           scaling_w, scaling_i, h: int, w: int,
                           interpret: bool = False,
                           th: int | None = None,
                           tin: int | None = None,
                           detect_size: int | None = None,
                           lowres: bool = False):
    """imgs_p: padded planar (F, 3, Hp, Wb) uint8 (see planar_shape);
    pred_low: (F, s, s) watermark prediction at processing resolution;
    h/w: the true image dims (static). Returns (F, 3, th*n_tiles, Wq) uint8
    planar watermarked frames (image at [:h, :w]; rows/cols beyond are junk
    from the zero padding — crop or fold the offset into downstream resizes).

    lowres=True is the lowres-attenuation serving mode (the reference's own
    video-serving configuration: inference_streaming.py:28 passes
    lowres_attenuation=True; impl videoseal.py:321-331): pred_low must
    already carry the proc-res JND heatmap (heat(imgs_res) * pred), and the
    kernel computes out = clip(round(si*img + 255*sw*upsample(pred_low)))
    with NO full-res JND math — the tile work collapses to the u8 blend and
    the banded upsample matmul, approaching the kernel's DMA floor.

    th/tin: tile geometry override (must match the geometry the buffer was
    packed with); default is the measured-fastest module constant.

    detect_size=ds additionally returns the watermarked frames downscaled to
    (F, 3, ds, ds) f32 in [0, 1] — the extractor's input — computed INSIDE
    the kernel while each tile's full-res rows are still VMEM-resident
    (width matmul wq->ds per tile, then a banded height matmul accumulated
    across tiles), so the detect path never re-reads the full-res planes
    from HBM (replaces the resize of ref wam.py:206-234's detect entry).
    The matmuls ride the MXU, which idles during this kernel's VPU-bound
    JND math — the downscale is nearly free.

    out = clip(round(si*img + 255*sw*jnd_heatmap(img)*upsample(pred)), 0, 255)
    """
    from ..ops.resize import _resize_matrix

    th = th or TH
    tin = tin or TIN
    assert th % 32 == 0 and tin == th + 32, (th, tin)
    f, c, hp, wb = imgs_p.shape
    n_tiles, hp_want, wb_want, wq = planar_geometry(h, w, th, tin)
    assert (c, hp, wb) == (3, hp_want, wb_want), \
        f"buffer {imgs_p.shape} does not match planar_shape for {h}x{w}"
    s = pred_low.shape[-1]
    band = -(-(th * s) // h) + 3 + 7
    band = max(-(-band // 8) * 8, 8)
    band = min(band, s)

    # width resize at low height: (s -> W) as one MXU matmul
    mw = jnp.asarray(_resize_matrix(s, w, antialias=True), jnp.float32)
    tmp = jnp.einsum("Ww,fhw->fhW", mw, pred_low.astype(jnp.float32),
                     precision="highest")
    if wq != w:
        tmp = jnp.pad(tmp, ((0, 0), (0, 0), (0, wq - w)))

    # banded height-lift matrices per tile (rows >= h are zero)
    mh_full = np.zeros((th * n_tiles, s), np.float32)
    mh_full[:h] = _resize_matrix(s, h, antialias=True)
    mh_packed = np.zeros((n_tiles, th, band), np.float32)
    for i in range(n_tiles):
        start = min(max((i * th * s // h - 1) // 8 * 8, 0), s - band)
        rows = mh_full[i * th:(i + 1) * th]
        nz = np.nonzero(rows)[1]
        if nz.size:
            assert nz.min() >= start and nz.max() < start + band, \
                f"height-lift band too narrow at tile {i}"
        mh_packed[i] = rows[:, start:start + band]
    mh = jnp.asarray(mh_packed)

    si = jnp.reshape(jnp.asarray(scaling_i, jnp.float32), (1,))
    sw = jnp.reshape(jnp.asarray(scaling_w, jnp.float32), (1,))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),       # u8 planes (manual DMA)
        pl.BlockSpec(memory_space=pl.ANY),       # width-resized pred
        pl.BlockSpec(memory_space=pltpu.VMEM),   # mh bands, resident
    ]
    out_specs = pl.BlockSpec((1, 3, th, wq), lambda fi, i: (fi, 0, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((f, 3, th * n_tiles, wq), jnp.uint8)
    inputs = [si, sw, imgs_p, tmp, mh]
    bd = 0
    ds = detect_size or 0
    if ds:
        assert ds % 128 == 0, f"detect_size must be lane-aligned, got {ds}"
        # width downscale matrix (wq -> ds), 1-pass bf16 on the MXU
        mwd = np.zeros((wq, ds), np.float32)
        mwd[:w] = _resize_matrix(w, ds, antialias=True).T
        # banded height downscale per tile: tile i's output rows [i*th,
        # (i+1)*th) feed detect rows [d2s[i], d2s[i]+bd). 1/255 folded in.
        mdh_full = np.zeros((ds, th * n_tiles), np.float32)
        mdh_full[:, :h] = _resize_matrix(h, ds, antialias=True) / 255.0
        spans = []
        for i in range(n_tiles):
            nz = np.nonzero(mdh_full[:, i * th:(i + 1) * th])[0]
            spans.append((int(nz.min()), int(nz.max())) if nz.size else (0, 0))
        bd = max(hi - (lo // 8) * 8 + 1 for lo, hi in spans)
        bd = min(-(-bd // 8) * 8, ds)
        d2s = np.zeros((n_tiles,), np.int32)
        mdh_packed = np.zeros((n_tiles, bd, th), np.float32)
        for i, (lo, hi) in enumerate(spans):
            start = min((lo // 8) * 8, ds - bd)
            assert hi < start + bd, f"detect band too narrow at tile {i}"
            d2s[i] = start
            mdh_packed[i] = mdh_full[start:start + bd, i * th:(i + 1) * th]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mwd, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mdh bands, resident
        ]
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, 3, bd, ds),
                                  lambda fi, i: (fi, i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((f, n_tiles, 3, bd, ds),
                                          jnp.float32)]
        inputs += [jnp.asarray(mwd, jnp.bfloat16), jnp.asarray(mdh_packed)]

    kern = functools.partial(_blend_planar_kernel, wq=wq, wb=wb, band=band,
                             in_h=s, out_h=h, n_tiles=n_tiles,
                             n_steps=f * n_tiles, th=th, tin=tin,
                             bd=bd, ds=ds, lowres=lowres)
    outs = pl.pallas_call(
        kern,
        grid=(f, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 3, tin, wb), jnp.uint8),
            pltpu.VMEM((2, band, wq), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*inputs)
    if not ds:
        return outs
    # overlap-add the per-tile detect bands (static offsets; bands only
    # overlap between adjacent tiles, total traffic f*n_tiles*3*bd*ds*4B —
    # ~50 MB at 128f/1080p, ~0.1 ms)
    u8_out, bands = outs
    det = jnp.zeros((f, 3, ds, ds), jnp.float32)
    for i in range(n_tiles):
        st = int(d2s[i])
        det = det.at[:, :, st:st + bd, :].add(bands[:, i])
    return u8_out, det


def resize_planar(imgs_p: jnp.ndarray, h: int, w: int, out_h: int, out_w: int,
                  r0: int = R0, c0: int = C0,
                  precision: str = "highest", gain=None) -> jnp.ndarray:
    """Bilinear+antialias resize straight out of a padded planar buffer:
    (F, 3, Hp, Wb) u8 -> (F, out_h, out_w, 3) f32 in [0, 1]. The row/col
    offsets are folded into the resize matrices (zero-cost: the matmul just
    reads the padded axes), so no slice copy of the full-res frame is made.

    precision="highest" converts the planes to f32 and runs 6-pass matmuls
    (bit-parity with ops.resize). precision="default" takes the serving fast
    path: u8 integer values are EXACT in bfloat16, so the planes are cast to
    bf16 (half the materialization traffic) and the matmuls run single-pass
    on the MXU. The error vs the f32 path comes from the bf16 weight tables
    AND the bf16-stored height intermediate — worst case ~3 LSB at 8-bit
    scale (the bound tests/test_fused_planar.py asserts), typical <1 LSB;
    the downstream extractor computes in bf16 anyway. "high" is rejected:
    this path has exactly two precision regimes and a silent middle tier
    would misleadingly take the bf16 path.

    `gain` (traced scalar, value 1.0) multiplies the frame cast itself: a
    value-preserving data-dependence hook so benchmark loops can force
    re-execution without copying the frame buffer (see bench.py). Applying
    it at the CAST (not the weight matrix) makes the u8->bf16/f32 plane
    conversion itself gain-dependent, so XLA cannot hoist that
    materialization out of a chained timing loop (advisor round-3 finding:
    a weight-side gain left the cast loop-invariant and LICM-eligible).
    """
    from ..ops.resize import _resize_matrix

    f, c, hp, wb = imgs_p.shape
    mh = np.zeros((out_h, hp), np.float32)
    mh[:, r0:r0 + h] = _resize_matrix(h, out_h, antialias=True)
    mw = np.zeros((out_w, wb), np.float32)
    mw[:, c0:c0 + w] = _resize_matrix(w, out_w, antialias=True)
    if precision == "highest":
        x = imgs_p.astype(jnp.float32) * (1.0 / 255.0)
        if gain is not None:
            x = x * gain
        y = jnp.einsum("Hh,fchw->fcHw", jnp.asarray(mh), x,
                       precision=precision)
        y = jnp.einsum("Ww,fchw->fchW", jnp.asarray(mw), y,
                       precision=precision)
        return jnp.transpose(y, (0, 2, 3, 1))
    if precision != "default":
        raise ValueError(
            f"resize_planar supports precision 'highest' (f32 parity) or "
            f"'default' (bf16 serving fast path), got {precision!r}")
    x = imgs_p.astype(jnp.bfloat16)          # exact: u8 integers <= 255
    if gain is not None:
        x = x * jnp.asarray(gain).astype(jnp.bfloat16)
    y = jnp.einsum("Hh,fchw->fcHw", jnp.asarray(mh, jnp.bfloat16), x)
    y = jnp.einsum("Ww,fchw->fchW", jnp.asarray(mw, jnp.bfloat16), y,
                   preferred_element_type=jnp.float32)
    return jnp.transpose(y, (0, 2, 3, 1)) * (1.0 / 255.0)
