"""Pallas TPU kernel: one fused ConvNeXtV2 block.

The extractor's cost is dominated by stages 0-1 (64^2/32^2 feature maps with
96/192 channels): XLA materializes ~10 HBM round trips per block (dwconv, LN
stats, two pointwise matmuls at 4x expansion, GELU, GRN's global reductions).
This kernel runs ONE FRAME per grid step with the entire block VMEM-resident:

    x --dw7x7--> LN --> pw1 (MXU) --> gelu(f32) --> GRN --> pw2 (MXU) --> +x

HBM traffic collapses to read x + write out. GRN's global (H, W) L2 norm is
exact because the whole frame is in VMEM (per-sample semantics preserved —
the usual blocker for tiling ConvNeXtV2 disappears).

Parity: modules/convnext.py ConvNeXtBlock == reference convnext.py:21-57.
Used when the per-frame plane fits VMEM (supports_block); falls back to the
XLA path otherwise.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_block(h: int, w: int, c: int, f: int = 1, k: int = 1) -> bool:
    """VMEM budget: pipelined x tiles + bf16 expanded activations + f32 temps
    (+ k resident block-weight sets for the multi-block kernel)."""
    bytes_needed = (f * (h + 6) * (w + 6) * c * 2 * 2  # in block (pipelined x2)
                    + f * h * w * 4 * c * (2 + 4)      # expanded bf16 + 1 f32 temp
                    + f * h * w * c * 4 * 3            # narrow f32 temps
                    + k * c * 4 * c * 2 * 2)           # weights
    # empirically the (64,64,96) stage-0 shape compiles within Mosaic's
    # scoped budget even though a naive sum suggests ~16MB; Mosaic's
    # liveness analysis reuses the expanded buffers
    return bytes_needed < 17 * 1024 * 1024 and h * w >= 64


def frames_per_step(b: int, h: int, w: int, c: int, cap: int = 16) -> int:
    """Largest f dividing b that fits the VMEM budget.

    Deep ConvNeXt stages (16^2/8^2 planes) do tiny per-frame work — one
    grid step per frame leaves the VPU idle between dispatches. Batching f
    frames per step amortizes the prologue and gives every reduction/matmul
    f x the rows."""
    f = 1
    while (f * 2 <= cap and b % (f * 2) == 0
           and supports_block(h, w, c, f * 2)):
        f *= 2
    return f


def _erf(z):
    """Abramowitz-Stegun 7.1.26 rational erf (max err 1.5e-7 — below bf16
    resolution); Mosaic has no erf/erfc primitive."""
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    """tanh-form GELU (the torch 'approximate' variant): max abs err vs
    exact-erf GELU ~3e-4 — an order below the bf16 activations' resolution —
    and measured 1.2 ms/stage-0-block FASTER than the rational-erf form
    (kernels/convnext_probe.py: tanh is a fast VPU primitive; exp+divide in
    the A&S erf are not)."""
    inner = 0.7978845608028654 * (x + 0.044715 * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _block_math(xpad, dw, dwb, lnw, lnb, w1, b1, gg, gb, w2, b2,
                *, f: int, h: int, w: int, c: int, out_dtype):
    """One ConvNeXtV2 block over a padded VMEM-resident frame batch
    (f, h+6, w+6, c) -> (f, h, w, c) in out_dtype."""
    # depthwise 7x7, f32 accumulation (convnext.py:30); all f frames in one
    # vector op per tap. The bf16->f32 convert happens ONCE per dy row-band
    # (7 converts) instead of once per tap (49): convert-per-tap was ~1/3 of
    # the loop's vector passes (round-4 probe: see kernels/convnext_probe).
    # Per-dy partials also give the scheduler independent accumulation
    # chains instead of one 49-FMA serial chain.
    dw = dw.astype(jnp.float32)                       # (7, 7, c)
    acc = None
    for dy in range(7):
        xr = jax.lax.slice(xpad, (0, dy, 0, 0),
                           (f, dy + h, w + 6, c)).astype(jnp.float32)
        part = None
        for dx in range(7):
            tap = jax.lax.slice(xr, (0, 0, dx, 0), (f, h, dx + w, c))
            t = tap * dw[dy, dx]
            part = t if part is None else part + t
        acc = part if acc is None else acc + part
    acc = acc + dwb.astype(jnp.float32)

    # LayerNorm over channels (eps 1e-6, common.py:131-155)
    mu = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(acc - mu), axis=-1, keepdims=True)
    xn = (acc - mu) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * lnw.astype(jnp.float32) + lnb.astype(jnp.float32)

    # pw1 (MXU) + GELU in f32; expanded activations live in bf16
    # to halve VMEM pressure (GRN normalizes, so the rounding washes out)
    flat = xn.reshape(f * h * w, c).astype(jnp.bfloat16)
    hmid = jnp.dot(flat, w1, preferred_element_type=jnp.float32)
    hmid = _gelu_exact(hmid + b1.astype(jnp.float32)).astype(jnp.bfloat16)

    # GRN (common.py:158-169): per-channel L2 over the whole frame — stats
    # are PER FRAME (per-sample semantics), so reduce over h*w only
    hf = hmid.astype(jnp.float32).reshape(f, h * w, 4 * c)
    gx = jnp.sqrt(jnp.sum(hf * hf, axis=1, keepdims=True))      # (f, 1, 4c)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    hmid = ((gg.astype(jnp.float32) * nx) * hf
            + gb.astype(jnp.float32) + hf
            ).astype(jnp.bfloat16).reshape(f * h * w, 4 * c)

    # pw2 (MXU) + residual
    out = jnp.dot(hmid, w2, preferred_element_type=jnp.float32)
    out = out + b2.astype(jnp.float32)
    res = jax.lax.slice(xpad, (0, 3, 3, 0), (f, 3 + h, 3 + w, c))
    return (out.reshape(f, h, w, c) + res.astype(jnp.float32)
            ).astype(out_dtype)


def _kernel(x_ref, dw_ref, dwb_ref, lnw_ref, lnb_ref, w1_ref, b1_ref,
            gg_ref, gb_ref, w2_ref, b2_ref, out_ref,
            *, f: int, h: int, w: int, c: int):
    out_ref[:] = _block_math(
        x_ref[:], dw_ref[:], dwb_ref[:], lnw_ref[:], lnb_ref[:], w1_ref[:],
        b1_ref[:], gg_ref[:], gb_ref[:], w2_ref[:], b2_ref[:],
        f=f, h=h, w=w, c=c, out_dtype=out_ref.dtype)


def _kernel_multi(*refs, f: int, h: int, w: int, c: int, k: int):
    """k consecutive blocks per grid step: one kernel prologue + one HBM
    round trip instead of k. Intermediate activations stay VMEM-resident and
    are re-padded in-kernel (the 3-px zero halo the next dwconv needs)."""
    x_ref, out_ref = refs[0], refs[-1]
    wrefs = refs[1:-1]
    assert len(wrefs) == 10 * k
    xpad = x_ref[:]                                   # (f, h+6, w+6, c)
    for kk in range(k):
        (dw, dwb, lnw, lnb, w1, b1, gg, gb, w2, b2) = [
            r[:] for r in wrefs[10 * kk:10 * (kk + 1)]]
        y = _block_math(xpad, dw, dwb, lnw, lnb, w1, b1, gg, gb, w2, b2,
                        f=f, h=h, w=w, c=c,
                        out_dtype=out_ref.dtype if kk == k - 1
                        else jnp.bfloat16)
        if kk < k - 1:
            zr = jnp.zeros((f, 3, w, c), jnp.bfloat16)
            zc = jnp.zeros((f, h + 6, 3, c), jnp.bfloat16)
            xpad = jnp.concatenate(
                [zc, jnp.concatenate([zr, y, zr], axis=1), zc], axis=2)
    out_ref[:] = y


@functools.partial(jax.jit, static_argnames=("interpret", "fps"))
def convnext_block_fused(x: jnp.ndarray, params: dict,
                         interpret: bool = False, fps: int = 1) -> jnp.ndarray:
    """x: (B, H, W, C); params: the ConvNeXtBlock param subtree
    (dwconv/norm/pwconv1/grn/pwconv2). Returns the block output.
    fps = frames per grid step (must divide B; see frames_per_step)."""
    b, h, w, c = x.shape
    assert b % fps == 0, (b, fps)
    xpad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))

    dw = params["dwconv"]["kernel"].reshape(7, 7, c)  # HWIO (7,7,1,C)
    dwb = params["dwconv"]["bias"]
    lnw = params["norm"]["weight"]
    lnb = params["norm"]["bias"]
    w1 = params["pwconv1"]["kernel"].astype(jnp.bfloat16)
    b1 = params["pwconv1"]["bias"]
    gg = params["grn"]["gamma"]
    gb = params["grn"]["beta"]
    w2 = params["pwconv2"]["kernel"].astype(jnp.bfloat16)
    b2 = params["pwconv2"]["bias"]


    kern = functools.partial(_kernel, f=fps, h=h, w=w, c=c)
    return pl.pallas_call(
        kern,
        grid=(b // fps,),
        in_specs=[
            pl.BlockSpec((fps, h + 6, w + 6, c), lambda i: (i, 0, 0, 0),
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
        out_specs=pl.BlockSpec((fps, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(xpad, dw, dwb, lnw, lnb, w1, b1, gg, gb, w2, b2)


def blocks_per_step(h: int, w: int, c: int, f: int, depth: int,
                    cap: int = 4) -> int:
    """Largest k (dividing the stage loop usefully) such that k blocks'
    weights + the activation working set fit the VMEM budget. Deep stages
    pay ~10 us of per-grid-step overhead per block invocation (round-3
    ledger: stage-2's 9 blocks run at ~2x their compute floor); k blocks
    per kernel amortize prologue + x/out HBM round trips k-fold."""
    k = 1
    while k * 2 <= min(cap, depth) and supports_block(h, w, c, f, k * 2):
        k *= 2
    return k


@functools.partial(jax.jit, static_argnames=("interpret", "fps", "k"))
def convnext_blocks_fused(x: jnp.ndarray, params_list: tuple,
                          interpret: bool = False, fps: int = 1,
                          k: int = 1) -> jnp.ndarray:
    """Apply k consecutive ConvNeXtV2 blocks in ONE pallas_call.

    params_list: tuple of k ConvNeXtBlock param subtrees (hashable jit
    static? no — passed as pytree arg). Semantics == k sequential
    convnext_block_fused calls (tests/test_convnext_kernel.py)."""
    b, h, w, c = x.shape
    assert b % fps == 0, (b, fps)
    assert len(params_list) == k
    xpad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))

    wspecs = []
    inputs = [xpad]
    for p in params_list:
        inputs += [p["dwconv"]["kernel"].reshape(7, 7, c),
                   p["dwconv"]["bias"], p["norm"]["weight"],
                   p["norm"]["bias"], p["pwconv1"]["kernel"].astype(jnp.bfloat16),
                   p["pwconv1"]["bias"], p["grn"]["gamma"], p["grn"]["beta"],
                   p["pwconv2"]["kernel"].astype(jnp.bfloat16),
                   p["pwconv2"]["bias"]]
        wspecs += [
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
        ]

    kern = functools.partial(_kernel_multi, f=fps, h=h, w=w, c=c, k=k)
    return pl.pallas_call(
        kern,
        grid=(b // fps,),
        in_specs=[pl.BlockSpec((fps, h + 6, w + 6, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((fps, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(*inputs)
