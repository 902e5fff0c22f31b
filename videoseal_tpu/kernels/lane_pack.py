"""Lane-packed small-channel convolutions for the MXU.

The videoseal_1.0 UNet's top levels run 3x3 stride-1 convs with 16-32 output
channels at 256^2/128^2 (reference videoseal/modules/unet.py:17-55 with
z_channels=16). On TPU the MXU multiplies 128x128 tiles, so a conv with
C_out=16 uses 16 of 128 result lanes — 8x waste — and XLA cannot recover it.

Fix: an EXACT algebraic repack. A 3x3 stride-1 SAME conv producing C_out
channels equals a 4x4 stride-2 VALID conv (on the 1-padded input) producing
4*C_out channels — one channel group per output-pixel phase (a, b) in the
2x2 cell — followed by depth-to-space:

    out[2i+a, 2j+b, co] = sum_{dy,dx,ci} W3[dy,dx,ci,co] * x[2i+a+dy-1, ...]

The tap row index a+dy-1 spans -1..2, i.e. a 4x4 window anchored at (2i, 2j)
on the 1-padded input. Packing W3 into W4[a+dy, b+dx, ci, (a,b,co)] makes the
equality exact (the 7 unused taps per phase are zeros). Cost: 16/9 = 1.78x
FLOPs; benefit: 4x MXU lane utilization (N: 16->64 or 32->128). Net ~2.2x on
the affected convs (measured, PERF.md).

Used by kernels/unet_fused.py for serving; the linen module (modules/unet.py)
is the training path and parity oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# phases in (row, col) order matching the depth-to-space reshape below
_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def pack_weight(w3: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) HWIO -> (4,4,Ci,4Co); channel block (a*2+b) holds phase
    (a, b)'s copy of W3 at spatial offset (a, b)."""
    slices = [jnp.pad(w3, ((a, 1 - a), (b, 1 - b), (0, 0), (0, 0)))
              for a, b in _PHASES]
    return jnp.concatenate(slices, axis=-1)


def conv3x3_lane_packed(x: jnp.ndarray, w3: jnp.ndarray,
                        bias: jnp.ndarray | None = None, *,
                        prepadded: bool = False) -> jnp.ndarray:
    """Exact 3x3 stride-1 SAME (zero-pad) conv via 4x4/s2 + depth-to-space.

    x: (N,H,W,Ci) with H, W even — or, with prepadded=True, (N,H+2,W+2,Ci)
    already padded by 1 on each side (any pad mode; e.g. the UNet Upsample
    block's reflect pad, common.py:45-52).
    """
    if not prepadded:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)])
    co = w3.shape[-1]
    w4 = pack_weight(w3).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, w4.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w4, (2, 2), "VALID",
                                     dimension_numbers=dn)
    if bias is not None:
        y = y + jnp.concatenate([bias] * 4).astype(x.dtype)
    n, h2, w2, _ = y.shape
    y = y.reshape(n, h2, w2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h2 * 2, w2 * 2, co)


def supports_lane_pack(x_shape, w_shape) -> bool:
    """Profitable + valid: 3x3 kernel, 4*Co <= 128 lanes, even spatial dims,
    and enough pixels that compute (not weight DMA) dominates."""
    h, w = x_shape[-3], x_shape[-2]
    return (w_shape[0] == 3 and w_shape[1] == 3 and w_shape[3] * 4 <= 128
            and h % 2 == 0 and w % 2 == 0 and h >= 64 and w >= 64)
