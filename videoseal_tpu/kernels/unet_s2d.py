"""Space-to-depth UNet serving path: full-MXU-rate small-channel convs.

Why: TPU HBM tiling pads an array's minor dim to 128 lanes, so the UNet's
top levels (C=16 at 256^2, C=32 at 128^2 — reference videoseal/modules/
unet.py:17-55 with z_channels=16) move 8x/4x their logical bytes, and XLA's
conv emitter runs them at ~4.6 TF/s regardless of NHWC/NCHW (measured,
PERF.md). Keeping those levels in space-to-depth layout

    s2d(s): (B, H, W, C) -> (B, H/s, W/s, s*s*C),  channel (a*s+b)*C + c

makes every tensor's minor dim >= 64 and every conv a dense large-K/large-N
matmul that the MXU runs at ~175 TF/s. The repack is EXACT: each original
conv becomes one dense cell-space conv whose kernel embeds the original
weights at computed (cell-offset, phase) positions, zeros elsewhere. The
extra FLOPs (4x at s=2) are far cheaper than the padded HBM traffic.

One general packer covers every case. For an original conv with kernel k,
stride t, symmetric pixel padding p, mapping an s2d(s_in) input to an
s2d(s_out) output: output pixel o = s_out*I + a reads input pixel
t*o + dy - p, whose cell offset / phase are divmod(t*a + dy - p, s_in)
relative to cell t*s_out/s_in * I. Collecting all (a, dy) pairs yields a
dense cell-space kernel of size (cd_max - cd_min + 1) and cell stride
t*s_out/s_in (must divide evenly).

Serving-only (with_dtype), raw params with folded BN like unet_fused; the
linen module (modules/unet.py) remains the training path + parity oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import _resize_matrix, resize_bilinear
from .unet_fused import _channel_ln, _fold_bn


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------

def s2d(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/s,W/s,s*s*C), channel (a*s+b)*C+c."""
    if s == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)


def d2s(y: jnp.ndarray, s: int) -> jnp.ndarray:
    if s == 1:
        return y
    b, hc, wc, cc = y.shape
    c = cc // (s * s)
    y = y.reshape(b, hc, wc, s, s, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hc * s, wc * s, c)


def cat_s2d(a: jnp.ndarray, b: jnp.ndarray, s: int) -> jnp.ndarray:
    """Concat two canonical s2d(s) tensors along REAL channels (phase-major
    result): [(ph)(Ca)] + [(ph)(Cb)] -> [(ph)(Ca+Cb)].

    The interleave is one permutation MATMUL on a plain concat: the reshape
    form puts tiny channel groups in the lane dim (a relayout of the whole
    tensor); a (C, C) permutation rides the MXU with full lanes."""
    if s == 1:
        return jnp.concatenate([a, b], axis=-1)
    ss = s * s
    ca = a.shape[-1] // ss
    cb = b.shape[-1] // ss
    cc = a.shape[-1] + b.shape[-1]
    perm = np.zeros((cc, cc), dtype=np.float32)
    for ph in range(ss):
        for j in range(ca):                      # a's phase-ph block
            perm[ph * ca + j, ph * (ca + cb) + j] = 1.0
        for j in range(cb):                      # b's phase-ph block
            perm[a.shape[-1] + ph * cb + j, ph * (ca + cb) + ca + j] = 1.0
    cat = jnp.concatenate([a, b], axis=-1)
    return jnp.einsum("...c,cd->...d", cat,
                      jnp.asarray(perm, cat.dtype)).astype(cat.dtype)


# ---------------------------------------------------------------------------
# the packer
# ---------------------------------------------------------------------------

def pack_conv(w: jnp.ndarray, conv_stride: int, s_in: int, s_out: int,
              pad: int | None = None):
    """Embed an HWIO kernel into dense cell-space form.

    Returns (W_cells, cell_stride, cd_min) where W_cells has shape
    (K, K, s_in^2*Ci, s_out^2*Co). Requires conv_stride*s_out % s_in == 0.
    pad: original symmetric pixel padding (default (k-1)//2); pass 0 for
    prepadded/VALID inputs.
    """
    kh, kw, ci, co = w.shape
    if pad is None:
        pad = (kh - 1) // 2
    assert (conv_stride * s_out) % s_in == 0
    cell_stride = (conv_stride * s_out) // s_in

    offs = [conv_stride * a + dy - pad for a in range(s_out) for dy in range(kh)]
    cd_min = min(o // s_in for o in offs)
    cd_max = max(o // s_in for o in offs)
    K = cd_max - cd_min + 1

    wc = jnp.zeros((K, K, s_in * s_in * ci, s_out * s_out * co), w.dtype)
    for a in range(s_out):
        for b in range(s_out):
            ob = (a * s_out + b) * co
            for dy in range(kh):
                cdy, ay = divmod(conv_stride * a + dy - pad, s_in)
                for dx in range(kw):
                    cdx, ax = divmod(conv_stride * b + dx - pad, s_in)
                    ib = (ay * s_in + ax) * ci
                    wc = wc.at[cdy - cd_min, cdx - cd_min,
                               ib:ib + ci, ob:ob + co].add(w[dy, dx])
    return wc, cell_stride, cd_min


def conv_s2d(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None, *,
             conv_stride: int = 1, s_in: int = 1, s_out: int = 1,
             pad: int | None = None) -> jnp.ndarray:
    """Apply an original-space conv to an s2d(s_in) tensor, producing the
    s2d(s_out) result. Exact for zero 'SAME'-style padding (or pad=0 with a
    prepadded input)."""
    kh = w.shape[0]
    wc, cstride, cd_min = pack_conv(w, conv_stride, s_in, s_out, pad)
    wc = wc.astype(x.dtype)

    def _pads(n_in):
        h_pix = n_in * s_in
        if pad == 0:  # prepadded/VALID: caller supplied the halo
            h_out = (h_pix - kh) // conv_stride + 1
        else:  # SAME-style symmetric padding
            h_out = h_pix // conv_stride
        n_out = h_out // s_out
        pl = -cd_min
        pr = cstride * (n_out - 1) + wc.shape[0] - 1 - pl - (n_in - 1)
        return pl, max(pr, 0)

    pl, pr = _pads(x.shape[1])
    pl_w, pr_w = _pads(x.shape[2])
    dn = jax.lax.conv_dimension_numbers(x.shape, wc.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, wc, (cstride, cstride), [(pl, pr), (pl_w, pr_w)],
        dimension_numbers=dn)
    if bias is not None:
        y = y + jnp.tile(bias, s_out * s_out).astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# UNet forward in s2d space
# ---------------------------------------------------------------------------

def _ln_s2d(x, p, s):
    """ChannelLayerNorm over REAL channels inside an s2d(s) tensor.

    Matmul-form stats: reshaping to (..., s*s, C) puts C in the lane dim
    (C=16 at the top level — 12.5% lane use and a relayout of the whole
    tensor). Instead compute per-phase means with a (cc, s*s) averaging
    matmul and broadcast back with its transpose — lanes stay wide."""
    if s == 1:
        return _channel_ln(x, p)
    n, hc, wc, cc = x.shape
    ss = s * s
    c = cc // ss
    xf = x.astype(jnp.float32)
    sel = jnp.asarray(np.kron(np.eye(ss, dtype=np.float32),
                              np.ones((c, 1), np.float32)))   # (cc, ss)
    mu = jnp.einsum("...c,cp->...p", xf, sel / c)             # (..., ss)
    mu_b = jnp.einsum("...p,cp->...c", mu, sel)               # broadcast back
    d = xf - mu_b
    var = jnp.einsum("...c,cp->...p", d * d, sel / c)
    inv = jax.lax.rsqrt(var + 1e-6)
    inv_b = jnp.einsum("...p,cp->...c", inv, sel)
    w = jnp.tile(p["weight"].astype(jnp.float32), ss)
    b = jnp.tile(p["bias"].astype(jnp.float32), ss)
    return (d * inv_b * w + b).astype(x.dtype)


def _block_s2d(x, p, s_t, normalization, act, s):
    """ResnetBlock (unet.py:17-55) with folded BN, on s2d(s) input."""
    if normalization.startswith("batch"):
        k1, b1 = _fold_bn(p["conv1"]["conv"]["kernel"], p["norm1"]["bn"],
                          s_t["norm1"]["bn"])
        h = act(conv_s2d(x, k1, b1, s_in=s, s_out=s))
        k2, b2 = _fold_bn(p["conv2"]["conv"]["kernel"], p["norm2"]["bn"],
                          s_t["norm2"]["bn"])
        h = act(conv_s2d(h, k2, b2, s_in=s, s_out=s))
    else:  # rms
        from .unet_fused import _norm_act
        h = conv_s2d(x, p["conv1"]["conv"]["kernel"], None, s_in=s, s_out=s)
        if s > 1:
            n, hc, wc, cc = h.shape
            h = _norm_act(h.reshape(n, hc, wc, s * s, cc // (s * s)),
                          p["norm1"], None, normalization, act).reshape(h.shape)
        else:
            h = _norm_act(h, p["norm1"], None, normalization, act)
        h2 = conv_s2d(h, p["conv2"]["conv"]["kernel"], None, s_in=s, s_out=s)
        if s > 1:
            n, hc, wc, cc = h2.shape
            h = _norm_act(h2.reshape(n, hc, wc, s * s, cc // (s * s)),
                          p["norm2"], None, normalization, act).reshape(h2.shape)
        else:
            h = _norm_act(h2, p["norm2"], None, normalization, act)
    res = conv_s2d(x, p["res_conv"]["conv"]["kernel"],
                   p["res_conv"]["conv"].get("bias"), s_in=s, s_out=s)
    return h + res


def _upsample_s2d(x, p, act, s_in, s_out):
    """Upsample block (common.py:45-52) from s2d(s_in) to s2d(s_out):
    2x bilinear resize (in plain space), reflect pad, 3x3 conv packed to
    s2d(s_out), channel LN, act.

    The reflect-padded tensor has awkward dims (2H+2, e.g. 258): zero-pad it
    up to a tile-friendly multiple of 16 and slice the extra output cells —
    exact (the zeros only feed cells that are discarded), and XLA's conv
    emitter handles the aligned size far better."""
    x = d2s(x, s_in)
    h, w = x.shape[-3] * 2, x.shape[-2] * 2
    prec = "highest" if x.dtype == jnp.float32 else "default"
    x = resize_bilinear(x, h, w, antialias=False, precision=prec)
    x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    hp, wp = x.shape[-3], x.shape[-2]
    hq = -(-hp // 16) * 16
    wq = -(-wp // 16) * 16
    if (hq, wq) != (hp, wp):
        x = jnp.pad(x, [(0, 0), (0, hq - hp), (0, wq - wp), (0, 0)])
    y = conv_s2d(x, p["conv"]["kernel"], p["conv"].get("bias"),
                 s_in=1, s_out=s_out, pad=0)
    nh, nw = h // s_out, w // s_out
    if y.shape[-3] != nh or y.shape[-2] != nw:
        y = y[:, :nh, :nw]
    y = _ln_s2d(y, p["norm"], s_out)
    return act(y)


def regrid_s2d(y: jnp.ndarray, s_from: int, r: int) -> jnp.ndarray:
    """Refine the cell grid: s2d(s_from) @ G -> s2d(s_from/r) @ r*G.

    Pure layout permutation (cell-space d2s by factor r); channels stay wide
    (s_from^2*C lanes in, (s_from/r)^2*C out), so XLA moves it at bandwidth.
    """
    if r == 1:
        return y
    b, g, gw, cc = y.shape
    s_new = s_from // r
    c = cc // (s_from * s_from)
    y = y.reshape(b, g, gw, r, s_new, r, s_new, c)
    y = y.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return y.reshape(b, g * r, gw * r, s_new * s_new * c)


@functools.lru_cache(maxsize=32)
def _up_tap_tensor(s: int) -> np.ndarray:
    """Interior taps of (2x bilinear upsample -> reflect pad -> 3x3 conv tap d)
    as a cell-space tensor g[d, k, b, a]: the weight with which conv tap d of
    output pixel 2s*I + b reads input pixel s*(I + k - 1) + a.

    Read off rows of the real resize operator (ops/resize.py half-pixel
    semantics) at an interior cell of a probe domain, so the composition is
    exact by construction rather than by index algebra.
    """
    n = 16 * s
    R = _resize_matrix(n, 2 * n, antialias=False)   # (2n, n)
    J = 4                                            # interior probe cell
    g = np.zeros((3, 3, 2 * s, s), np.float32)
    for d in range(3):
        for k in range(3):
            g[d, k] = R[2 * s * J + d - 1:2 * s * (J + 1) + d - 1,
                        s * (J + k - 1):s * (J + k)]
    return g


def pack_up_conv(w: jnp.ndarray, s: int) -> jnp.ndarray:
    """Compose 2x bilinear upsample + reflect pad + 3x3 conv into ONE dense
    cell-space kernel: s2d(s) @ G input -> s2d(2s) @ G output (same grid).

    (3,3,Ci,Co) -> (3,3, s*s*Ci, 4*s*s*Co). Valid for image-interior cells;
    border cells (resize edge renorm + reflect pad) need the strip fixup in
    _upsample_s2d_composed.
    """
    g = jnp.asarray(_up_tap_tensor(s))               # (d, k, b, a)
    wf = w.astype(jnp.float32)                       # (d, e, Ci, Co)
    wc = jnp.einsum("dkba,elfc,deio->klacibfo", g, g, wf,
                    precision="highest")
    ci, co = w.shape[2], w.shape[3]
    return wc.reshape(3, 3, s * s * ci, 4 * s * s * co)


def _up_strip_h(x, w, bias, s, top: bool):
    """Exact top/bottom output-cell row of upsample+pad+conv, via the plain
    operators on a 2-cell-row input slice. Returns (B, 1, G, 4s^2*Co)."""
    b_, g, gw, _ = x.shape
    H, W = g * s, gw * s
    xs = d2s(x[:, :2] if top else x[:, -2:], s).astype(jnp.float32)
    Rf = _resize_matrix(H, 2 * H, antialias=False)
    Rv = Rf[:2 * s + 1, :2 * s] if top else Rf[-(2 * s + 1):, -2 * s:]
    u = jnp.einsum("Mh,bhwc->bMwc", jnp.asarray(Rv), xs)
    Rw = jnp.asarray(_resize_matrix(W, 2 * W, antialias=False))
    u = jnp.einsum("Ww,bmwc->bmWc", Rw, u)
    if top:   # v[-1] = u[1]
        v = jnp.concatenate([u[:, 1:2], u], axis=1)
    else:     # v[2H] = u[2H-2]
        v = jnp.concatenate([u, u[:, -2:-1]], axis=1)
    v = jnp.pad(v, [(0, 0), (0, 0), (1, 1), (0, 0)], mode="reflect")
    dn = jax.lax.conv_dimension_numbers(v.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(v, w.astype(jnp.float32), (1, 1),
                                     "VALID", dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return s2d(y, 2 * s)


def _up_strip_v(x, w, bias, s, left: bool):
    """Exact left/right output-cell column (full height, corners included).
    Returns (B, G, 1, 4s^2*Co)."""
    b_, g, gw, _ = x.shape
    H, W = g * s, gw * s
    xs = d2s(x[:, :, :2] if left else x[:, :, -2:], s).astype(jnp.float32)
    Rf = _resize_matrix(H, 2 * H, antialias=False)
    u = jnp.einsum("Mh,bhwc->bMwc", jnp.asarray(Rf), xs)   # true full-height
    Rw = _resize_matrix(W, 2 * W, antialias=False)
    Rh = Rw[:2 * s + 1, :2 * s] if left else Rw[-(2 * s + 1):, -2 * s:]
    u = jnp.einsum("Ww,bmwc->bmWc", jnp.asarray(Rh), u)
    if left:
        v = jnp.concatenate([u[:, :, 1:2], u], axis=2)
    else:
        v = jnp.concatenate([u, u[:, :, -2:-1]], axis=2)
    v = jnp.pad(v, [(0, 0), (1, 1), (0, 0), (0, 0)], mode="reflect")
    dn = jax.lax.conv_dimension_numbers(v.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(v, w.astype(jnp.float32), (1, 1),
                                     "VALID", dimension_numbers=dn)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return s2d(y, 2 * s)


def _upsample_s2d_composed(x, p, act, s_in, s_out):
    """Upsample block (common.py:45-52) as ONE grid-preserving cell-space
    conv: s2d(s_in) @ G -> s2d(2*s_in) @ G, then a layout-only regrid to the
    next level's s2d(s_out). Replaces the d2s -> resize -> pad -> conv -> s2d
    excursion of _upsample_s2d (which paid ~10 ms/32 keys in relayouts,
    PERF.md round-2 ledger). Interior is the packed conv; the four border
    cell rows/cols (where resize edge renorm + reflect pad change the
    operator) are overwritten with exact plain-path strips.
    """
    w = p["conv"]["kernel"]
    bias = p["conv"].get("bias")
    g, gw = x.shape[1], x.shape[2]
    if (w.shape[0] != 3 or w.shape[1] != 3 or (2 * s_in) % s_out != 0
            or g < 4 or gw < 4):
        return _upsample_s2d(x, p, act, s_in, s_out)
    so = 2 * s_in
    wc = pack_up_conv(w, s_in).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, wc.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, wc, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn)
    if bias is not None:
        y = y + jnp.tile(bias, so * so).astype(x.dtype)
    top = _up_strip_h(x, w, bias, s_in, True).astype(y.dtype)
    bot = _up_strip_h(x, w, bias, s_in, False).astype(y.dtype)
    y = jnp.concatenate([top, y[:, 1:-1], bot], axis=1)
    lef = _up_strip_v(x, w, bias, s_in, True).astype(y.dtype)
    rig = _up_strip_v(x, w, bias, s_in, False).astype(y.dtype)
    y = jnp.concatenate([lef, y[:, :, 1:-1], rig], axis=2)
    y = _ln_s2d(y, p["norm"], so)
    y = act(y)
    return regrid_s2d(y, so, so // s_out)


def s2d_schedule(img_size: int, z_channels: int, mults) -> tuple:
    """Per-level s: smallest power of 2 with s^2 * C_level >= 64 (enough to
    kill most lane padding), capped so cell grids stay >= 8 and divisible."""
    sched = []
    size = img_size
    for i, m in enumerate(mults):
        c = z_channels * m
        s = 1
        while s * s * c < 64 and size % (2 * s) == 0 and size // (2 * s) >= 8:
            s *= 2
        sched.append(s)
        size //= 2
    return tuple(sched)


def unet_apply_s2d(params: dict, stats: dict, x: jnp.ndarray,
                   msgs: jnp.ndarray, *, nbits: int, hidden_size: int,
                   z_channels_mults, activation: str = "relu",
                   normalization: str = "batch", num_blocks: int = 8,
                   last_tanh: bool = True,
                   schedule: tuple | None = None) -> jnp.ndarray:
    """UNetMsg forward (unet.py:170-197) with per-level s2d layouts.

    Bit-exact reorganization of unet_fused.unet_apply_fused (same math,
    different operand layouts); parity-tested against it and the linen
    module in tests/test_unet_s2d.py.
    """
    from ..modules.common import get_activation
    act = get_activation(activation)
    p = params["unet"]
    st = stats.get("unet", {}) if stats else {}
    n_levels = len(z_channels_mults)
    if schedule is None:
        # infer z from the inc conv2 kernel: (3,3,z,z)
        z = p["inc"]["conv2"]["conv"]["kernel"].shape[-1]
        schedule = s2d_schedule(x.shape[-3], z, z_channels_mults)
    # sanitize: the stride-2 down conv from level i to i+1 needs
    # s[i] | 2*s[i+1] (cell stride must be a positive integer)
    sch = list(schedule)
    for i in range(n_levels - 2, -1, -1):
        sch[i] = min(sch[i], 2 * sch[i + 1])
    sch = tuple(sch)

    x = x * 2 - 1
    x = s2d(x, sch[0])
    x = _block_s2d(x, p["inc"], st.get("inc", {}), normalization, act, sch[0])
    hiddens = [x]
    levels = [sch[0]]
    for i in range(n_levels - 1):
        d = p[f"downs_{i}"]
        ds = st.get(f"downs_{i}", {})
        y = conv_s2d(hiddens[-1], d["down"]["kernel"], d["down"]["bias"],
                     conv_stride=2, s_in=sch[i], s_out=sch[i + 1])
        y = _block_s2d(y, d["conv"], ds.get("conv", {}), normalization, act,
                       sch[i + 1])
        hiddens.append(y)
        levels.append(sch[i + 1])

    # message injection (msg_processor.py:88-119): bottleneck level always
    # runs with s == 1 in practice (C >= 128); handle s > 1 via cat_s2d
    table = p["msg_processor"]["msg_embeddings"].astype(jnp.float32)
    even, odd = table[0::2], table[1::2]
    emb = jnp.sum(even, axis=0) + jnp.dot(
        msgs.astype(jnp.float32), odd - even, precision="highest")
    lat = hiddens.pop()
    s_bot = levels[-1]
    emb_map = jnp.broadcast_to(
        emb[:, None, None, :].astype(lat.dtype),
        lat.shape[:-2] + (lat.shape[-2], hidden_size))
    if s_bot > 1:
        emb_map = jnp.tile(emb_map, (1, 1, 1, s_bot * s_bot))
    y = cat_s2d(lat, emb_map, s_bot)
    hiddens.append(y)
    for j in range(num_blocks):
        y = _block_s2d(y, p[f"bottleneck_{j}"], st.get(f"bottleneck_{j}", {}),
                       normalization, act, s_bot)

    scale = 2 ** -0.5
    for i in range(n_levels - 1):
        s_cur = levels[n_levels - 1 - i]
        s_next = levels[n_levels - 2 - i]
        y = cat_s2d(y, hiddens.pop() * scale, s_cur)
        u = p[f"ups_{i}"]
        us = st.get(f"ups_{i}", {})
        y = _upsample_s2d_composed(y, u["up"], act, s_cur, s_next)
        y = _block_s2d(y, u["conv"], us.get("conv", {}), normalization, act,
                       s_next)

    y = conv_s2d(y, p["outc"]["kernel"], p["outc"]["bias"],
                 s_in=sch[0], s_out=sch[0])
    y = d2s(y, sch[0])
    return jnp.tanh(y) if last_tanh else y
