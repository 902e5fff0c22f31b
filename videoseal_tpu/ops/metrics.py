"""Quality / robustness metrics (JAX, NHWC).

Feature-parity with videoseal/evals/metrics.py:22-289. All metrics take
images shaped (..., H, W, C) in [0, 1] and message predictions shaped either
(B, K) (whole-image logits) or (B, H, W, K) (pixelwise logits). Everything is
jittable; the binomial p-value is the one host-side exception (scipy), matching
the reference which also computes it on host (metrics.py:104-121).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# image quality
# ---------------------------------------------------------------------------

def psnr(x: jnp.ndarray, y: jnp.ndarray, is_video: bool = False) -> jnp.ndarray:
    """PSNR in dB over [0,1] images; video mode averages MSE over all frames.

    Mirrors metrics.py:22-36 (computed on 255-scaled deltas).
    """
    delta = 255.0 * (x.astype(jnp.float32) - y.astype(jnp.float32))
    delta = delta.reshape((-1,) + x.shape[-3:])  # (B, H, W, C)
    peak = 20 * math.log10(255.0)
    axes = (0, 1, 2, 3) if is_video else (1, 2, 3)
    noise = jnp.mean(delta**2, axis=axes)
    return peak - 10 * jnp.log10(noise)


def linf(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """L_inf in 0-255 pixel space (metrics.py:56-64)."""
    return jnp.max(jnp.abs(x - y)) * (255.0 / data_range)


def _fspecial_gauss_1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian blur of (B, H, W, C); matches the
    reference's pytorch_msssim copy (losses/ssim.py gaussian_filter)."""
    k = win.shape[0]
    # depthwise valid conv along H then W via conv_general_dilated
    c = x.shape[-1]
    kern_h = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kern_w = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, kern_h, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    y = jax.lax.conv_general_dilated(y, kern_w, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    return y


def _ssim_components(x, y, data_range=1.0, win_size=11, win_sigma=1.5, k1=0.01, k2=0.03):
    win = jnp.asarray(_fspecial_gauss_1d(win_size, win_sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # per-channel means (losses/ssim.py:106-108): ms-ssim multiplies levels
    # per channel before averaging over channels
    return ssim_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-image SSIM, matching pytorch_msssim.ssim / losses/ssim.py:110-166."""
    s, _ = _ssim_components(x.astype(jnp.float32), y.astype(jnp.float32), data_range)
    return s.mean(axis=-1)


def _avg_pool2_torch(x: jnp.ndarray) -> jnp.ndarray:
    """torch F.avg_pool2d(x, 2, padding=shape%2): symmetric zero pad on BOTH
    sides, zeros included in the mean (count_include_pad=True)."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Multi-scale SSIM, matching pytorch_msssim.ms_ssim (losses/ssim.py:169-248)."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], dtype=jnp.float32)
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = weights.shape[0]
    mcs = []
    for i in range(levels):
        s, cs = _ssim_components(x, y, data_range)  # (B, C) each
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2_torch(x)
            y = _avg_pool2_torch(y)
    s = jax.nn.relu(s)
    mcs_and_ssim = jnp.stack(mcs + [s], axis=0)  # (levels, B, C)
    val = jnp.prod(mcs_and_ssim ** weights[:, None, None], axis=0)  # (B, C)
    return val.mean(axis=-1)


# ---------------------------------------------------------------------------
# detection / decoding
# ---------------------------------------------------------------------------

def iou(preds: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.0,
        label: int = 1) -> jnp.ndarray:
    """IoU of (B, H, W, 1) mask logits vs targets (metrics.py:66-85)."""
    p = preds > threshold
    t = targets > 0.5
    if label == 0:
        p, t = ~p, ~t
    inter = jnp.sum(p & t, axis=(1, 2, 3)).astype(jnp.float32)
    union = jnp.sum(p | t, axis=(1, 2, 3)).astype(jnp.float32)
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))


def accuracy(preds: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Pixel accuracy of (B, H, W, 1) mask logits (metrics.py:87-102)."""
    p = preds > threshold
    t = targets > 0.5
    return jnp.mean((p == t).astype(jnp.float32), axis=(1, 2, 3))


def bit_accuracy(preds: jnp.ndarray, targets: jnp.ndarray,
                 mask: jnp.ndarray | None = None, threshold: float = 0.0) -> jnp.ndarray:
    """Fraction of correctly decoded bits per item (metrics.py:150-178).

    preds: (B, K) logits or (B, H, W, K) pixelwise logits;
    targets: (B, K) bits; mask: optional (B, H, W, 1) for the pixelwise case.
    """
    p = preds > threshold
    empty = None
    if p.ndim == 4:
        if mask is not None:
            # reference casts the mask with .bool() — ANY nonzero pixel is
            # selected (metrics.py:169), not a 0.5 threshold; this matters
            # when a downscaled binary mask leaves fractional edge values
            m = (mask > 0).astype(jnp.float32)
            num = jnp.sum(p.astype(jnp.float32) * m, axis=(1, 2))
            den = jnp.sum(m, axis=(1, 2))
            p = (num / jnp.maximum(den, 1e-8)) > 0.5
            # an aug can wipe the whole masked region (e.g. crop): the
            # reference's masked_select path then yields NaN, which its
            # nanmean excludes (metrics.py:150-178) — mirror that instead of
            # silently logging ~0.5
            empty = jnp.sum(m, axis=(1, 2, 3)) == 0
        else:
            p = jnp.mean(p.astype(jnp.float32), axis=(1, 2)) > 0.5
    t = targets > 0.5
    acc = jnp.mean((p == t).astype(jnp.float32), axis=-1)
    if empty is not None:
        acc = jnp.where(empty, jnp.nan, acc)
    return acc


def bit_accuracy_1msg(preds: jnp.ndarray, targets: jnp.ndarray,
                      masks: jnp.ndarray | None = None,
                      threshold: float = 0.0) -> jnp.ndarray:
    """Per-pixel bit accuracy averaged over pixels (metrics.py:180-206).

    preds: (B, H, W, K) pixelwise logits; targets: (B, K).
    """
    p = preds > threshold
    t = (targets > 0.5)[:, None, None, :]
    correct = (p == t).astype(jnp.float32)  # (B, H, W, K)
    if masks is not None:
        m = (masks > 0.5).astype(jnp.float32)
        num = jnp.sum(correct * m, axis=(1, 2, 3))
        den = jnp.maximum(jnp.sum(m, axis=(1, 2, 3)) * preds.shape[-1]
                          / masks.shape[-1], 1e-8)
        return num / den
    return correct.mean(axis=(1, 2, 3))


def bit_accuracy_inference(preds: jnp.ndarray, targets: jnp.ndarray,
                           masks: jnp.ndarray, method: str = "hard",
                           threshold: float = 0.0) -> jnp.ndarray:
    """Aggregate pixels -> message -> accuracy (metrics.py:208-257).

    hard: binarize per pixel then mask-average; semihard: mask-average raw
    logits; soft: mask-weighted average of raw logits.
    """
    m = masks if method == "soft" else (masks > 0.5).astype(preds.dtype)
    x = (preds > threshold).astype(preds.dtype) if method == "hard" else preds
    num = jnp.sum(x * m, axis=(1, 2))
    den = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1e-8)
    msg = (num / den) > 0.5
    t = targets > 0.5
    return jnp.mean((msg == t).astype(jnp.float32), axis=-1)


def bit_accuracy_mv(preds: jnp.ndarray, targets: jnp.ndarray,
                    masks: jnp.ndarray | None = None,
                    threshold: float = 0.0) -> jnp.ndarray:
    """Majority vote over pixels per bit (metrics.py:259-289)."""
    p = (preds > threshold).astype(jnp.float32)
    if masks is not None:
        m = (masks > 0.5).astype(jnp.float32)
        frac = (jnp.sum(p * m, axis=(1, 2))
                / jnp.maximum(jnp.sum(m, axis=(1, 2)), 1e-8))
    else:
        frac = p.mean(axis=(1, 2))
    majority = frac > 0.5
    t = targets > 0.5
    return jnp.mean((majority == t).astype(jnp.float32), axis=-1)


def bd_rate(r1, psnr1, r2, psnr2, piecewise: int = 0) -> float:
    """Bjontegaard delta rate (metrics.py:405-440)."""
    from scipy import interpolate
    lr1, lr2 = np.log(r1), np.log(r2)
    p1 = np.polyfit(psnr1, lr1, 3)
    p2 = np.polyfit(psnr2, lr2, 3)
    min_int = max(min(psnr1), min(psnr2))
    max_int = min(max(psnr1), max(psnr2))
    if piecewise == 0:
        pi1, pi2 = np.polyint(p1), np.polyint(p2)
        int1 = np.polyval(pi1, max_int) - np.polyval(pi1, min_int)
        int2 = np.polyval(pi2, max_int) - np.polyval(pi2, min_int)
    else:
        samples, interval = np.linspace(min_int, max_int, num=100, retstep=True)
        psnr1, psnr2 = np.asarray(psnr1), np.asarray(psnr2)
        v1 = interpolate.pchip_interpolate(np.sort(psnr1),
                                           lr1[np.argsort(psnr1)], samples)
        v2 = interpolate.pchip_interpolate(np.sort(psnr2),
                                           lr2[np.argsort(psnr2)], samples)
        trapz = getattr(np, "trapezoid", getattr(np, "trapz", None))
        int1 = trapz(v1, dx=interval)
        int2 = trapz(v2, dx=interval)
    avg_exp_diff = (int2 - int1) / (max_int - min_int)
    return float((np.exp(avg_exp_diff) - 1) * 100)


def pvalue(bit_accs: np.ndarray, nbits: int) -> np.ndarray:
    """Binomial test p-value, host-side (metrics.py:104-121)."""
    from scipy import stats
    accs = np.atleast_1d(np.asarray(bit_accs))
    return np.array([
        stats.binomtest(int(round(float(a) * nbits)), nbits, 0.5, alternative="greater").pvalue
        for a in accs
    ])


def capacity(bit_accs: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Binary-symmetric-channel capacity in bits (metrics.py:123-148)."""
    p = jnp.clip(bit_accs, 0.0, 1.0)

    def plogp(q):
        return jnp.where(q > 0, q * jnp.log2(jnp.maximum(q, 1e-30)), 0.0)

    entropy = -plogp(p) - plogp(1 - p)
    return nbits * (1 - entropy)
