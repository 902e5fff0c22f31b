"""Watson perceptual distance in block-FFT space
(parity: videoseal/losses/watson_fft.py:113-295).

Per 8x8 block real-FFT amplitudes with luminance/contrast masking and a
trainable quantization matrix; applied per channel through a color wrapper
(RGB -> YCbCr, watson_fft.py:21-60). Parameters default to the reference's
init (uniform QM, alpha 0.1, w 0.2, beta 1); the released trial weights are
external files and load via the same npz path as LPIPS.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

EPS = 1e-10


def _block_rfft2(x: jnp.ndarray, blocksize: int = 8) -> jnp.ndarray:
    """(N, H, W) -> (N, K, b, b//2+1) complex block rFFT / b^2."""
    n, h, w = x.shape
    b = blocksize
    blocks = x.reshape(n, h // b, b, w // b, b)
    blocks = jnp.moveaxis(blocks, 2, 3).reshape(n, -1, b, b)
    coeff = jnp.fft.rfft2(blocks)
    return coeff / (b * b)


def _softmax_mix(a, b, factor: float = 1.0):
    """watson_fft.py:185-188: smooth max of two tensors."""
    m = jax.nn.softmax(jnp.stack([a, b], axis=-1) * factor, axis=-1)
    return a * m[..., 0] + b * m[..., 1]


@dataclasses.dataclass
class WatsonDistanceFft:
    """Functional port; params dict mirrors the torch state_dict names."""
    blocksize: int = 8

    def init_params(self) -> dict:
        b = self.blocksize
        ws = (b, b // 2 + 1)
        w = 0.2
        return {
            "t_tild": jnp.zeros(ws),
            "alpha": jnp.asarray(0.1),
            "w_tild": jnp.log(jnp.asarray(w / (1 - w))),
            "beta": jnp.asarray(1.0),
            "w_phase_tild": jnp.zeros(ws) - 2.0,
        }

    def __call__(self, params: dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: (N, H, W) single-channel; returns per-item distance (N,)."""
        b = self.blocksize
        ws1 = b // 2 + 1
        c0 = _block_rfft2(y, b)
        c1 = _block_rfft2(x, b)
        n, k, hh, ww2 = c0.shape

        t = jnp.exp(params["t_tild"])
        w = jax.nn.sigmoid(params["w_tild"])
        beta = params["beta"]
        w_phase = jnp.exp(params["w_phase_tild"])
        # zero the non-phase (real-only) coefficients (watson_fft.py:250-255)
        mask = jnp.ones_like(w_phase)
        for (i, j) in [(0, 0), (0, ws1 - 1), (ws1 - 1, ws1 - 1), (ws1 - 1, 0)]:
            mask = mask.at[i, j].set(0.0)
        w_phase = w_phase * mask

        c0_amp = jnp.sqrt(c0.real ** 2 + c0.imag ** 2 + EPS ** 2)
        c1_amp = jnp.sqrt(c1.real ** 2 + c1.imag ** 2 + EPS ** 2)

        avg_lum = jnp.mean(c0_amp[:, :, 0, 0])
        t_l = t[None, None] * (((c0_amp[:, :, 0, 0] + EPS) / (avg_lum + EPS))
                               ** params["alpha"])[:, :, None, None]
        s = _softmax_mix(t_l, (jnp.abs(c0_amp) + EPS) ** w * t_l ** (1 - w))

        watson = (jnp.abs((c0_amp - c1_amp) / s) + EPS) ** beta
        watson = jnp.sum(watson + EPS, axis=(1, 2, 3)) ** (1 / beta)

        p0 = jnp.arctan2(c0.imag, c0.real + EPS)
        p1 = jnp.arctan2(c1.imag, c1.real + EPS)
        phase = jnp.arccos(jnp.cos(p0 - p1) * (1 - EPS * 1e3)) * w_phase
        phase = jnp.sum(phase, axis=(1, 2, 3))
        return watson + phase


# RGB -> YCbCr (watson_fft.py:21-36)
def rgb_to_ycbcr(x: jnp.ndarray) -> jnp.ndarray:
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def watson_fft_distance(x: jnp.ndarray, y: jnp.ndarray,
                        params_per_channel: list[dict] | None = None) -> jnp.ndarray:
    """Color-wrapped Watson-FFT distance of (N, H, W, 3) images in [0,1]
    (watson_fft.py ColorWrapper: per-YCbCr-channel distances, summed)."""
    dist = WatsonDistanceFft()
    if params_per_channel is None:
        params_per_channel = [dist.init_params()] * 3
    xc = rgb_to_ycbcr(x)
    yc = rgb_to_ycbcr(y)
    total = 0.0
    for c in range(3):
        total = total + dist(params_per_channel[c], xc[..., c], yc[..., c])
    return total


def watson_fft_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean Watson-FFT distance (default-init params)."""
    return jnp.mean(watson_fft_distance(x, y))
