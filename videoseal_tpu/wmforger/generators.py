"""Artificial FFT watermark generators
(parity: wmforger/wmforger/modules/watermark_generators.py:139-263).

Synthesize sparse/structured Fourier-domain patterns, blend them into images
either JND-attenuated or plain-alpha, and quantize to 8-bit. Spectrum
synthesis is host-side numpy (matches the reference's numpy implementation);
the JND blend runs in JAX.
"""

from __future__ import annotations

import math
import random

import numpy as np

from ..modules.jnd import JND
from ..ops.resize import resize_bilinear


class FFTWatermarkBase:
    def __init__(self, alpha_base, alpha_rand, jnd_alpha_base, jnd_alpha_rand):
        self.jnd = JND(in_channels=1, out_channels=3)
        self.alpha_base = alpha_base
        self.alpha_rand = alpha_rand
        self.jnd_alpha_base = jnd_alpha_base
        self.jnd_alpha_rand = jnd_alpha_rand

    def generate_random_watermark_fft(self) -> np.ndarray:
        raise NotImplementedError

    def _watermark_image(self, h: int, w: int) -> np.ndarray:
        """(H, W, 3) watermark pattern: 'white' (shared) or per-channel RGB."""
        import jax.numpy as jnp
        if random.random() < 0.5:
            wm = self.generate_random_watermark_fft()[..., None]
            wm = np.repeat(wm, 3, axis=-1)
        else:
            wm = np.stack([self.generate_random_watermark_fft() for _ in range(3)],
                          axis=-1)
        if wm.shape[:2] != (h, w):
            wm = np.asarray(resize_bilinear(jnp.asarray(wm), h, w, antialias=False))
        return wm

    def embed(self, imgs: np.ndarray) -> dict:
        """imgs: (N, H, W, 3) in [0,1] -> 8-bit-quantized watermarked images."""
        import jax.numpy as jnp
        out = []
        for img in np.asarray(imgs):
            h, w = img.shape[:2]
            wm = self._watermark_image(h, w)
            if random.random() < 0.5:  # JND-attenuated
                alpha = random.random() * self.jnd_alpha_rand + self.jnd_alpha_base
                img_w = np.clip(img + alpha * wm, 0, 1)
                img_w = np.asarray(self.jnd(jnp.asarray(img)[None],
                                            jnp.asarray(img_w)[None])[0])
            else:  # watermark everywhere
                alpha = random.random() * self.alpha_rand + self.alpha_base
                img_w = np.clip(img + alpha * wm, 0, 1)
            out.append(img_w)
        out = np.stack(out)
        return {"imgs_w": np.round(out * 255.0) / 255.0}


class FFTWatermarkWaves(FFTWatermarkBase):
    """Sparse Fourier peaks -> wave interference patterns (generators.py:178-208)."""

    def __init__(self):
        super().__init__(alpha_base=0.05, alpha_rand=0,
                         jnd_alpha_base=0.5, jnd_alpha_rand=1.5)

    @staticmethod
    def generate_random_watermark_fft() -> np.ndarray:
        h = w = 512
        fwm = np.zeros((h, w), dtype=np.complex128)
        getv = lambda: random.randint(1_000_000, 10_000_000)
        max_ = random.randint(60, 200)

        def getr(m):
            radius = math.pow(random.randint(0, m), 0.8)
            angle = random.random() * math.pi / 2
            return round(math.sin(angle) * radius), round(math.cos(angle) * radius)

        for _ in range(random.randint(2, 50)):
            a, b = getr(max_)
            fwm[h // 2 - a, w // 2 - b] = getv() + getv() * 1j
        wm = np.real(np.fft.ifft2(np.fft.ifftshift(fwm))) / 5
        return np.float32(wm.clip(-255, 255) / 255)


class FFTWatermarkGaussian(FFTWatermarkBase):
    """Shaped random noise spectrum (generators.py:210-232)."""

    def __init__(self):
        super().__init__(alpha_base=0.05, alpha_rand=0,
                         jnd_alpha_base=1, jnd_alpha_rand=2)

    @staticmethod
    def generate_random_watermark_fft() -> np.ndarray:
        h = w = 512
        xc, yc = np.meshgrid(np.arange(h), np.arange(w))
        coords = np.stack([xc - w / 2, yc - h / 2], 2).reshape(-1, 2)
        power = 4 - math.sqrt(random.random()) * 3
        sigma = random.random() * 30 + 20
        quad = (np.abs(coords / sigma) ** power).sum(1) ** (1 / power)
        pd = np.exp(-quad / 2)
        fwm = np.zeros((h, w), dtype=np.complex128)
        fwm[yc.reshape(-1), xc.reshape(-1)] = (
            np.random.random(h * w) * pd / pd.max() * 1_000_000j)
        wm = np.real(np.fft.ifft2(np.fft.ifftshift(fwm))) / 5
        return np.float32(wm.clip(-255, 255) / 255)


class FFTWatermarkLines(FFTWatermarkBase):
    """Horizontal/vertical Fourier lines (generators.py:235-263)."""

    def __init__(self):
        super().__init__(alpha_base=0.1, alpha_rand=0.15,
                         jnd_alpha_base=4, jnd_alpha_rand=4)

    @staticmethod
    def generate_random_watermark_fft() -> np.ndarray:
        def gauss(x, mu, sigma):
            return np.exp(-((x - mu) / sigma) ** 2 / 2) / (sigma * np.sqrt(2 * np.pi))

        h = w = 512
        fwm = np.zeros((h, w), dtype=np.complex128)
        sigma = random.random() * 35 + 5
        s1 = random.random() * 30 + 20
        s2 = random.random() * 30 + 20
        for c in np.round(np.abs(np.random.randn(random.randint(3, 10))) * sigma
                          ).astype(np.int32):
            fwm[h // 2 - c] = fwm[h // 2 + c] = (
                (1.5 + np.random.random(w)) * gauss(c, 0, s1))
        for c in np.round(np.abs(np.random.randn(random.randint(3, 10))) * sigma
                          ).astype(np.int32):
            fwm[:, w // 2 - c] = fwm[:, w // 2 + c] = (
                (1.5 + np.random.random(h)) * gauss(c, 0, s2))
        fwm = fwm / fwm.max() * 1_000_000j
        wm = np.real(np.fft.ifft2(np.fft.ifftshift(fwm))) / 5
        return np.float32(wm.clip(-255, 255) / 255)


_GENERATORS = {
    "waves": FFTWatermarkWaves,
    "gaussian": FFTWatermarkGaussian,
    "lines": FFTWatermarkLines,
}


def build_generator(name: str) -> FFTWatermarkBase:
    """Per-rank generator choice (wmforger/train.py:173-187 analog)."""
    if name == "random":
        name = random.choice(list(_GENERATORS))
    return _GENERATORS[name]()
