"""Spread-spectrum audio watermarking for the AV pipeline.

The reference watermarks the audio track with AudioSeal
(reference inference_av.py:83-108), an external learned model family.
This module provides a self-contained classical alternative so
`inference_av --audio_wm 1` produces a watermarked audio track out of the
box: band-limited direct-sequence spread spectrum — each message bit
modulates a keyed pseudo-noise chip sequence added at a fixed SNR below
the local signal level; detection is a matched-filter correlation.

Honest scope vs AudioSeal: robust to volume changes, additive noise,
clipping and moderate lossy re-encoding (the PN energy sits in a mid band
AAC/Opus preserve); NOT robust to time-shifting/resampling (no sync
search — AudioSeal's learned detector is). A learned model can be plugged
in through the same `audio_processor` hook.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np


class SpreadSpectrumAudio:
    """Direct-sequence spread-spectrum watermark on PCM audio.

    nbits message bits; each bit occupies every nbits-th frame of
    `chip_seconds` so arbitrary-length audio accumulates correlation for
    all bits. The PN sequence is keyed and band-passed to (band_lo,
    band_hi) Hz."""

    def __init__(self, nbits: int = 16, key: int = 0,
                 chip_seconds: float = 0.05, snr_db: float = 30.0,
                 band=(1000.0, 8000.0)):
        self.nbits = nbits
        self.key = key
        self.chip_seconds = chip_seconds
        self.snr_db = snr_db
        self.band = band

    # -- internals ---------------------------------------------------------
    def _frame_len(self, sr: int) -> int:
        return max(int(round(self.chip_seconds * sr)), 64)

    def _pn(self, sr: int) -> np.ndarray:
        """(nbits, L) band-limited unit-RMS chip sequences (one per bit
        position; reused cyclically along time)."""
        L = self._frame_len(sr)
        rng = np.random.default_rng(self.key)
        pn = rng.choice(np.float64([-1.0, 1.0]), size=(self.nbits, L))
        f = np.fft.rfftfreq(L, 1.0 / sr)
        keep = (f >= self.band[0]) & (f <= min(self.band[1], sr / 2 * 0.95))
        if keep.any():
            spec = np.fft.rfft(pn, axis=-1)
            spec[:, ~keep] = 0.0
            pn = np.fft.irfft(spec, n=L, axis=-1)
        pn /= np.sqrt(np.mean(pn * pn, axis=-1, keepdims=True)) + 1e-12
        return pn.astype(np.float32)

    def _frames(self, t: int, sr: int) -> int:
        return t // self._frame_len(sr)

    # -- API ---------------------------------------------------------------
    def get_random_msg(self, rng=None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        return rng.integers(0, 2, (self.nbits,)).astype(np.int32)

    def embed(self, audio: np.ndarray, sr: int, msg: np.ndarray) -> np.ndarray:
        """audio: (T,) or (C, T) float in [-1, 1]; msg: (nbits,) 0/1.
        Returns watermarked audio, same shape/dtype family (float32)."""
        msg = np.asarray(msg).reshape(-1)
        assert msg.shape == (self.nbits,), msg.shape
        squeeze = audio.ndim == 1
        x = np.atleast_2d(np.asarray(audio, np.float32)).copy()
        L = self._frame_len(sr)
        n = self._frames(x.shape[-1], sr)
        if n == 0:
            return x[0] if squeeze else x
        pn = self._pn(sr)
        sgn = (2.0 * msg - 1.0).astype(np.float32)
        gain = 10.0 ** (-self.snr_db / 20.0)
        head = x[:, :n * L].reshape(x.shape[0], n, L)
        rms = np.sqrt(np.mean(head * head, axis=-1, keepdims=True))
        rms = np.maximum(rms, 1e-3)          # floor: stay detectable in silence
        bit_idx = np.arange(n) % self.nbits
        w = pn[bit_idx] * sgn[bit_idx, None]            # (n, L)
        head += gain * rms * w[None]
        out = x.reshape(audio.shape if not squeeze else (1, -1))
        out = np.clip(out, -1.0, 1.0)
        return out[0] if squeeze else out

    def detect(self, audio: np.ndarray, sr: int):
        """Returns (bits (nbits,) int32, confidence (nbits,) float32).

        Confidence is the normalized matched-filter statistic per bit
        (|corr| / frame RMS energy): ~1.5-2 on watermarked audio at the
        default SNR vs ~0.1-0.3 incidental correlation on clean audio."""
        x = np.atleast_2d(np.asarray(audio, np.float32))
        L = self._frame_len(sr)
        n = self._frames(x.shape[-1], sr)
        bits = np.zeros(self.nbits, np.int32)
        conf = np.zeros(self.nbits, np.float32)
        if n == 0:
            return bits, conf
        pn = self._pn(sr)
        head = x[:, :n * L].reshape(x.shape[0], n, L).mean(axis=0)  # (n, L)
        bit_idx = np.arange(n) % self.nbits
        corr = np.einsum("nl,nl->n", head, pn[bit_idx]) / L
        norm = np.sqrt(np.mean(head * head, axis=-1)) + 1e-12
        for b in range(self.nbits):
            sel = bit_idx == b
            if sel.any():
                c = np.sum(corr[sel]) / np.sum(norm[sel]) * np.sqrt(L)
                bits[b] = int(c > 0)
                conf[b] = abs(c)
        return bits, conf


def _ffmpeg() -> str | None:
    return shutil.which("ffmpeg")


def watermark_audio_file(input_path: str, msg: np.ndarray,
                         wm: SpreadSpectrumAudio | None = None,
                         sr: int = 48000) -> str | None:
    """Extract the audio track of `input_path`, watermark it, and return a
    path to a wav file carrying the watermarked track (None when the input
    has no audio or ffmpeg is unavailable). Shape of the reference's
    AudioSeal step in inference_av.py:83-108, as an `audio_processor`."""
    ff = _ffmpeg()
    if ff is None:
        return None
    wm = wm or SpreadSpectrumAudio(nbits=len(np.asarray(msg).reshape(-1)))
    raw = subprocess.run(
        [ff, "-v", "error", "-i", input_path, "-map", "a:0?", "-ac", "2",
         "-ar", str(sr), "-f", "f32le", "-"],
        capture_output=True)
    if raw.returncode != 0 or not raw.stdout:
        return None
    pcm = np.frombuffer(raw.stdout, np.float32).reshape(-1, 2).T
    out = wm.embed(pcm, sr, msg)
    inter = np.ascontiguousarray(out.T, np.float32)
    path = tempfile.mktemp(suffix=".wav")
    enc = subprocess.run(
        [ff, "-v", "error", "-f", "f32le", "-ac", "2", "-ar", str(sr),
         "-i", "-", "-c:a", "pcm_s16le", path],
        input=inter.tobytes(), capture_output=True)
    if enc.returncode != 0:
        if os.path.exists(path):
            os.remove(path)
        return None
    return path


def make_audio_processor(msg: np.ndarray,
                         wm: SpreadSpectrumAudio | None = None):
    """`audio_processor` factory for inference_av.embed_av: falls back to
    passing the original file through when extraction/ffmpeg fails."""
    def processor(input_path: str) -> str:
        out = watermark_audio_file(input_path, msg, wm)
        return out if out is not None else input_path
    return processor
