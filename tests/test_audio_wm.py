"""Spread-spectrum audio watermark: roundtrip + robustness
(the built-in audio_processor for inference_av; reference analogue:
AudioSeal in inference_av.py:83-108)."""

import numpy as np
import pytest

from videoseal_tpu.audio_wm import SpreadSpectrumAudio


def _tone_music(sr, seconds, seed=0):
    """Synthetic 'music': a few tones + pink-ish noise, stereo."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = sum(a * np.sin(2 * np.pi * f * t)
            for a, f in [(0.3, 220.0), (0.2, 440.0), (0.15, 3000.0)])
    noise = rng.normal(0, 0.05, t.shape)
    x = (x + np.cumsum(noise) * 0.01 + noise).astype(np.float32)
    x /= np.abs(x).max() * 1.2
    return np.stack([x, np.roll(x, 7)])


class TestSpreadSpectrum:
    def setup_method(self):
        self.sr = 48000
        self.wm = SpreadSpectrumAudio(nbits=16, key=3)
        self.msg = self.wm.get_random_msg(np.random.default_rng(1))
        self.audio = _tone_music(self.sr, 4.0)

    def test_roundtrip_exact(self):
        out = self.wm.embed(self.audio, self.sr, self.msg)
        bits, conf = self.wm.detect(out, self.sr)
        np.testing.assert_array_equal(bits, self.msg)
        assert conf.min() > 0.1

    def test_inaudibility_budget(self):
        out = self.wm.embed(self.audio, self.sr, self.msg)
        err = out - self.audio
        snr = 10 * np.log10(np.mean(self.audio ** 2) / np.mean(err ** 2))
        assert snr > 25.0, snr                 # ~snr_db minus clipping loss

    def test_volume_and_noise_robust(self):
        out = self.wm.embed(self.audio, self.sr, self.msg)
        rng = np.random.default_rng(2)
        attacked = 0.25 * out + rng.normal(0, 0.005, out.shape).astype(np.float32)
        bits, _ = self.wm.detect(attacked, self.sr)
        np.testing.assert_array_equal(bits, self.msg)

    def test_clipping_robust(self):
        out = self.wm.embed(2.0 * self.audio, self.sr, self.msg)
        bits, _ = self.wm.detect(np.clip(out, -0.5, 0.5), self.sr)
        np.testing.assert_array_equal(bits, self.msg)

    def test_mono_and_short(self):
        mono = self.audio[0]
        out = self.wm.embed(mono, self.sr, self.msg)
        assert out.shape == mono.shape
        bits, _ = self.wm.detect(out, self.sr)
        np.testing.assert_array_equal(bits, self.msg)
        # shorter than one frame: no crash, zero frames
        tiny = mono[:100]
        bits, conf = self.wm.detect(self.wm.embed(tiny, self.sr, self.msg),
                                    self.sr)
        assert conf.max() == 0.0

    def test_wrong_key_is_chance(self):
        out = self.wm.embed(self.audio, self.sr, self.msg)
        other = SpreadSpectrumAudio(nbits=16, key=99)
        bits, conf = other.detect(out, self.sr)
        assert (bits == self.msg).mean() < 0.9
        assert conf.mean() < 0.5               # vs ~1.7 with the right key

    def test_unwatermarked_low_confidence(self):
        _, conf = self.wm.detect(self.audio, self.sr)
        out = self.wm.embed(self.audio, self.sr, self.msg)
        _, conf_w = self.wm.detect(out, self.sr)
        # tonal content correlates ~0.1-0.3 with any PN; watermarked sits
        # an order of magnitude above — the decision margin is the ratio
        assert conf.mean() < 0.5
        assert conf_w.min() > 3 * conf.max()

    def test_time_shift_breaks_sync_documented_limitation(self):
        """Negative test pinning the documented limitation (audio_wm.py
        docstring): the detector has NO sync search, so a time shift that
        misaligns the frame grid de-correlates the PN sequences and decoding
        degrades toward chance. If this test ever fails because shifted
        decoding works, the limitation doc must be updated."""
        out = self.wm.embed(self.audio, self.sr, self.msg)
        shift = self.wm._frame_len(self.sr) // 2       # half-frame misalign
        shifted = out[:, shift:]
        bits, conf = self.wm.detect(shifted, self.sr)
        acc = float((bits == self.msg).mean())
        assert acc < 0.9, (
            "time-shifted decode unexpectedly works; update the no-sync "
            f"limitation note (acc={acc})")
