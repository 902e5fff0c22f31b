"""Pixelwise bit-accuracy variants + BD-rate (metrics.py:180-289,405-440 parity)."""

import numpy as np

import jax.numpy as jnp

from videoseal_tpu.ops import metrics as M


def _setup():
    rng = np.random.default_rng(0)
    targets = (rng.uniform(size=(2, 8)) > 0.5).astype(np.float32)
    # logits agreeing with targets on 75% of pixels; magnitude 2 keeps the
    # semihard/soft averaged-logit decision off the 0.5 boundary
    logits = np.where(targets[:, None, None, :] > 0.5, 2.0, -2.0)
    flip = rng.uniform(size=(2, 4, 4, 8)) < 0.25
    logits = np.where(flip, -logits * np.ones((2, 4, 4, 8)), logits)
    return jnp.asarray(logits.astype(np.float32)), jnp.asarray(targets), flip


class TestVariants:
    def test_1msg_equals_pixel_agreement(self):
        logits, targets, flip = _setup()
        acc = np.asarray(M.bit_accuracy_1msg(logits, targets))
        expect = 1 - flip.reshape(2, -1).mean(axis=1)
        np.testing.assert_allclose(acc, expect, atol=1e-6)

    def test_1msg_full_mask_matches_unmasked(self):
        logits, targets, _ = _setup()
        mask = jnp.ones((2, 4, 4, 1))
        np.testing.assert_allclose(
            np.asarray(M.bit_accuracy_1msg(logits, targets, mask)),
            np.asarray(M.bit_accuracy_1msg(logits, targets)), atol=1e-6)

    def test_inference_methods_agree_on_full_mask(self):
        logits, targets, _ = _setup()
        mask = jnp.ones((2, 4, 4, 1))
        hard = np.asarray(M.bit_accuracy_inference(logits, targets, mask, "hard"))
        semi = np.asarray(M.bit_accuracy_inference(logits, targets, mask, "semihard"))
        soft = np.asarray(M.bit_accuracy_inference(logits, targets, mask, "soft"))
        # 75% pixel agreement -> hard (binarize-then-average) decodes all bits
        np.testing.assert_allclose(hard, 1.0)
        # semihard/soft threshold raw averaged LOGITS at 0.5 (reference quirk,
        # metrics.py:237-253) -> replicate in numpy; on a full mask they agree
        ln = np.asarray(logits)
        msg = ln.mean(axis=(1, 2)) > 0.5
        expect = (msg == (np.asarray(targets) > 0.5)).mean(axis=-1)
        np.testing.assert_allclose(semi, expect, atol=1e-6)
        np.testing.assert_allclose(soft, expect, atol=1e-6)

    def test_majority_vote(self):
        logits, targets, _ = _setup()
        acc = np.asarray(M.bit_accuracy_mv(logits, targets))
        np.testing.assert_allclose(acc, 1.0)

    def test_bd_rate_zero_for_identical_curves(self):
        r = [1000, 2000, 4000, 8000]
        p = [30, 33, 36, 39]
        assert abs(M.bd_rate(r, p, r, p)) < 1e-9
        # 2x the rate at same quality -> +100%
        assert abs(M.bd_rate(r, p, [2 * x for x in r], p) - 100.0) < 1.0


class TestVmaf:
    def test_graceful_unavailable(self, monkeypatch):
        """No libvmaf ffmpeg in this image: scoring returns None, never raises."""
        from videoseal_tpu.evals import vmaf
        vmaf.find_ffmpeg.cache_clear()
        monkeypatch.setenv("VSM_FFMPEG", "/nonexistent/ffmpeg")
        monkeypatch.setenv("PATH", "/nonexistent")
        assert vmaf.find_ffmpeg() is None
        assert not vmaf.vmaf_available()
        assert vmaf.vmaf_on_file("a.mp4", "b.mp4") is None
        vmaf.find_ffmpeg.cache_clear()

    def test_on_tensor_aux(self):
        """With no scorer available the aux stats still come back (sizes,
        durations, bitrates) — None score, real aux."""
        import numpy as np
        from videoseal_tpu.evals import vmaf
        from videoseal_tpu import native
        if not native.available():
            import pytest
            pytest.skip("native media runtime unavailable")
        if vmaf.vmaf_available():
            import pytest
            pytest.skip("libvmaf present; covered by scoring path")
        rng = np.random.default_rng(0)
        frames = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
        score, aux = vmaf.vmaf_on_tensor(frames, frames * 0.97,
                                         return_aux=True)
        assert score is None
        assert aux["filesize1"] > 0 and aux["filesize2"] > 0
        assert abs(aux["duration1"] - 8 / 24) < 1e-6
