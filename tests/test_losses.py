"""Loss registry + GAN loss tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from refloader import ref_module
from videoseal_tpu.losses.perceptual import build_perceptual_loss, build_loss
from videoseal_tpu.losses.videosealloss import (VideoSealLoss, hinge_d_loss,
                                                adopt_weight)
from videoseal_tpu.losses import watson_fft


def _pair(seed=0, n=2, s=64):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, s, s, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.03, x.shape).astype(np.float32), 0, 1)
    return jnp.asarray(x), jnp.asarray(y)


class TestPerceptual:
    @pytest.mark.parametrize("name", ["none", "mse", "yuv", "ssim", "msssim",
                                      "focal", "jnd", "watson_dft"])
    def test_registry(self, name):
        x, y = _pair(s=192 if name == "msssim" else 64)
        fn = build_loss(name)
        v = float(jnp.mean(fn(x, y)))
        assert np.isfinite(v)
        if name not in ("none",):
            assert v >= 0 or name == "ssim"

    def test_combinator_string(self):
        x, y = _pair()
        fn = build_perceptual_loss("yuv+0.1_mse")
        ref = float(build_loss("yuv")(x, y) + 0.1 * build_loss("mse")(x, y))
        np.testing.assert_allclose(float(fn(x, y)), ref, rtol=1e-6)

    def test_identical_images_near_zero(self):
        x, _ = _pair()
        for name in ["mse", "yuv", "focal"]:
            assert float(build_loss(name)(x, x)) < 1e-10

    def test_differentiable(self):
        x, y = _pair()
        for name in ["yuv", "focal", "watson_dft"]:
            g = jax.grad(lambda a: jnp.mean(build_loss(name)(a, y)))(x)
            assert float(jnp.abs(g).sum()) > 0


class TestWatsonFft:
    def test_floor_on_identical(self):
        # identical inputs leave only the acos(1-eps) phase-guard floor
        # (watson_fft.py:284: the reference has the same epsilon floor)
        x, _ = _pair()
        d_same = float(watson_fft.watson_fft_distance(x, x).sum())
        _, y = _pair()
        d_diff = float(watson_fft.watson_fft_distance(y, x).sum())
        assert d_same < 0.1 * d_diff

    def test_monotone_in_noise(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        d1 = float(watson_fft.watson_fft_distance(
            jnp.clip(x + 0.01 * rng.normal(size=x.shape).astype(np.float32), 0, 1), x).sum())
        d2 = float(watson_fft.watson_fft_distance(
            jnp.clip(x + 0.1 * rng.normal(size=x.shape).astype(np.float32), 0, 1), x).sum())
        assert d1 < d2


class TestGanLoss:
    def test_hinge_matches_reference(self):
        ref = ref_module("losses.videosealloss") if False else None
        # reference formula directly (videosealloss.py:16-23)
        r = jnp.asarray([0.5, -2.0, 3.0])
        f = jnp.asarray([-0.5, 2.0, 0.0])
        ours = float(hinge_d_loss(r, f))
        expect = 0.5 * (np.mean(np.maximum(0, 1 - np.asarray(r)))
                        + np.mean(np.maximum(0, 1 + np.asarray(f))))
        np.testing.assert_allclose(ours, expect, rtol=1e-6)

    def test_adopt_weight(self):
        assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
        assert float(adopt_weight(1.0, jnp.asarray(15), threshold=10)) == 1.0

    def test_adaptive_combine(self):
        cfg = VideoSealLoss(balanced=True, total_norm=1.0)
        losses = {"percep": jnp.asarray(2.0), "decode": jnp.asarray(1.0)}
        weights = {"percep": 1.0, "decode": 1.0}
        norms = {"percep": jnp.asarray(10.0), "decode": jnp.asarray(0.1)}
        total, logs = cfg.combine(losses, weights, norms)
        # scale ∝ ratio * total_norm / grad_norm
        np.testing.assert_allclose(float(logs["scale_percep"]), 0.5 * 1.0 / 10.0, rtol=1e-4)
        np.testing.assert_allclose(float(logs["scale_decode"]), 0.5 * 1.0 / 0.1, rtol=1e-3)


class TestBaselines:
    def test_torchscript_baseline_roundtrip(self, tmp_path):
        """Wrap tiny scripted torch models behind the baseline interface."""
        from videoseal_tpu.models.baselines import build_baseline

        class Enc(torch.nn.Module):
            def forward(self, x, m):
                b = m.shape[0]
                bias = m.mean(dim=1).view(b, 1, 1, 1) * 0.02
                return x + bias

        class Dec(torch.nn.Module):
            def forward(self, x):
                v = x.mean(dim=(2, 3))  # (B, 3)
                return v.repeat(1, 16)[:, :48] - x.mean()

        ep = str(tmp_path / "enc.jit.pt")
        dp = str(tmp_path / "dec.jit.pt")
        torch.jit.script(Enc()).save(ep)
        torch.jit.script(Dec()).save(dp)
        model = build_baseline("baseline/hidden", ep, dp)
        imgs = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
        out = model.embed(imgs)
        assert out["imgs_w"].shape == imgs.shape
        preds = model.detect(out["imgs_w"])["preds"]
        assert preds.shape == (2, 49)  # 1 + 48 bits
        msg = model.extract_message(out["imgs_w"])
        assert msg.shape == (1, 48)

    def test_unknown_baseline(self):
        from videoseal_tpu.models.baselines import build_baseline
        with pytest.raises(NotImplementedError):
            build_baseline("baseline/nope", "a", "b")
        with pytest.raises(FileNotFoundError):
            build_baseline("baseline/hidden")
