"""Parity tests for core ops vs the PyTorch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from videoseal_tpu.ops import color, resize, metrics


def _rand_img(b, h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(b, h, w, c)).astype(np.float32)


class TestColor:
    def test_rgb_yuv_roundtrip(self):
        x = _rand_img(2, 16, 16)
        y = color.yuv_to_rgb(color.rgb_to_yuv(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(y), x, atol=2e-2)  # analog YUV is not exactly invertible

    def test_matches_reference_matrix(self):
        x = _rand_img(2, 8, 8)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        m = torch.tensor([[0.299, 0.587, 0.114],
                          [-0.14713, -0.28886, 0.436],
                          [0.615, -0.51499, -0.10001]])
        ref = torch.einsum("bchw,dc->bdhw", xt, m).permute(0, 2, 3, 1).numpy()
        ours = np.asarray(color.rgb_to_yuv(jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(color.rgb_to_y(jnp.asarray(x)))[..., 0], ref[..., 0], atol=1e-6)


class TestResize:
    @pytest.mark.parametrize("in_hw,out_hw", [
        ((256, 256), (128, 128)),   # clean downscale
        ((720, 1280), (256, 256)),  # 720p -> proc res (non-integer ratio)
        ((256, 256), (720, 1280)),  # upscale back
        ((37, 53), (256, 256)),     # odd small -> big
        ((256, 256), (37, 53)),     # big -> odd small
    ])
    def test_matches_torch_antialias(self, in_hw, out_hw):
        x = _rand_img(2, *in_hw)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(xt, size=out_hw, mode="bilinear",
                            align_corners=False, antialias=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        ours = np.asarray(resize.resize_bilinear(jnp.asarray(x), *out_hw))
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_matches_torch_no_antialias_upscale(self):
        x = _rand_img(1, 32, 32)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(xt, scale_factor=2, mode="bilinear", align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        ours = np.asarray(resize.resize_bilinear(jnp.asarray(x), 64, 64, antialias=False))
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_identity(self):
        x = _rand_img(1, 64, 64)
        out = resize.resize_bilinear(jnp.asarray(x), 64, 64)
        np.testing.assert_array_equal(np.asarray(out), x)

    def test_video_leading_dims(self):
        x = _rand_img(1, 64, 64).reshape(1, 1, 64, 64, 3).repeat(4, axis=1)
        out = resize.resize_bilinear(jnp.asarray(x), 32, 32)
        assert out.shape == (1, 4, 32, 32, 3)


class TestMetrics:
    def test_psnr(self):
        x, y = _rand_img(3, 32, 32, seed=1), _rand_img(3, 32, 32, seed=2)
        ours = np.asarray(metrics.psnr(jnp.asarray(x), jnp.asarray(y)))
        delta = 255 * (x - y)
        ref = 20 * np.log10(255) - 10 * np.log10((delta**2).mean(axis=(1, 2, 3)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4)
        vid = np.asarray(metrics.psnr(jnp.asarray(x), jnp.asarray(y), is_video=True))
        ref_v = 20 * np.log10(255) - 10 * np.log10((delta**2).mean())
        np.testing.assert_allclose(vid, ref_v, rtol=1e-4)

    def test_ssim_vs_reference_impl(self):
        ssim_ref = __import__("refloader", fromlist=["ref_module"]).ref_module("losses.ssim")
        x, y = _rand_img(2, 64, 64, seed=3), _rand_img(2, 64, 64, seed=4)
        y = 0.9 * x + 0.1 * y  # correlated pair, realistic SSIM range
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.from_numpy(y).permute(0, 3, 1, 2)
        ref = ssim_ref.ssim(xt, yt, data_range=1.0, size_average=False).numpy()
        ours = np.asarray(metrics.ssim(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_msssim_vs_reference_impl(self):
        ssim_ref = __import__("refloader", fromlist=["ref_module"]).ref_module("losses.ssim")
        x, y = _rand_img(2, 180, 180, seed=5), _rand_img(2, 180, 180, seed=6)
        y = 0.95 * x + 0.05 * y
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        yt = torch.from_numpy(y).permute(0, 3, 1, 2)
        ref = ssim_ref.ms_ssim(xt, yt, data_range=1.0, size_average=False).numpy()
        ours = np.asarray(metrics.ms_ssim(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_bit_accuracy_whole_image(self):
        preds = jnp.asarray([[1.0, -1.0, 2.0, -2.0]])
        targets = jnp.asarray([[1, 1, 1, 0]])
        acc = np.asarray(metrics.bit_accuracy(preds, targets))
        np.testing.assert_allclose(acc, [0.75])

    def test_bit_accuracy_pixelwise_masked(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
        targets = (rng.uniform(size=(2, 16)) > 0.5).astype(np.float32)
        mask = np.ones((2, 8, 8, 1), np.float32)
        a1 = np.asarray(metrics.bit_accuracy(jnp.asarray(logits), jnp.asarray(targets)))
        a2 = np.asarray(metrics.bit_accuracy(jnp.asarray(logits), jnp.asarray(targets),
                                             mask=jnp.asarray(mask)))
        np.testing.assert_allclose(a1, a2)

    def test_pvalue_and_capacity(self):
        pv = metrics.pvalue(np.asarray([1.0, 0.5]), 256)
        assert pv[0] < 1e-60 and 0.4 < pv[1] <= 0.6
        cap = np.asarray(metrics.capacity(jnp.asarray([1.0, 0.5]), 256))
        np.testing.assert_allclose(cap, [256.0, 0.0], atol=1e-4)

    def test_iou_accuracy(self):
        preds = jnp.ones((1, 4, 4, 1))
        targets = jnp.concatenate([jnp.ones((1, 4, 2, 1)), jnp.zeros((1, 4, 2, 1))], axis=2)
        np.testing.assert_allclose(np.asarray(metrics.iou(preds, targets)), [0.5])
        np.testing.assert_allclose(np.asarray(metrics.accuracy(preds, targets)), [0.5])
