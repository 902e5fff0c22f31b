"""Augmentation stack tests: shape preservation, differentiability,
semantic sanity, and jit-ability of the Augmenter switch."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from videoseal_tpu.augmentation import augs as A
from videoseal_tpu.augmentation.augmenter import build_augmenter, get_dummy_augmenter
from videoseal_tpu.ops.jpeg import jpeg_roundtrip
from videoseal_tpu.ops import warp as W


def _img(b=2, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))


def _mask(b=2, h=32, w=32):
    return jnp.ones((b, h, w, 1), jnp.float32)


ALL_AUGS = [
    A.Identity(), A.Rotate(do90=True), A.Resize(), A.Crop(), A.Perspective(),
    A.HorizontalFlip(), A.JPEG(), A.GaussianBlur(3, 7), A.MedianFilter(),
    A.Brightness(), A.Contrast(), A.Saturation(), A.Hue(), A.GaussianNoise(),
    A.Grayscale(), A.VideoCompressionProxy(),
]


class TestAugs:
    @pytest.mark.parametrize("aug", ALL_AUGS, ids=lambda a: a.name)
    def test_shape_preserved_and_jittable(self, aug):
        img, mask = _img(), _mask()
        fn = jax.jit(lambda k, i, m: aug.apply(k, i, m))
        out, m = fn(jax.random.PRNGKey(0), img, mask)
        assert out.shape == img.shape
        assert m.shape == mask.shape
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("aug", [A.JPEG(), A.VideoCompressionProxy(),
                                     A.MedianFilter(), A.Crop(), A.Rotate()],
                             ids=lambda a: a.name)
    def test_gradients_flow(self, aug):
        img, mask = _img(1), _mask(1)

        def loss(x):
            y, _ = aug.apply(jax.random.PRNGKey(1), x, mask)
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(img)
        assert float(jnp.abs(g).sum()) > 0

    def test_hflip(self):
        img, mask = _img(), _mask()
        out, _ = A.HorizontalFlip().apply_strength(img, mask, None)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img)[:, :, ::-1])

    def test_brightness_matches_torch(self):
        img = _img(1)
        out, _ = A.Brightness().apply_strength(img, _mask(1), 1.5)
        ref = torch.clamp(torch.from_numpy(np.asarray(img)) * 1.5, 0, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_grayscale_channels_equal(self):
        out, _ = A.Grayscale().apply_strength(_img(), _mask(), None)
        o = np.asarray(out)
        np.testing.assert_allclose(o[..., 0], o[..., 1], atol=1e-7)

    def test_rotate90_strength(self):
        img = _img(1)
        out, _ = A.Rotate().apply_strength(img, _mask(1), 90)
        # 90° counterclockwise (torchvision convention)
        np.testing.assert_allclose(np.asarray(out), np.rot90(np.asarray(img), 1, (1, 2)),
                                   atol=1e-4)


class TestJPEG:
    def test_quality_monotonic(self):
        img = _img(1, 64, 64)
        errs = []
        for q in [20, 50, 90]:
            out = jpeg_roundtrip(img, q)
            errs.append(float(jnp.mean((out - img) ** 2)))
        assert errs[0] > errs[1] > errs[2]

    def test_matches_pil_direction(self):
        """Proxy should correlate with real PIL JPEG (not exact — no entropy
        coding/subsampling differences), same ballpark MSE at q=50."""
        from PIL import Image
        import io
        rng = np.random.default_rng(3)
        x = (rng.uniform(0, 1, (64, 64, 3)) ** 1.5).astype(np.float32)
        out = np.asarray(jpeg_roundtrip(jnp.asarray(x)[None], 50))[0]
        buf = io.BytesIO()
        Image.fromarray((x * 255).round().astype(np.uint8)).save(buf, "JPEG", quality=50)
        pil = np.asarray(Image.open(buf)).astype(np.float32) / 255
        mse_proxy = ((out - x) ** 2).mean()
        mse_pil = ((pil - x) ** 2).mean()
        assert 0.2 < mse_proxy / mse_pil < 5.0

    def test_ste_gradient_identity(self):
        img = _img(1, 16, 16)
        g = jax.grad(lambda x: jnp.sum(jpeg_roundtrip(x, 50)))(img)
        # straight-through: gradient magnitude close to that of identity-ish map
        assert 0.1 < float(jnp.abs(g).mean()) < 10.0


class TestWarp:
    def test_rotate_zero_is_identity(self):
        img = _img(1)
        out = W.rotate(img, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_crop_resize_full_window_is_identityish(self):
        img = _img(1, 16, 16)
        out = W.crop_resize(img, jnp.int32(0), jnp.int32(0), jnp.int32(16), jnp.int32(16))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_perspective_identity_points(self):
        img = _img(1, 16, 16)
        pts = jnp.asarray([[0, 0], [15, 0], [15, 15], [0, 15]], jnp.float32)
        out = W.warp_perspective(img, pts, pts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


class TestAugmenter:
    def test_dummy_is_identity(self):
        aug = get_dummy_augmenter()
        img, mask = _img(), _mask()
        out, m, sel = jax.jit(lambda k: aug(k, img, img * 0.9, None, train=True))(
            jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_full_config_jits(self):
        cfg = {
            "masks": {"kind": None},
            "augs": {"identity": 1, "jpeg": 1, "crop": 1, "brightness": 1,
                     "hflip": 1, "h264": 1},
            "augs_params": {"jpeg": {"min_quality": 40, "max_quality": 80},
                            "crop": {"min_size": 0.5, "max_size": 1.0}},
        }
        aug = build_augmenter(cfg, num_augs=2)
        img, mask = _img(4), _mask(4)
        fn = jax.jit(lambda k: aug(k, img, img, None, is_video=True, train=True))
        outs = set()
        for s in range(5):
            out, m, sel = fn(jax.random.PRNGKey(s))
            assert out.shape == img.shape
            outs.add(tuple(np.asarray(sel).tolist()))
        assert len(outs) > 1  # different augs actually get selected

    def test_video_only_augs_excluded_for_images(self):
        cfg = {"augs": {"identity": 1, "h264": 1}, "augs_params": {}}
        aug = build_augmenter(cfg)
        assert aug.aug_names(is_video=False) == ["identity"]
        assert aug.aug_names(is_video=True) == ["identity", "h264"]
