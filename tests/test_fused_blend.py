"""Fused Pallas JND+blend kernel vs the unfused XLA reference path.

Runs in Pallas interpret mode on CPU; exactness on real TPU is covered by the
bench/verify drives.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from videoseal_tpu.kernels.fused_blend import (fused_jnd_blend, _pick_tile,
                                               supports_fused_blend)
from videoseal_tpu.models.blender import blend
from videoseal_tpu.modules.jnd import JND


def _ref(imgs, preds, si, sw):
    jnd = JND(in_channels=1, out_channels=3)
    h = jnd.heatmaps(imgs)
    return jnp.clip(blend("additive", imgs, h * preds, si, sw), 0.0, 1.0)


class TestFusedDelta:
    def test_delta_matches_reference(self):
        from videoseal_tpu.kernels.fused_blend import fused_jnd_delta
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32))
        pred = jnp.asarray(rng.uniform(-1, 1, (2, 64, 48)).astype(np.float32))
        delta = fused_jnd_delta(imgs, pred, 0.2, interpret=True)
        out = jnp.clip(imgs + delta[..., None], 0, 1)
        ref = _ref(imgs, pred[..., None], 1.0, 0.2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestFusedDeltaUp:
    @pytest.mark.parametrize("dtype", ["uint8", "float32"])
    def test_matches_delta_plus_resize(self, dtype):
        """fused_jnd_delta_up (in-kernel banded upsample) == resize-then-delta."""
        from videoseal_tpu.kernels.fused_blend import (fused_jnd_delta,
                                                       fused_jnd_delta_up)
        from videoseal_tpu.ops.resize import resize_bilinear
        rng = np.random.default_rng(3)
        F, H, W, s = 2, 216, 384, 64
        if dtype == "uint8":
            imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        else:
            imgs = jnp.asarray(rng.uniform(0, 1, (F, H, W, 3)), jnp.float32)
        pred_low = jnp.asarray(rng.uniform(-1, 1, (F, s, s)), jnp.float32)
        pred_full = resize_bilinear(pred_low[..., None], H, W,
                                    precision="highest")[..., 0]
        ref = fused_jnd_delta(imgs, pred_full, 0.2, interpret=True)
        got = fused_jnd_delta_up(imgs, pred_low, 0.2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestFusedBlend:
    @pytest.mark.parametrize("pred_c", [1, 3])
    def test_matches_reference(self, pred_c):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32))
        preds = jnp.asarray(rng.uniform(-1, 1, (2, 64, 48, pred_c)).astype(np.float32))
        ref = _ref(imgs, preds, 1.0, 0.2)
        out = fused_jnd_blend(imgs, preds, 1.0, 0.2, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_multi_tile_rows(self):
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(0, 1, (1, 192, 40, 3)).astype(np.float32))
        preds = jnp.asarray(rng.uniform(-1, 1, (1, 192, 40, 1)).astype(np.float32))
        assert _pick_tile(192) < 192  # forces >1 tile
        out = fused_jnd_blend(imgs, preds, 1.0, 0.3, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(imgs, preds, 1.0, 0.3)),
                                   atol=2e-5)

    def test_supports_predicate(self):
        jnd = JND(in_channels=1, out_channels=3)
        assert supports_fused_blend(1080, 1920, 1, jnd, "additive")
        assert not supports_fused_blend(1080, 1920, 1, jnd, "multiplicative")
        assert not supports_fused_blend(1080, 1920, 1, None, "additive")
        assert not supports_fused_blend(
            1080, 1920, 1, JND(in_channels=3, out_channels=1), "additive")
        assert not supports_fused_blend(1031, 1920, 1, jnd, "additive")  # prime H


class TestHeatmapLum:
    @pytest.mark.parametrize("shape", [(2, 64, 48, 3), (3, 33, 41, 3)])
    def test_matches_grouped_conv_heatmaps(self, shape):
        """JND.heatmap_lum (2D shift-add formulation, planar lowres serving
        path) == channel 0 of the grouped-conv heatmaps for jnd_1_*."""
        rng = np.random.default_rng(7)
        imgs = jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))
        jnd = JND(in_channels=1, out_channels=3)
        ref = np.asarray(jnd.heatmaps(imgs))[..., 0]
        got = np.asarray(jnd.heatmap_lum(imgs))
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_video_leading_dims(self):
        rng = np.random.default_rng(8)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 3, 32, 40, 3)).astype(np.float32))
        jnd = JND(in_channels=1, out_channels=3)
        ref = np.asarray(jnd.heatmaps(imgs))[..., 0]
        got = np.asarray(jnd.heatmap_lum(imgs))
        assert got.shape == imgs.shape[:-1]
        np.testing.assert_allclose(got, ref, atol=2e-5)
