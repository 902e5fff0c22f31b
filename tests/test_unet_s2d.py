"""s2d-space UNet serving path vs the BN-folded fused forward and the
linen module. Same math, different layouts: tolerances are f32 round-off."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoseal_tpu.models.embedder import build_embedder
from videoseal_tpu.kernels.unet_fused import unet_apply_fused
from videoseal_tpu.kernels.unet_s2d import (conv_s2d, s2d, d2s,
                                            s2d_schedule, unet_apply_s2d)


class TestConvS2d:
    def _ref(self, x, w, stride=1, pad=1):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(x, w, (stride, stride),
                                            [(pad, pad)] * 2,
                                            dimension_numbers=dn)

    @pytest.mark.parametrize("s_in,s_out,stride,k", [
        (2, 2, 1, 3), (4, 4, 1, 3), (2, 2, 1, 1), (4, 4, 1, 1),
        (4, 2, 2, 3), (2, 1, 2, 3), (2, 2, 2, 3), (1, 2, 1, 3), (1, 4, 1, 3),
    ])
    def test_packed_equals_direct(self, s_in, s_out, stride, k):
        rng = np.random.default_rng(0)
        ci, co, H = 3, 5, 32
        x = jnp.asarray(rng.normal(size=(2, H, H, ci)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, ci, co)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        ref = self._ref(x, w, stride, (k - 1) // 2) + b
        got = d2s(conv_s2d(s2d(x, s_in), w, b, conv_stride=stride,
                           s_in=s_in, s_out=s_out), s_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

    def test_prepadded(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        dn = jax.lax.conv_dimension_numbers(xp.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        ref = jax.lax.conv_general_dilated(xp, w, (1, 1), "VALID",
                                           dimension_numbers=dn)
        got = d2s(conv_s2d(xp, w, None, s_in=1, s_out=2, pad=0), 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


class TestComposedUpsample:
    """_upsample_s2d_composed vs the plain-excursion _upsample_s2d."""

    @pytest.mark.parametrize("s_in,s_out,h,w", [
        (1, 1, 8, 8), (1, 2, 8, 12), (2, 2, 8, 8), (2, 1, 6, 10), (2, 4, 8, 8),
    ])
    def test_matches_plain_excursion(self, s_in, s_out, h, w):
        from videoseal_tpu.kernels.unet_s2d import (_upsample_s2d,
                                                    _upsample_s2d_composed)
        rng = np.random.default_rng(3)
        ci, co = 6, 4
        act = lambda v: jnp.maximum(v, 0)
        p = {"conv": {"kernel": jnp.asarray(
                          rng.normal(size=(3, 3, ci, co)).astype(np.float32)),
                      "bias": jnp.asarray(
                          rng.normal(size=(co,)).astype(np.float32))},
             "norm": {"weight": jnp.asarray(
                          rng.uniform(0.5, 2, (co,)).astype(np.float32)),
                      "bias": jnp.asarray(
                          rng.normal(size=(co,)).astype(np.float32))}}
        x = jnp.asarray(rng.normal(size=(2, h, w, s_in * s_in * ci))
                        .astype(np.float32))
        ref = _upsample_s2d(x, p, act, s_in, s_out)
        got = _upsample_s2d_composed(x, p, act, s_in, s_out)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-4, rtol=1e-4)


def _build(norm, act, z=4):
    cfg = {"msg_processor": {"msg_processor_type": "binary+concat"},
           "unet": {"in_channels": 1, "out_channels": 1, "z_channels": z,
                    "num_blocks": 2, "activation": act, "normalization": norm,
                    "z_channels_mults": [1, 2], "last_tanh": True}}
    return build_embedder("unet_x_yuv", cfg, 8, 2), cfg


class TestUnetS2d:
    @pytest.mark.parametrize("norm,act,schedule", [
        ("batch", "relu", None),          # inferred schedule
        ("batch", "relu", (2, 2)),
        ("batch", "relu", (4, 1)),
        ("batch", "relu", (1, 1)),        # degenerate: identical to fused
        ("rms", "silu", (2, 2)),
    ])
    def test_parity_vs_fused(self, norm, act, schedule):
        spec, cfg = _build(norm, act)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        m = jnp.asarray(rng.integers(0, 2, (2, 8)))
        v = spec.module.init(jax.random.PRNGKey(0), x, m)
        if norm == "batch":
            bs = jax.tree_util.tree_map(
                lambda a: jnp.asarray(
                    rng.uniform(0.5, 2.0, a.shape).astype(np.float32)),
                v["batch_stats"])
            v = {"params": v["params"], "batch_stats": bs}
        kw = dict(nbits=8, hidden_size=16, z_channels_mults=(1, 2),
                  activation=act, normalization=norm, num_blocks=2)
        ref = unet_apply_fused(v["params"], v.get("batch_stats", {}), x, m, **kw)
        got = unet_apply_s2d(v["params"], v.get("batch_stats", {}), x, m,
                             schedule=schedule, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-4, rtol=1e-4)

    def test_parity_vs_linen_module(self):
        spec, cfg = _build("batch", "relu")
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
        m = jnp.asarray(rng.integers(0, 2, (1, 8)))
        v = spec.module.init(jax.random.PRNGKey(1), x, m)
        ref = spec.module.apply(v, x, m)
        got = unet_apply_s2d(v["params"], v["batch_stats"], x, m,
                             nbits=8, hidden_size=16, z_channels_mults=(1, 2),
                             activation="relu", normalization="batch",
                             num_blocks=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-4, rtol=1e-4)

    def test_schedule(self):
        assert s2d_schedule(256, 16, (1, 2, 4, 8)) == (2, 2, 1, 1)
        assert s2d_schedule(256, 64, (1, 2, 4, 8)) == (1, 1, 1, 1)
