"""BN-folded raw-param UNet forward vs the linen module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoseal_tpu.models.embedder import build_embedder
from videoseal_tpu.kernels.unet_fused import unet_apply_fused, supports_unet_fused


def _build(norm, act, in_c=1):
    cfg = {"msg_processor": {"msg_processor_type": "binary+concat"},
           "unet": {"in_channels": in_c, "out_channels": in_c, "z_channels": 4,
                    "num_blocks": 2, "activation": act, "normalization": norm,
                    "z_channels_mults": [1, 2], "last_tanh": True}}
    return build_embedder("unet_x" + ("_yuv" if in_c == 1 else ""), cfg, 8, 2), cfg


class TestUnetFused:
    @pytest.mark.parametrize("norm,act", [("batch", "relu"), ("rms", "silu")])
    def test_parity(self, norm, act):
        spec, cfg = _build(norm, act)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (3, 32, 32, 1)).astype(np.float32))
        m = jnp.asarray(rng.integers(0, 2, (3, 8)))
        v = spec.module.init(jax.random.PRNGKey(0), x, m)
        if norm == "batch":
            # randomize running stats so folding is actually exercised
            bs = jax.tree_util.tree_map(
                lambda a: jnp.asarray(
                    rng.uniform(0.5, 2.0, a.shape).astype(np.float32)),
                v["batch_stats"])
            v = {"params": v["params"], "batch_stats": bs}
        ref = spec.module.apply(v, x, m)
        u = cfg["unet"]
        out = unet_apply_fused(v["params"], v.get("batch_stats", {}), x, m,
                               nbits=8, hidden_size=16,
                               z_channels_mults=(1, 2), activation=act,
                               normalization=norm, num_blocks=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_supports(self):
        assert supports_unet_fused({"normalization": "batch"})
        assert supports_unet_fused({"normalization": "rms"})
        assert not supports_unet_fused({"normalization": "group"})
        assert not supports_unet_fused({"normalization": "batch",
                                        "conv_layer": "conv2p1d"})


class TestLanePack:
    """conv3x3_lane_packed == lax 3x3/s1 conv, exactly (same dtype/precision)."""

    def test_same_pad_parity(self):
        from videoseal_tpu.kernels.lane_pack import conv3x3_lane_packed
        rng = np.random.default_rng(1)
        for ci, co in [(1, 16), (16, 16), (32, 32), (48, 24)]:
            x = jnp.asarray(rng.normal(size=(2, 64, 96, ci)).astype(np.float32))
            w = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32))
            b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
            dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            ref = jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                               dimension_numbers=dn) + b
            out = conv3x3_lane_packed(x, w, b)
            # same-math, different contraction order: f32 round-off only
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-4, rtol=1e-4)

    def test_prepadded_reflect(self):
        from videoseal_tpu.kernels.lane_pack import conv3x3_lane_packed
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        dn = jax.lax.conv_dimension_numbers(xp.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        ref = jax.lax.conv_general_dilated(xp, w, (1, 1), "VALID",
                                           dimension_numbers=dn)
        out = conv3x3_lane_packed(xp, w, prepadded=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_supports(self):
        from videoseal_tpu.kernels.lane_pack import supports_lane_pack
        assert supports_lane_pack((1, 256, 256, 16), (3, 3, 16, 16))
        assert supports_lane_pack((1, 128, 128, 32), (3, 3, 48, 32))
        assert not supports_lane_pack((1, 256, 256, 16), (3, 3, 16, 64))
        assert not supports_lane_pack((1, 255, 256, 16), (3, 3, 16, 16))
        assert not supports_lane_pack((1, 32, 32, 16), (3, 3, 16, 16))
        assert not supports_lane_pack((1, 256, 256, 16), (1, 1, 16, 16))

    def test_unet_fused_lane_pack_parity(self):
        """Full fused UNet with lane_pack on vs off at a size where it fires."""
        from videoseal_tpu.kernels.unet_fused import unet_apply_fused
        spec, cfg = _build("batch", "relu")
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
        m = jnp.asarray(rng.integers(0, 2, (1, 8)))
        v = spec.module.init(jax.random.PRNGKey(0), x, m)
        kw = dict(nbits=8, hidden_size=16, z_channels_mults=(1, 2),
                  activation="relu", normalization="batch", num_blocks=2)
        a = unet_apply_fused(v["params"], v["batch_stats"], x, m,
                             lane_pack=False, **kw)
        b = unet_apply_fused(v["params"], v["batch_stats"], x, m,
                             lane_pack=True, **kw)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)
