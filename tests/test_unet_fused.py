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
