"""Temporal (2+1D) model paths: checkpoint inflation, temporal conv/attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoseal_tpu.models.embedder import build_embedder
from videoseal_tpu.scripts.inflate_model_to_temporal import inflate_tree
from videoseal_tpu.modules.vit import TemporalBlock, ImageEncoderViT
from videoseal_tpu.modules.convnext import ConvNeXtV2


UNET_CFG = {
    "msg_processor": {"msg_processor_type": "binary+concat"},
    "unet": {"in_channels": 3, "out_channels": 3, "z_channels": 4,
             "num_blocks": 1, "activation": "relu", "normalization": "rms",
             "z_channels_mults": [1, 2], "last_tanh": True},
}


class TestInflation:
    def test_inflated_matches_2d_at_init(self):
        """Identity-initialized temporal convs must reproduce the 2D model
        exactly (scripts/inflate_model_to_temporal.py:58-70 semantics)."""
        spec2d = build_embedder("unet_t", UNET_CFG, nbits=8, hidden_size_multiplier=2)
        imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3)),
                           jnp.float32)
        msgs = jnp.asarray(np.random.default_rng(1).integers(0, 2, (4, 8)))
        v2d = spec2d.module.init(jax.random.PRNGKey(0), imgs, msgs)
        out2d = spec2d.module.apply(v2d, imgs, msgs)

        cfg3 = {"msg_processor": UNET_CFG["msg_processor"],
                "unet": {**UNET_CFG["unet"], "conv_layer": "conv2p1d"}}
        spec3d = build_embedder("unet_t3", cfg3, nbits=8, hidden_size_multiplier=2)
        inflated = {c: inflate_tree(t) for c, t in v2d.items()}
        # sanity: tree matches the 2p1d module's expected structure
        ref_shapes = jax.eval_shape(
            lambda: spec3d.module.init(jax.random.PRNGKey(0), imgs, msgs))
        out3d = spec3d.module.apply(inflated, imgs, msgs)
        np.testing.assert_allclose(np.asarray(out3d), np.asarray(out2d), atol=1e-5)


class TestTemporalAttention:
    def test_temporal_block_shapes(self):
        blk = TemporalBlock(dim=32, num_heads=4, use_rel_pos=True, video_len=8)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4, 4, 32)),
                        jnp.float32)
        v = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(v, x)
        assert out.shape == x.shape

    def test_vit_temporal_attention(self):
        enc = ImageEncoderViT(img_size=32, patch_size=16, embed_dim=32, depth=2,
                              num_heads=2, out_chans=32, window_size=0,
                              use_rel_pos=True, temporal_attention=True,
                              max_temporal_length=8)
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3)),
                        jnp.float32)
        v = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(v, x)
        assert out.shape == (4, 2, 2, 32)

    def test_convnext_temporal_convs(self):
        m = ConvNeXtV2(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                       temporal_convs=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 64, 64, 3)),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (4, 2, 2, 64)
