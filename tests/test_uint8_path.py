"""uint8 (rgb24) frame support: embed/detect parity with the float path."""

import numpy as np
import pytest

import jax.numpy as jnp

import videoseal_tpu as vs
import videoseal_tpu.models


@pytest.fixture(scope="module")
def model():
    card = {
        "args": {"attenuation": "jnd_1_1", "nbits": 16, "hidden_size_multiplier": 2,
                 "img_size_proc": 32, "blending_method": "additive",
                 "scaling_w": 0.2, "scaling_i": 1.0,
                 "videoseal_chunk_size": 4, "videoseal_step_size": 2},
        "embedder": {"model": "unet_tiny_yuv", "params": {
            "msg_processor": {"msg_processor_type": "binary+concat"},
            "unet": {"in_channels": 1, "out_channels": 1, "z_channels": 4,
                     "num_blocks": 1, "activation": "relu", "normalization": "batch",
                     "z_channels_mults": [1, 2], "last_tanh": True}}},
        "extractor": {"model": "convnext_tiny", "params": {
            "encoder": {"depths": [1, 1, 1, 1], "dims": [8, 16, 32, 64]},
            "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                              "embed_dim": 64, "sigmoid_output": False}}},
    }
    return vs.models.VideoSeal.from_card(card)


def _u8(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


class TestUint8:
    def test_embed_u8_matches_float(self, model):
        u8 = _u8((3, 48, 40, 3))
        f32 = u8.astype(np.float32) / 255.0
        msgs = jnp.asarray(np.random.default_rng(1).integers(0, 2, (3, 16)))
        out_u8 = model.embed(jnp.asarray(u8), msgs=msgs, is_video=False)
        out_f = model.embed(jnp.asarray(f32), msgs=msgs, is_video=False)
        assert out_u8["imgs_w"].dtype == jnp.uint8
        # u8 output == float output quantized to 8 bits (within 1 LSB of rounding)
        q = np.asarray(out_u8["imgs_w"]).astype(np.float32)
        ref = np.round(np.asarray(out_f["imgs_w"]) * 255.0)
        assert np.abs(q - ref).max() <= 1.0

    def test_video_u8(self, model):
        u8 = _u8((6, 32, 32, 3), seed=2)
        out = model.embed(jnp.asarray(u8), is_video=True)
        assert out["imgs_w"].dtype == jnp.uint8
        msg = model.extract_message(out["imgs_w"])
        assert msg.shape == (1, 16)

    def test_detect_u8_matches_float(self, model):
        u8 = _u8((2, 32, 32, 3), seed=3)
        f32 = u8.astype(np.float32) / 255.0
        p_u8 = np.asarray(model.detect(jnp.asarray(u8))["preds"])
        p_f = np.asarray(model.detect(jnp.asarray(f32))["preds"])
        np.testing.assert_allclose(p_u8, p_f, atol=1e-4)
