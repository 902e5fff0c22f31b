"""Planar-u8 fused JND+upsample+blend kernel vs the NHWC fused path.

Interpret mode on CPU; real-TPU exactness is covered by bench/verify drives.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from videoseal_tpu.kernels.fused_blend import fused_jnd_delta_up
from videoseal_tpu.kernels.fused_planar import (fused_jnd_blend_planar,
                                                pack_planar, planar_shape,
                                                resize_planar, unpack_planar)


def _ref_u8(imgs_u8, pred_low, si, sw):
    """The existing (verified) u8 path: delta kernel + elementwise blend."""
    delta = fused_jnd_delta_up(imgs_u8, pred_low, sw, interpret=True)
    out = si * imgs_u8.astype(jnp.float32) + 255.0 * delta[..., None]
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


class TestFusedPlanar:
    @pytest.mark.parametrize("hw", [(216, 384), (200, 300)])
    def test_matches_nhwc_path(self, hw):
        H, W = hw
        F, s = 2, 64
        rng = np.random.default_rng(5)
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        pred_low = jnp.asarray(rng.uniform(-1, 1, (F, s, s)), jnp.float32)

        imgs_p = pack_planar(imgs)
        assert imgs_p.shape == planar_shape(F, H, W)
        got_p = fused_jnd_blend_planar(imgs_p, pred_low, 0.2, 1.0, H, W,
                                       interpret=True)
        got = unpack_planar(got_p, H, W)

        # reference path only supports tile-divisible H; emulate with the
        # heatmap/blend math through the delta kernel on a padded image whose
        # extra rows do not influence rows < H (the JND window is 9x9, the
        # pad rows are >4 away only when H is tile-divisible) -> for the
        # non-divisible case compare against a zero-padded NHWC image and
        # crop, which matches the planar buffer's zero padding exactly.
        H8 = -(-H // 8) * 8
        if H8 != H:
            imgs_pad = jnp.zeros((F, H8, W, 3), jnp.uint8)
            imgs_pad = imgs_pad.at[:, :H].set(imgs)
            from videoseal_tpu.ops.resize import _resize_matrix
            # height-resize matrix for the true H, embedded into H8 rows
            pred_full_w = jnp.einsum(
                "Ww,fhw->fhW",
                jnp.asarray(_resize_matrix(s, W, antialias=True)),
                pred_low, precision="highest")
            mh = np.zeros((H8, s), np.float32)
            mh[:H] = _resize_matrix(s, H, antialias=True)
            pred_full = jnp.einsum("Hs,fsW->fHW", jnp.asarray(mh),
                                   pred_full_w, precision="highest")
            from videoseal_tpu.kernels.fused_blend import fused_jnd_delta
            delta = fused_jnd_delta(imgs_pad, pred_full, 0.2, interpret=True)
            out = 1.0 * imgs_pad.astype(jnp.float32) + 255.0 * delta[..., None]
            ref = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)[:, :H]
        else:
            ref = _ref_u8(imgs, pred_low, 1.0, 0.2)

        # <=1 LSB: both paths share the math but f32 summation order in the
        # luminance/blend can flip an exact .5 rounding
        diff = np.abs(np.asarray(got).astype(np.int16)
                      - np.asarray(ref).astype(np.int16))
        assert diff.max() <= 1, f"max u8 diff {diff.max()}"
        assert (diff > 0).mean() < 1e-3

    @pytest.mark.parametrize("hw", [(216, 384), (200, 300)])
    def test_lowres_mode_matches_plain_upsample_blend(self, hw):
        """lowres=True: pred_low arrives pre-attenuated; the kernel must be
        exactly clip(round(si*img + 255*sw*upsample(pred_low))) with the
        same width->height matmul resize the full-res path uses (ref
        semantics: videoseal.py:321-331 — no full-res JND)."""
        from videoseal_tpu.ops.resize import _resize_matrix
        H, W = hw
        F, s = 2, 64
        rng = np.random.default_rng(13)
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        pred_low = jnp.asarray(rng.uniform(-0.05, 0.05, (F, s, s)), jnp.float32)

        imgs_p = pack_planar(imgs)
        got_p = fused_jnd_blend_planar(imgs_p, pred_low, 0.2, 1.0, H, W,
                                       interpret=True, lowres=True)
        got = unpack_planar(got_p, H, W)

        pred_w = jnp.einsum("Ww,fhw->fhW",
                            jnp.asarray(_resize_matrix(s, W, antialias=True)),
                            pred_low, precision="highest")
        pred_full = jnp.einsum("Hs,fsW->fHW",
                               jnp.asarray(_resize_matrix(s, H, antialias=True)),
                               pred_w, precision="highest")
        out = (1.0 * imgs.astype(jnp.float32)
               + 255.0 * 0.2 * pred_full[..., None])
        ref = jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
        diff = np.abs(np.asarray(got).astype(np.int16)
                      - np.asarray(ref).astype(np.int16))
        assert diff.max() <= 1, f"max u8 diff {diff.max()}"
        assert (diff > 0).mean() < 1e-3

    def test_resize_planar_matches_nhwc_resize(self):
        from videoseal_tpu.ops.resize import resize_bilinear
        rng = np.random.default_rng(6)
        F, H, W, s = 2, 200, 312, 64
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        imgs_p = pack_planar(imgs)
        got = resize_planar(imgs_p, H, W, s, s)
        ref = resize_bilinear(imgs.astype(jnp.float32) / 255.0, s, s,
                              precision="highest")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_resize_planar_bf16_serving_path(self):
        """Non-highest precision takes the bf16 fast path: u8 values are
        exact in bf16, so the only rounding is the weight tables + the bf16
        intermediate (~0.5 LSB at 8-bit scale). The `gain` measurement hook
        at 1.0 must be bit-exact (bench.py's loop-dependence rides it)."""
        rng = np.random.default_rng(7)
        F, H, W, s = 2, 200, 312, 64
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        imgs_p = pack_planar(imgs)
        ref = resize_planar(imgs_p, H, W, s, s)                 # f32 highest
        fast = resize_planar(imgs_p, H, W, s, s, precision="default")
        assert fast.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=3.0 / 255.0)
        gained = resize_planar(imgs_p, H, W, s, s, precision="default",
                               gain=jnp.float32(1.0))
        assert bool((fast == gained).all())


class TestFusedDetectOutput:
    def test_detect_output_matches_resize_of_u8_output(self):
        """detect_size path: the in-kernel downscale (width matmul per tile +
        banded height accumulation) must match resizing the kernel's own u8
        output — the extractor input the resize_planar detect path would
        have produced (bf16 matmuls: <=3 LSB at 8-bit scale)."""
        from videoseal_tpu.ops.resize import resize_bilinear
        F, H, W, s, ds = 2, 216, 384, 64, 128
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        pred_low = jnp.asarray(rng.uniform(-1, 1, (F, s, s)), jnp.float32)
        imgs_p = pack_planar(imgs)
        out_p, det = fused_jnd_blend_planar(imgs_p, pred_low, 0.2, 1.0, H, W,
                                            interpret=True, detect_size=ds)
        # baseline: same u8 planes resized the pre-fusion way
        out = unpack_planar(out_p, H, W)
        ref = resize_bilinear(out.astype(jnp.float32) / 255.0, ds, ds,
                              precision="highest")
        got = np.asarray(jnp.transpose(det, (0, 2, 3, 1)))
        np.testing.assert_allclose(got, np.asarray(ref), atol=3.0 / 255.0)

    def test_detect_output_lowres_mode(self):
        """lowres=True + detect_size: the combination the lowres serving
        bench exercises (bench.py --fused_detect). The emit path is
        independent of the JND placement, so the in-kernel downscale must
        still match resizing the kernel's own u8 output."""
        from videoseal_tpu.ops.resize import resize_bilinear
        F, H, W, s, ds = 2, 216, 384, 64, 128
        rng = np.random.default_rng(15)
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        # lowres mode: pred arrives pre-attenuated (heat * pred), small
        pred_low = jnp.asarray(rng.uniform(-0.05, 0.05, (F, s, s)),
                               jnp.float32)
        imgs_p = pack_planar(imgs)
        out_p, det = fused_jnd_blend_planar(imgs_p, pred_low, 0.2, 1.0, H, W,
                                            interpret=True, detect_size=ds,
                                            lowres=True)
        out = unpack_planar(out_p, H, W)
        ref = resize_bilinear(out.astype(jnp.float32) / 255.0, ds, ds,
                              precision="highest")
        got = np.asarray(jnp.transpose(det, (0, 2, 3, 1)))
        np.testing.assert_allclose(got, np.asarray(ref), atol=3.0 / 255.0)

    def test_pipeline_with_detect_input(self):
        """embed_pipeline_planar(with_detect_input=True) returns the same u8
        frames as the plain call plus a proc-res NHWC detect input."""
        import jax
        from videoseal_tpu.train import TINY_CARD
        from videoseal_tpu.models.embedder import build_embedder
        from videoseal_tpu.models.videoseal import (PipelineConfig,
                                                    embed_pipeline_planar)
        from videoseal_tpu.modules.jnd import build_attenuation

        emb = build_embedder(TINY_CARD["embedder"]["model"],
                             TINY_CARD["embedder"]["params"], 16, 2)
        cfg = PipelineConfig(img_size=128, yuv=emb.yuv, nbits=16, step_size=2,
                             chunk_size=8)
        att = build_attenuation("jnd_1_1")
        rng = np.random.default_rng(12)
        F, H, W = 2, 160, 256
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        msgs = jnp.asarray(rng.integers(0, 2, (1, 16)), jnp.int32)
        variables = emb.module.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 128, 128, 1)),
                                    jnp.zeros((1, 16), jnp.int32))
        plain = embed_pipeline_planar(emb.module, att, cfg, variables, imgs_p
                                      := pack_planar(imgs), msgs, 0.2, 1.0,
                                      H, W, interpret=True)
        wm_p, det_in = embed_pipeline_planar(emb.module, att, cfg, variables,
                                             imgs_p, msgs, 0.2, 1.0, H, W,
                                             interpret=True,
                                             with_detect_input=True)
        assert bool((wm_p == plain).all())
        assert det_in.shape == (F, 128, 128, 3)
        assert det_in.dtype == jnp.float32
        assert 0.0 <= float(det_in.min()) and float(det_in.max()) <= 1.0 + 1e-3


class TestPlanarPipeline:
    def test_embed_pipeline_planar_matches_nhwc(self):
        """Full planar embed pipeline == NHWC u8 pipeline (tiny card, CPU)."""
        import jax.numpy as jnp
        from videoseal_tpu.train import TINY_CARD
        from videoseal_tpu.models.embedder import build_embedder
        from videoseal_tpu.models.videoseal import (PipelineConfig,
                                                    embed_pipeline,
                                                    embed_pipeline_planar)
        from videoseal_tpu.modules.jnd import build_attenuation
        import jax

        emb = build_embedder(TINY_CARD["embedder"]["model"],
                             TINY_CARD["embedder"]["params"], 16, 2)
        cfg = PipelineConfig(img_size=64, yuv=emb.yuv, nbits=16, step_size=2,
                             chunk_size=8)
        att = build_attenuation("jnd_1_1")
        rng = np.random.default_rng(9)
        F, H, W = 4, 120, 200
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        msgs = jnp.asarray(rng.integers(0, 2, (1, 16)), jnp.int32)
        variables = emb.module.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 1)),
                                    jnp.zeros((1, 16), jnp.int32))

        wm_n, _ = embed_pipeline(emb.module, att, cfg, variables, imgs, msgs,
                                 0.2, 1.0, is_video=True,
                                 lowres_attenuation=False)
        imgs_p = pack_planar(imgs)
        wm_p = embed_pipeline_planar(emb.module, att, cfg, variables, imgs_p,
                                     msgs, 0.2, 1.0, H, W, interpret=True)
        got = np.asarray(unpack_planar(wm_p, H, W)).astype(np.int16)
        ref = np.asarray(wm_n).astype(np.int16)
        d = np.abs(got - ref)
        assert d.max() <= 1, f"max u8 diff {d.max()}"
        assert (d > 0).mean() < 1e-2

    def test_embed_pipeline_planar_lowres_matches_nhwc_lowres(self):
        """Planar lowres-attenuation serving mode == the NHWC pipeline with
        lowres_attenuation=True (the reference's video-serving JND placement,
        inference_streaming.py:28 / videoseal.py:321-331)."""
        import jax.numpy as jnp
        from videoseal_tpu.train import TINY_CARD
        from videoseal_tpu.models.embedder import build_embedder
        from videoseal_tpu.models.videoseal import (PipelineConfig,
                                                    embed_pipeline,
                                                    embed_pipeline_planar)
        from videoseal_tpu.modules.jnd import build_attenuation
        import jax

        emb = build_embedder(TINY_CARD["embedder"]["model"],
                             TINY_CARD["embedder"]["params"], 16, 2)
        cfg = PipelineConfig(img_size=64, yuv=emb.yuv, nbits=16, step_size=2,
                             chunk_size=8, lowres_attenuation=True)
        att = build_attenuation("jnd_1_1")
        rng = np.random.default_rng(14)
        F, H, W = 4, 120, 200
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        msgs = jnp.asarray(rng.integers(0, 2, (1, 16)), jnp.int32)
        variables = emb.module.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 1)),
                                    jnp.zeros((1, 16), jnp.int32))

        wm_n, _ = embed_pipeline(emb.module, att, cfg, variables, imgs, msgs,
                                 0.2, 1.0, is_video=True,
                                 lowres_attenuation=True)
        imgs_p = pack_planar(imgs)
        wm_p = embed_pipeline_planar(emb.module, att, cfg, variables, imgs_p,
                                     msgs, 0.2, 1.0, H, W, interpret=True)
        got = np.asarray(unpack_planar(wm_p, H, W)).astype(np.int16)
        ref = np.asarray(wm_n).astype(np.int16)
        d = np.abs(got - ref)
        assert d.max() <= 1, f"max u8 diff {d.max()}"
        assert (d > 0).mean() < 1e-2


class TestEmbedDetectPlanarAPI:
    def test_fused_matches_separate_resize(self):
        """VideoSeal.embed_detect_planar: the fused_detect path (extractor
        input produced inside the blend kernel) must return the SAME
        watermarked planes as the separate-resize path, and detection logits
        within the 3-LSB resize tolerance of the kernel's bf16 downscale
        matmuls. This is the scored serving configuration of bench.py
        (lowres mode -> fused_detect on)."""
        import jax
        from videoseal_tpu.models.embedder import build_embedder
        from videoseal_tpu.models.extractor import build_extractor
        from videoseal_tpu.models.videoseal import PipelineConfig, VideoSeal
        from videoseal_tpu.modules.jnd import build_attenuation

        s = 128  # detect_size must be lane-aligned (%128) for the emit path
        emb = build_embedder("unet_tiny_yuv", {
            "msg_processor": {"msg_processor_type": "binary+concat"},
            "unet": {"in_channels": 1, "out_channels": 1, "z_channels": 4,
                     "num_blocks": 1, "activation": "relu",
                     "normalization": "batch", "z_channels_mults": [1, 2],
                     "last_tanh": True}}, 16, 2)
        ext = build_extractor("convnext_tiny", {
            "encoder": {"depths": [1, 1, 1, 1], "dims": [8, 16, 32, 64]},
            "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                              "embed_dim": 64, "sigmoid_output": False}},
            s, 16)
        cfg = PipelineConfig(img_size=s, yuv=emb.yuv, nbits=16, step_size=2,
                             chunk_size=8, lowres_attenuation=True)
        rng = np.random.default_rng(21)
        evars = emb.module.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, s, s, 1)),
                                jnp.zeros((1, 16), jnp.int32))
        xvars = ext.module.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, s, s, 3)))
        model = VideoSeal(emb, ext, evars, xvars,
                          build_attenuation("jnd_1_1"), cfg)
        F, H, W = 2, 160, 256
        imgs = jnp.asarray(rng.integers(0, 256, (F, H, W, 3)), jnp.uint8)
        msgs = jnp.asarray(rng.integers(0, 2, (1, 16)), jnp.int32)
        imgs_p = pack_planar(imgs)

        fused = model.embed_detect_planar(imgs_p, H, W, msgs=msgs,
                                          fused_detect=True, interpret=True)
        plain = model.embed_detect_planar(imgs_p, H, W, msgs=msgs,
                                          fused_detect=False, interpret=True)
        assert bool((fused["imgs_w"] == plain["imgs_w"]).all())
        assert fused["preds"].shape == plain["preds"].shape == (F, 1 + 16)
        np.testing.assert_allclose(np.asarray(fused["preds"]),
                                   np.asarray(plain["preds"]), atol=0.1)
