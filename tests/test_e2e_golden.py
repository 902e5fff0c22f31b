"""End-to-end pipeline golden test: full reference Videoseal (torch, random
init) vs VideoSeal (JAX, converted weights) through the COMPLETE public API —
embed -> detect -> extract_message — covering the resize boundary, JND
attenuation, video-mode expansion, chunking, and aggregation as one unit
(reference videoseal/models/videoseal.py:258-428 + wam.py:134-234).

Component-level parity lives in test_modules_parity/test_pipeline; this file
catches integration-order bugs (attenuation/resize ordering, YUV channel
handling, key-frame selection) that per-module tests cannot see.
"""

import importlib

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from refloader import ref_root

import videoseal_tpu as vs


NBITS, IMG_SIZE = 16, 64


def _tiny_card(video_mode="repeat", step=2, chunk=4):
    return {
        "args": {"attenuation": "jnd_1_1", "nbits": NBITS,
                 "hidden_size_multiplier": 2, "img_size_proc": IMG_SIZE,
                 "blending_method": "additive", "scaling_w": 0.2,
                 "scaling_i": 1.0, "videoseal_chunk_size": chunk,
                 "videoseal_step_size": step, "video_mode": video_mode},
        "embedder": {"model": "unet_tiny_yuv", "params": {
            "msg_processor": {"msg_processor_type": "binary+concat"},
            "unet": {"in_channels": 1, "out_channels": 1, "z_channels": 4,
                     "num_blocks": 1, "activation": "relu",
                     "normalization": "batch", "z_channels_mults": [1, 2],
                     "last_tanh": True}}},
        "extractor": {"model": "convnext_tiny", "params": {
            "encoder": {"depths": [1, 1, 1, 1], "dims": [8, 16, 32, 64]},
            "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                              "embed_dim": 64, "sigmoid_output": False}}},
    }


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    """(reference torch Videoseal, our VideoSeal with converted weights)."""
    ref_root()
    RV = importlib.import_module("vsref.models.videoseal")
    RE = importlib.import_module("vsref.models.embedder")
    RX = importlib.import_module("vsref.models.extractor")
    RU = importlib.import_module("vsref.modules.unet")
    RM = importlib.import_module("vsref.modules.msg_processor")
    RC = importlib.import_module("vsref.modules.convnext")
    RP = importlib.import_module("vsref.modules.pixel_decoder")
    RJ = importlib.import_module("vsref.modules.jnd")
    RA = importlib.import_module("vsref.augmentation.augmenter")

    card = _tiny_card()
    torch.manual_seed(11)
    u = card["embedder"]["params"]["unet"]
    tmsg = RM.MsgProcessor(NBITS, 2 * NBITS, "binary+concat")
    tunet = RU.UNetMsg(msg_processor=tmsg, **u)
    tembed = RE.UnetEmbedder(tunet, tmsg)
    tembed.yuv = True
    e = card["extractor"]["params"]["encoder"]
    tcnx = RC.ConvNeXtV2(in_chans=3, depths=e["depths"], dims=e["dims"])
    tpd = RP.PixelDecoder(embed_dim=64, nbits=NBITS, upscale_stages=[1],
                          upscale_type="bilinear", pixelwise=False)
    tdet = RX.ConvnextExtractor(tcnx, tpd)
    tmodel = RV.Videoseal(tembed, tdet, RA.get_dummy_augmenter(),
                          attenuation=RJ.JND(in_channels=1, out_channels=1),
                          scaling_w=0.2, scaling_i=1.0, img_size=IMG_SIZE,
                          chunk_size=4, step_size=2)
    tmodel.eval()

    sd = {}
    sd.update({f"embedder.unet.{k}": v for k, v in tunet.state_dict().items()})
    sd.update({f"embedder.msg_processor.{k}": v for k, v in tmsg.state_dict().items()})
    sd.update({f"detector.convnext.{k}": v for k, v in tcnx.state_dict().items()})
    sd.update({f"detector.pixel_decoder.{k}": v for k, v in tpd.state_dict().items()})
    path = str(tmp_path_factory.mktemp("e2e") / "ckpt.pth")
    torch.save({"model": sd, "args": {}}, path)
    from videoseal_tpu.models.videoseal import VideoSeal
    jmodel = VideoSeal.from_card(card, checkpoint=path)
    return tmodel, jmodel


def _msgs(n=1, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, (n, NBITS)).astype(np.int64)


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


class TestImagePipeline:
    def test_embed_detect_nonsquare(self, models):
        tmodel, jmodel = models
        rng = np.random.default_rng(0)
        imgs = rng.uniform(0, 1, (2, 44, 36, 3)).astype(np.float32)
        msgs = _msgs(2)
        with torch.no_grad():
            ref = tmodel.embed(_nchw(imgs), torch.from_numpy(msgs),
                               is_video=False)
        ours = jmodel.embed(jnp.asarray(imgs), jnp.asarray(msgs), is_video=False)
        ref_w = np.transpose(ref["imgs_w"].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours["imgs_w"]), ref_w, atol=2e-3)

        with torch.no_grad():
            ref_preds = tmodel.detect(_nchw(imgs), is_video=False)["preds"].numpy()
        our_preds = np.asarray(jmodel.detect(jnp.asarray(imgs))["preds"])
        np.testing.assert_allclose(our_preds, ref_preds, atol=2e-3)


class TestVideoPipeline:
    @pytest.mark.parametrize("video_mode", ["repeat", "alternate", "interpolate"])
    def test_embed_video_modes(self, models, video_mode):
        tmodel, jmodel = models
        tmodel.video_mode = video_mode
        import dataclasses
        jm = jmodel
        jm.cfg = dataclasses.replace(jm.cfg, video_mode=video_mode)
        jm._embed_fn = None  # force re-jit with the new static cfg
        from videoseal_tpu.models.videoseal import embed_pipeline
        import functools, jax
        jm._embed_fn = jax.jit(
            functools.partial(embed_pipeline, jm.embedder_spec.module,
                              jm.attenuation, jm.cfg),
            static_argnames=("is_video", "lowres_attenuation"))

        rng = np.random.default_rng(1)
        frames = rng.uniform(0, 1, (11, 40, 48, 3)).astype(np.float32)
        msgs = _msgs(1)
        with torch.no_grad():
            ref = tmodel.embed(_nchw(frames), torch.from_numpy(msgs),
                               is_video=True)
        ours = jm.embed(jnp.asarray(frames), jnp.asarray(msgs), is_video=True)
        ref_w = np.transpose(ref["imgs_w"].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours["imgs_w"]), ref_w, atol=2e-3)

    def test_extract_message(self, models):
        tmodel, jmodel = models
        tmodel.video_mode = "repeat"
        rng = np.random.default_rng(2)
        frames = rng.uniform(0, 1, (6, 40, 48, 3)).astype(np.float32)
        with torch.no_grad():
            ref_preds = tmodel.detect(_nchw(frames), is_video=True)["preds"]
            ref_msg = tmodel.extract_message(_nchw(frames)).numpy()
        our_preds = np.asarray(jmodel.detect(jnp.asarray(frames),
                                             is_video=True)["preds"])
        np.testing.assert_allclose(our_preds, ref_preds.numpy(), atol=2e-3)
        our_msg = np.asarray(jmodel.extract_message(jnp.asarray(frames)))
        np.testing.assert_array_equal(our_msg, ref_msg)

    def test_lowres_attenuation(self, models):
        tmodel, jmodel = models
        tmodel.video_mode = "repeat"
        rng = np.random.default_rng(3)
        frames = rng.uniform(0, 1, (4, 40, 48, 3)).astype(np.float32)
        msgs = _msgs(1)
        with torch.no_grad():
            ref = tmodel.embed(_nchw(frames), torch.from_numpy(msgs),
                               is_video=True, lowres_attenuation=True)
        ours = jmodel.embed(jnp.asarray(frames), jnp.asarray(msgs),
                            is_video=True, lowres_attenuation=True)
        ref_w = np.transpose(ref["imgs_w"].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours["imgs_w"]), ref_w, atol=2e-3)
