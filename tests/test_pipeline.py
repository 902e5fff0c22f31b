"""End-to-end pipeline tests: cards build, embed/detect/extract shapes and
semantics, video-mode expansion, checkpoint conversion plumbing."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import videoseal_tpu as vs
from videoseal_tpu.models.videoseal import _expand_video_mode, aggregate_message
from videoseal_tpu.utils import torch_convert as tc
from videoseal_tpu.utils import checkpoint as ckpt_io
from refloader import ref_module


def _frames(f, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(f, h, w, 3)).astype(np.float32)


class TestVideoMode:
    def _preds(self, n):
        rng = np.random.default_rng(1)
        return jnp.asarray(rng.normal(size=(n, 4, 4, 1)).astype(np.float32))

    def test_repeat(self):
        p = self._preds(3)
        out = np.asarray(_expand_video_mode(p, 10, 4, "repeat"))
        assert out.shape[0] == 10
        for i in range(10):
            np.testing.assert_array_equal(out[i], np.asarray(p)[i // 4])

    def test_alternate(self):
        p = self._preds(3)
        out = np.asarray(_expand_video_mode(p, 10, 4, "alternate"))
        np.testing.assert_array_equal(out[0], np.asarray(p)[0])
        np.testing.assert_array_equal(out[4], np.asarray(p)[1])
        assert np.all(out[1] == 0) and np.all(out[5] == 0)

    def test_interpolate(self):
        p = self._preds(3)
        out = np.asarray(_expand_video_mode(p, 12, 4, "interpolate"))
        pn = np.asarray(p)
        np.testing.assert_allclose(out[0], pn[0], atol=1e-6)
        # alpha = 1 - linspace(0,1,step): frame 2 of a step-4 gap is 1/3 p0 + 2/3 p1
        np.testing.assert_allclose(out[2], pn[0] / 3 + 2 * pn[1] / 3, atol=1e-6)
        np.testing.assert_allclose(out[4], pn[1], atol=1e-6)
        # tail beyond last interpolation filled with the last key frame
        np.testing.assert_allclose(out[8], pn[2], atol=1e-6)
        np.testing.assert_allclose(out[11], pn[2], atol=1e-6)

    def test_step1(self):
        p = self._preds(5)
        out = np.asarray(_expand_video_mode(p, 5, 1, "repeat"))
        np.testing.assert_array_equal(out, np.asarray(p))


class TestAggregation:
    def test_modes(self):
        rng = np.random.default_rng(0)
        preds = jnp.asarray(rng.normal(size=(6, 17)).astype(np.float32))
        for agg in ["avg", "squared_avg", "l1norm_avg", "l2norm_avg"]:
            msg = aggregate_message(preds, agg)
            assert msg.shape == (1, 16)
        raw = aggregate_message(preds, None)
        assert raw.shape == (6, 16)


@pytest.fixture(scope="module")
def tiny_card():
    """Miniature videoseal_1.0-style card for fast CPU tests."""
    return {
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


class TestPipeline:
    def test_image_embed_detect(self, tiny_card):
        model = vs.models.VideoSeal.from_card(tiny_card)
        imgs = jnp.asarray(_frames(2, 48, 40))
        out = model.embed(imgs, is_video=False)
        assert out["imgs_w"].shape == (2, 48, 40, 3)
        assert out["msgs"].shape == (2, 16)
        assert float(jnp.max(out["imgs_w"])) <= 1.0 and float(jnp.min(out["imgs_w"])) >= 0.0
        # watermarked differs from original but stays close
        d = np.abs(np.asarray(out["imgs_w"]) - np.asarray(imgs))
        assert 0 < d.max() < 0.5
        preds = model.detect(out["imgs_w"], is_video=False)["preds"]
        assert preds.shape == (2, 17)

    def test_video_embed_detect_extract(self, tiny_card):
        model = vs.models.VideoSeal.from_card(tiny_card)
        frames = jnp.asarray(_frames(11, 32, 32))  # 11 frames, step 2 -> 6 keys, chunk 4
        out = model.embed(frames, is_video=True)
        assert out["imgs_w"].shape == (11, 32, 32, 3)
        assert out["msgs"].shape == (11, 16)
        msg = model.extract_message(out["imgs_w"])
        assert msg.shape == (1, 16)

    def test_msgs_fixed(self, tiny_card):
        model = vs.models.VideoSeal.from_card(tiny_card)
        frames = jnp.asarray(_frames(4, 32, 32))
        msgs = jnp.asarray(np.tile([[0, 1] * 8], (1, 1)))
        out = model.embed(frames, msgs=msgs, is_video=True)
        np.testing.assert_array_equal(np.asarray(out["msgs"]),
                                      np.tile(np.asarray(msgs), (4, 1)))

    def test_scaling_w_zero_is_identity(self, tiny_card):
        model = vs.models.VideoSeal.from_card(tiny_card)
        model.scaling_w = 0.0
        imgs = jnp.asarray(_frames(1, 32, 32))
        out = model.embed(imgs, is_video=False)
        np.testing.assert_allclose(np.asarray(out["imgs_w"]), np.asarray(imgs), atol=1e-6)


class TestCards:
    @pytest.mark.parametrize("name", ["videoseal_1.0", "pixelseal", "chunkyseal",
                                      "videoseal_0.0"])
    def test_card_builds(self, name):
        model = vs.load(name)
        assert model.nbits == {"videoseal_1.0": 256, "pixelseal": 256,
                               "chunkyseal": 1024, "videoseal_0.0": 96}[name]
        img = jnp.asarray(_frames(1, 64, 64))
        out = model.embed(img, is_video=False)
        assert out["imgs_w"].shape == (1, 64, 64, 3)
        preds = model.detect(out["imgs_w"])["preds"]
        assert preds.shape == (1, 1 + model.nbits)


def _assemble_ref_modules(tiny_card):
    """Reference torch modules matching tiny_card (shared by conversion tests)."""
    ref_unet = ref_module("modules.unet")
    ref_msg = ref_module("modules.msg_processor")
    ref_cnx = ref_module("modules.convnext")
    ref_pd = ref_module("modules.pixel_decoder")
    torch.manual_seed(7)
    u = tiny_card["embedder"]["params"]["unet"]
    tmsg = ref_msg.MsgProcessor(16, 32, "binary+concat")
    tunet = ref_unet.UNetMsg(msg_processor=tmsg, in_channels=u["in_channels"],
                             out_channels=u["out_channels"], z_channels=u["z_channels"],
                             num_blocks=u["num_blocks"], activation=u["activation"],
                             normalization=u["normalization"],
                             z_channels_mults=u["z_channels_mults"])
    e = tiny_card["extractor"]["params"]["encoder"]
    tcnx = ref_cnx.ConvNeXtV2(in_chans=3, depths=e["depths"], dims=e["dims"])
    tpd = ref_pd.PixelDecoder(embed_dim=64, nbits=16, upscale_stages=[1],
                              upscale_type="bilinear", pixelwise=False)
    sd = {}
    sd.update({f"embedder.unet.{k}": v for k, v in tunet.state_dict().items()})
    sd.update({f"embedder.msg_processor.{k}": v for k, v in tmsg.state_dict().items()})
    sd.update({f"detector.convnext.{k}": v for k, v in tcnx.state_dict().items()})
    sd.update({f"detector.pixel_decoder.{k}": v for k, v in tpd.state_dict().items()})
    return tunet, tmsg, tcnx, tpd, sd


def _write_preset_configs(tiny_card, tmp_path):
    """Preset yaml files for bare-checkpoint config resolution."""
    import yaml

    epath = str(tmp_path / "embedder.yaml")
    xpath = str(tmp_path / "extractor.yaml")
    with open(epath, "w") as f:
        yaml.safe_dump({"model": tiny_card["embedder"]["model"],
                        tiny_card["embedder"]["model"]: tiny_card["embedder"]["params"]}, f)
    with open(xpath, "w") as f:
        yaml.safe_dump({"model": tiny_card["extractor"]["model"],
                        tiny_card["extractor"]["model"]: tiny_card["extractor"]["params"]}, f)
    return epath, xpath


class TestFullCheckpointConversion:
    def test_pth_roundtrip(self, tiny_card, tmp_path):
        """Assemble a reference-style .pth (embedder.unet.* / detector.*),
        load it through the card path, verify forward parity per component."""
        tunet, tmsg, tcnx, tpd, sd = _assemble_ref_modules(tiny_card)
        path = str(tmp_path / "ckpt.pth")
        torch.save({"model": sd, "args": {}}, path)

        model = vs.models.VideoSeal.from_card(tiny_card, checkpoint=path)

        # embedder parity
        tunet.eval()
        x = torch.rand(2, 1, 32, 32) * 2 - 1
        msgs = torch.randint(0, 2, (2, 16))
        with torch.no_grad():
            ref_out = tunet(x, msgs).permute(0, 2, 3, 1).numpy()
        ours = model.embedder_spec.module.apply(
            model.embedder_vars, jnp.asarray((x.permute(0, 2, 3, 1).numpy() + 1) / 2),
            jnp.asarray(msgs.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)

        # extractor parity (64x64 -> 2x2 features; torch reflect-pad needs >1)
        tcnx.eval(); tpd.eval()
        y = torch.rand(2, 3, 64, 64)
        with torch.no_grad():
            ref_preds = tpd(tcnx(y * 2 - 1)).numpy()
        ours_preds = model.extractor_spec.module.apply(
            model.extractor_vars, jnp.asarray(y.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(np.asarray(ours_preds), ref_preds, atol=1e-4)

        # native .npz round trip
        npz = str(tmp_path / "ckpt.npz")
        ckpt_io.save_npz(npz, model.embedder_vars, model.extractor_vars)
        model2 = vs.models.VideoSeal.from_card(tiny_card, checkpoint=npz)
        ours2 = model2.extractor_spec.module.apply(
            model2.extractor_vars, jnp.asarray(y.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(np.asarray(ours2), np.asarray(ours_preds), atol=1e-6)


class TestBareCheckpointLoad:
    """Rebuild a model from a checkpoint's embedded args — no card named
    (parity: utils/cfg.py:52-85 get_config_from_checkpoint, :156-178)."""

    def _bare_args(self, tiny_card, epath, xpath):
        return {**tiny_card["args"],
                "embedder_config": epath, "extractor_config": xpath,
                "embedder_model": tiny_card["embedder"]["model"],
                "extractor_model": tiny_card["extractor"]["model"]}

    def test_npz_bare_load(self, tiny_card, tmp_path):
        model = vs.models.VideoSeal.from_card(tiny_card)
        epath, xpath = _write_preset_configs(tiny_card, tmp_path)
        npz = str(tmp_path / "bare.npz")
        ckpt_io.save_npz(npz, model.embedder_vars, model.extractor_vars,
                         args=self._bare_args(tiny_card, epath, xpath))
        model2 = vs.load(npz)  # no card named
        assert model2.cfg == model.cfg
        assert model2.scaling_w == model.scaling_w
        imgs = jnp.asarray(_frames(2, 32, 32, seed=3))
        p1 = np.asarray(model.detect(imgs)["preds"])
        p2 = np.asarray(model2.detect(imgs)["preds"])
        np.testing.assert_allclose(p2, p1, atol=1e-6)

    def test_pth_bare_load(self, tiny_card, tmp_path):
        """Reference-style train checkpoint: args stored as a YAML string."""
        import yaml

        tunet, tmsg, tcnx, tpd, sd = _assemble_ref_modules(tiny_card)
        epath, xpath = _write_preset_configs(tiny_card, tmp_path)
        path = str(tmp_path / "train_ckpt.pth")
        torch.save({"model": sd,
                    "args": yaml.safe_dump(self._bare_args(tiny_card, epath, xpath))},
                   path)
        model = vs.load(path)
        assert model.cfg.nbits == 16 and model.cfg.img_size == 32
        assert model.cfg.yuv is True
        tunet.eval()
        x = torch.rand(2, 1, 32, 32) * 2 - 1
        msgs = torch.randint(0, 2, (2, 16))
        with torch.no_grad():
            ref_out = tunet(x, msgs).permute(0, 2, 3, 1).numpy()
        ours = model.embedder_spec.module.apply(
            model.embedder_vars, jnp.asarray((x.permute(0, 2, 3, 1).numpy() + 1) / 2),
            jnp.asarray(msgs.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-4)
