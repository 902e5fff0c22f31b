"""Numerical parity of neural modules vs the PyTorch reference.

Strategy (SURVEY.md §4): instantiate the reference torch module with random
init, convert its state_dict with utils/torch_convert, run both on identical
inputs, compare outputs. This validates both the module math and the
checkpoint converter — the same path real released checkpoints take.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from refloader import ref_module
from videoseal_tpu.modules.msg_processor import MsgProcessor
from videoseal_tpu.modules.unet import UNetMsg
from videoseal_tpu.modules.convnext import ConvNeXtV2
from videoseal_tpu.modules.pixel_decoder import PixelDecoder
from videoseal_tpu.modules.jnd import JND
from videoseal_tpu.utils import torch_convert as tc


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().permute(0, 2, 3, 1).numpy()


def _sd(mod) -> dict:
    return {k: v.numpy() for k, v in mod.state_dict().items()}


class TestMsgProcessor:
    @pytest.mark.parametrize("agg", ["concat", "add"])
    def test_binary(self, agg):
        ref = ref_module("modules.msg_processor")
        torch.manual_seed(0)
        nbits, hidden = 16, 32
        tm = ref.MsgProcessor(nbits, hidden, f"binary+{agg}")
        lat = torch.randn(2, hidden if agg == "add" else 8, 4, 4)
        msgs = torch.randint(0, 2, (2, nbits))
        out_ref = _nhwc(tm(lat, msgs))

        m = MsgProcessor(nbits, hidden, f"binary+{agg}")
        params = {"params": {"msg_embeddings": _sd(tm)["msg_embeddings.weight"]}}
        out = m.apply(params, jnp.asarray(_nhwc(lat)), jnp.asarray(msgs.numpy()))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)

    def test_gaussian(self):
        ref = ref_module("modules.msg_processor")
        torch.manual_seed(1)
        tm = ref.MsgProcessor(8, 16, "gaussian+add")
        lat = torch.randn(2, 16, 4, 4)
        msgs = torch.randn(2, 8)
        out_ref = _nhwc(tm(lat, msgs))
        m = MsgProcessor(8, 16, "gaussian+add")
        params = {"params": {"msg_embeddings": _sd(tm)["msg_embeddings.weight"]}}
        out = m.apply(params, jnp.asarray(_nhwc(lat)), jnp.asarray(msgs.numpy()))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)


class TestUNetMsg:
    @pytest.mark.parametrize("norm,act", [("batch", "relu"), ("rms", "silu"),
                                          ("group", "gelu"), ("layer", "leakyrelu")])
    def test_parity(self, norm, act):
        ref_unet = ref_module("modules.unet")
        ref_msg = ref_module("modules.msg_processor")
        torch.manual_seed(0)
        nbits, hidden = 16, 32
        mults = (1, 2, 4)
        tmsg = ref_msg.MsgProcessor(nbits, hidden, "binary+concat")
        tm = ref_unet.UNetMsg(
            msg_processor=tmsg, in_channels=3, out_channels=3, z_channels=8,
            num_blocks=2, activation=act, normalization=norm,
            z_channels_mults=mults, last_tanh=True)
        tm.eval()

        imgs = torch.rand(2, 3, 32, 32) * 2 - 1
        msgs = torch.randint(0, 2, (2, nbits))
        with torch.no_grad():
            out_ref = _nhwc(tm(imgs, msgs))

        m = UNetMsg(nbits=nbits, hidden_size=hidden, in_channels=3, out_channels=3,
                    z_channels=8, num_blocks=2, activation=act, normalization=norm,
                    z_channels_mults=mults)
        variables = tc.convert_unet_msg(_sd(tm), normalization=norm,
                                        n_levels=len(mults), num_blocks=2)
        out = m.apply(variables, jnp.asarray(_nhwc(imgs)), jnp.asarray(msgs.numpy()))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4)


class TestConvNeXt:
    def test_parity(self):
        ref = ref_module("modules.convnext")
        torch.manual_seed(0)
        depths, dims = [1, 1, 2, 1], [16, 32, 64, 128]
        tm = ref.ConvNeXtV2(in_chans=3, depths=depths, dims=dims)
        tm.eval()
        imgs = torch.rand(2, 3, 64, 64) * 2 - 1
        with torch.no_grad():
            out_ref = _nhwc(tm(imgs))
        m = ConvNeXtV2(depths=depths, dims=dims)
        variables = tc.convert_convnext(_sd(tm), depths=depths)
        out = m.apply(variables, jnp.asarray(_nhwc(imgs)))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4)

    def test_temporal_attention(self):
        # per-block TemporalBlock (convnext.py:37-39,51-53): frames = batch dim
        ref = ref_module("modules.convnext")
        torch.manual_seed(2)
        depths, dims = [1, 1, 1, 1], [48, 96, 192, 384]
        tm = ref.ConvNeXtV2(in_chans=3, depths=depths, dims=dims,
                            temporal_attention=True)
        tm.eval()
        imgs = torch.rand(4, 3, 32, 32) * 2 - 1  # 4 frames
        with torch.no_grad():
            out_ref = _nhwc(tm(imgs))
        m = ConvNeXtV2(depths=depths, dims=dims, temporal_attention=True)
        variables = tc.convert_convnext(_sd(tm), depths=depths)
        out = m.apply(variables, jnp.asarray(_nhwc(imgs)))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-4)

    def test_stem_stride2(self):
        ref = ref_module("modules.convnext")
        torch.manual_seed(1)
        depths, dims = [1, 1, 1, 1], [8, 16, 32, 64]
        tm = ref.ConvNeXtV2(in_chans=3, depths=depths, dims=dims, stem_stride=2)
        tm.eval()
        imgs = torch.rand(1, 3, 64, 64)
        with torch.no_grad():
            out_ref = _nhwc(tm(imgs))
        m = ConvNeXtV2(depths=depths, dims=dims, stem_stride=2)
        variables = tc.convert_convnext(_sd(tm), depths=depths)
        out = m.apply(variables, jnp.asarray(_nhwc(imgs)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4)


class TestPixelDecoder:
    @pytest.mark.parametrize("pixelwise,stages", [(False, [1]), (True, [4, 2, 2]), (False, [2, 2])])
    def test_parity(self, pixelwise, stages):
        ref = ref_module("modules.pixel_decoder")
        torch.manual_seed(0)
        embed_dim, nbits = 64, 8
        tm = ref.PixelDecoder(embed_dim=embed_dim, nbits=nbits, upscale_stages=stages,
                              upscale_type="bilinear", pixelwise=pixelwise)
        tm.eval()
        x = torch.randn(2, embed_dim, 8, 8)
        with torch.no_grad():
            out_t = tm(x)
        out_ref = _nhwc(out_t) if pixelwise else out_t.numpy()
        m = PixelDecoder(embed_dim=embed_dim, nbits=nbits, upscale_stages=stages,
                         pixelwise=pixelwise)
        variables = tc.convert_pixel_decoder(_sd(tm), n_stages=len(stages), pixelwise=pixelwise)
        out = m.apply(variables, jnp.asarray(_nhwc(x)))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4)


class TestJND:
    @pytest.mark.parametrize("in_c,out_c", [(1, 3), (3, 3), (3, 1), (1, 1)])
    def test_heatmaps(self, in_c, out_c):
        ref = ref_module("modules.jnd")
        tj = ref.JND(in_channels=in_c, out_channels=out_c)
        imgs = torch.rand(2, 3, 32, 32)
        with torch.no_grad():
            h_ref = _nhwc(tj.heatmaps(imgs))
        j = JND(in_channels=in_c, out_channels=out_c)
        h = j.heatmaps(jnp.asarray(_nhwc(imgs)))
        np.testing.assert_allclose(np.asarray(h), h_ref, atol=1e-5)

    def test_forward(self):
        ref = ref_module("modules.jnd")
        tj = ref.JND(in_channels=1, out_channels=3)
        imgs = torch.rand(1, 3, 32, 32)
        imgs_w = (imgs + 0.1 * torch.randn_like(imgs)).clamp(0, 1)
        with torch.no_grad():
            out_ref = _nhwc(tj(imgs, imgs_w))
        j = JND(in_channels=1, out_channels=3)
        out = j(jnp.asarray(_nhwc(imgs)), jnp.asarray(_nhwc(imgs_w)))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)
