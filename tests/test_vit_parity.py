"""SAM-ViT extractor parity + videoseal_0.0-style checkpoint conversion."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from refloader import ref_module
from videoseal_tpu.modules.vit import ImageEncoderViT
from videoseal_tpu.utils import torch_convert as tc


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


VIT_KW = dict(img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2,
              out_chans=32, mlp_ratio=2.0, qkv_bias=True, use_rel_pos=True,
              window_size=0, global_attn_indexes=(0, 1))


class TestViTParity:
    def test_encoder_matches_reference(self):
        ref = ref_module("modules.vit")
        torch.manual_seed(0)
        tm = ref.ImageEncoderViT(
            img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            out_chans=32, mlp_ratio=2.0, qkv_bias=True, use_rel_pos=True,
            window_size=0, global_attn_indexes=(0, 1))
        tm.eval()
        # randomize the zero-initialized pos embeddings so parity is meaningful
        with torch.no_grad():
            tm.pos_embed.normal_(0, 0.02)
            for blk in tm.blocks:
                blk.attn.rel_pos_h.normal_(0, 0.02)
                blk.attn.rel_pos_w.normal_(0, 0.02)
        x = torch.rand(2, 3, 32, 32) * 2 - 1
        with torch.no_grad():
            out_ref = _nhwc(tm(x))

        m = ImageEncoderViT(**VIT_KW)
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        variables = tc.convert_vit(sd, depth=2)
        out = m.apply(variables, jnp.asarray(_nhwc(x)))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-4)

    def test_windowed_attention_matches(self):
        ref = ref_module("modules.vit")
        torch.manual_seed(1)
        tm = ref.ImageEncoderViT(
            img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
            out_chans=32, mlp_ratio=2.0, qkv_bias=True, use_rel_pos=True,
            window_size=3, global_attn_indexes=(1,))  # 4x4 grid, pad to 6
        tm.eval()
        with torch.no_grad():
            tm.pos_embed.normal_(0, 0.02)
            for blk in tm.blocks:
                blk.attn.rel_pos_h.normal_(0, 0.02)
                blk.attn.rel_pos_w.normal_(0, 0.02)
        x = torch.rand(1, 3, 32, 32) * 2 - 1
        with torch.no_grad():
            out_ref = _nhwc(tm(x))
        m = ImageEncoderViT(img_size=32, patch_size=8, embed_dim=32, depth=2,
                            num_heads=2, out_chans=32, mlp_ratio=2.0,
                            qkv_bias=True, use_rel_pos=True, window_size=3,
                            global_attn_indexes=(1,))
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        variables = tc.convert_vit(sd, depth=2)
        out = m.apply(variables, jnp.asarray(_nhwc(x)))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-4)
