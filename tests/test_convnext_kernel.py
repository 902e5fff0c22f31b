"""Fused ConvNeXt block kernel vs the linen module (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoseal_tpu.modules.convnext import ConvNeXtBlock
from videoseal_tpu.kernels.convnext_block import convnext_block_fused, supports_block


class TestConvNeXtKernel:
    @pytest.mark.parametrize("c,hw", [(96, 16), (32, 24)])
    def test_matches_module(self, c, hw):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, hw, hw, c)).astype(np.float32))
        blk = ConvNeXtBlock(c)
        v = blk.init(jax.random.PRNGKey(0), x)
        # randomize GRN (zero-init would hide bugs)
        p = jax.tree_util.tree_map(lambda a: a, v["params"])
        p["grn"]["gamma"] = jnp.asarray(rng.normal(size=(4 * c,)).astype(np.float32)) * 0.1
        p["grn"]["beta"] = jnp.asarray(rng.normal(size=(4 * c,)).astype(np.float32)) * 0.1
        ref = blk.apply({"params": p}, x)
        out = convnext_block_fused(x, p, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)  # bf16 matmuls inside

    def test_bf16_input(self):
        rng = np.random.default_rng(1)
        x32 = jnp.asarray(rng.normal(size=(1, 16, 16, 32)).astype(np.float32))
        blk = ConvNeXtBlock(32)
        v = blk.init(jax.random.PRNGKey(0), x32)
        x16 = x32.astype(jnp.bfloat16)
        p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v["params"])
        out = convnext_block_fused(x16, p16, interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = blk.apply({"params": v["params"]}, x32)
        diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
        assert diff.max() < 0.25  # bf16 end-to-end tolerance

    @pytest.mark.parametrize("fps", [2, 4])
    def test_multiframe_matches_single(self, fps):
        """fps>1 batches frames per grid step; GRN stats must stay per-frame."""
        rng = np.random.default_rng(2)
        c, hw = 32, 16
        x = jnp.asarray(rng.normal(size=(4, hw, hw, c)).astype(np.float32))
        blk = ConvNeXtBlock(c)
        v = blk.init(jax.random.PRNGKey(0), x)
        p = dict(v["params"])
        p["grn"] = {
            "gamma": jnp.asarray(rng.normal(size=(4 * c,)).astype(np.float32)) * 0.1,
            "beta": jnp.asarray(rng.normal(size=(4 * c,)).astype(np.float32)) * 0.1,
        }
        ref = blk.apply({"params": p}, x)
        out = convnext_block_fused(x, p, interpret=True, fps=fps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=5e-2)
        one = convnext_block_fused(x, p, interpret=True, fps=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(one),
                                   atol=1e-3, rtol=1e-3)

    def test_supports(self):
        assert supports_block(64, 64, 96)
        assert supports_block(32, 32, 192)
        assert not supports_block(256, 256, 96)  # too big for VMEM

    def test_frames_per_step(self):
        from videoseal_tpu.kernels.convnext_block import frames_per_step
        assert frames_per_step(128, 64, 64, 96) == 1   # stage0: VMEM-bound
        assert frames_per_step(128, 32, 32, 192) >= 2  # deeper stages batch
        # deepest stage: pw weights alone are ~9.4MB of VMEM, so only 2 fit
        assert frames_per_step(128, 8, 8, 768) >= 2
        assert frames_per_step(3, 32, 32, 192) == 1    # must divide B


class TestFusedForward:
    def test_full_extractor_parity(self):
        """convnext_apply_fused (XLA fallback on CPU sizes) vs the module."""
        import videoseal_tpu.models  # noqa
        from videoseal_tpu.models.extractor import build_extractor
        from videoseal_tpu.kernels.convnext_fused import convnext_apply_fused
        from videoseal_tpu.modules.pixel_decoder import PixelDecoder
        rng = np.random.default_rng(0)
        spec = build_extractor("convnext_tiny", {
            "encoder": {"depths": [1, 1, 1, 1], "dims": [8, 16, 32, 64]},
            "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                              "embed_dim": 64, "sigmoid_output": False}}, 64, 8)
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
        v = spec.module.init(jax.random.PRNGKey(0), x)
        ref = spec.module.apply(v, x)
        feats = convnext_apply_fused(v["params"]["encoder"], x * 2 - 1,
                                     depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                                     interpret=True)
        out = PixelDecoder(**spec.module.pixel_decoder).apply(
            {"params": v["params"]["pixel_decoder"]}, feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    def test_max_block_group_parity(self):
        """convnext_apply_fused(max_block_group=4) == the default k=1 path.
        The grouping measured NEGATIVE end-to-end (round-4 ledger) so the
        production default stays 1, but the knob stays available — this
        covers the plumbing the probes (r4_probe) exercise."""
        from videoseal_tpu.kernels.convnext_fused import convnext_apply_fused
        from videoseal_tpu.modules.convnext import ConvNeXtV2
        rng = np.random.default_rng(11)
        depths, dims = (2, 2, 2, 2), (8, 16, 32, 64)
        enc = ConvNeXtV2(depths=depths, dims=dims)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
        v = enc.init(jax.random.PRNGKey(0), x)
        kw = dict(depths=depths, dims=dims, interpret=True)
        ref = convnext_apply_fused(v["params"], x, max_block_group=1, **kw)
        got = convnext_apply_fused(v["params"], x, max_block_group=4, **kw)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=2e-2, rtol=2e-2)


class TestMultiBlockKernel:
    @pytest.mark.parametrize("k", [2, 3])
    def test_multi_matches_sequential(self, k):
        """k blocks fused in one pallas_call == k sequential single-block
        calls (the intermediate re-pad must reproduce the 3-px zero halo)."""
        from videoseal_tpu.kernels.convnext_block import convnext_blocks_fused
        rng = np.random.default_rng(7)
        c, hw = 32, 16
        x = jnp.asarray(rng.normal(size=(2, hw, hw, c)),
                        jnp.float32).astype(jnp.bfloat16)
        plist = []
        for j in range(k):
            blk = ConvNeXtBlock(c)
            v = blk.init(jax.random.PRNGKey(j), x.astype(jnp.float32))
            p = v["params"]
            p["grn"]["gamma"] = jnp.asarray(
                rng.normal(size=(4 * c,)), jnp.float32) * 0.1
            p["grn"]["beta"] = jnp.asarray(
                rng.normal(size=(4 * c,)), jnp.float32) * 0.1
            plist.append(p)
        ref = x
        for p in plist:
            ref = convnext_block_fused(ref, p, interpret=True)
        got = convnext_blocks_fused(x, tuple(plist), interpret=True, k=k)
        diff = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
        assert diff.max() < 2e-2, diff.max()

    def test_blocks_per_step_budget(self):
        from videoseal_tpu.kernels.convnext_block import blocks_per_step
        # deep stages can afford several resident weight sets
        assert blocks_per_step(16, 16, 384, 2, 9) >= 2
        # k never exceeds the stage depth
        assert blocks_per_step(16, 16, 384, 2, 1) == 1
