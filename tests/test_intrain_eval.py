"""In-training eval parity: video modality rows, mask x aug sweep, and
mask-aware localization metrics (reference train.py:718-882,
evals/metrics.py:66-178)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from videoseal_tpu.augmentation.augmenter import get_dummy_augmenter
from videoseal_tpu.evals.intrain import make_intrain_eval
from videoseal_tpu.losses.videosealloss import VideoSealLoss
from videoseal_tpu.models.embedder import build_embedder
from videoseal_tpu.models.extractor import build_extractor
from videoseal_tpu.models.videoseal import PipelineConfig
from videoseal_tpu.modules.discriminator import NLayerDiscriminator
from videoseal_tpu.modules.jnd import JND
from videoseal_tpu.parallel.trainer import TrainerModules, create_train_state

NBITS, SIZE = 8, 32


def _modules(pixelwise=False):
    emb = build_embedder("unet_tiny", {
        "msg_processor": {"msg_processor_type": "binary+concat"},
        "unet": {"in_channels": 3, "out_channels": 3,
                 "z_channels": 4, "num_blocks": 1, "activation": "relu",
                 "normalization": "batch", "z_channels_mults": [1, 2],
                 "last_tanh": True}}, NBITS, 2)
    ext = build_extractor("convnext_tiny", {
        "encoder": {"depths": [1, 1, 1, 1], "dims": [8, 16, 32, 64]},
        "pixel_decoder": {"pixelwise": pixelwise, "upscale_stages": [1],
                          "embed_dim": 64, "sigmoid_output": False}},
        SIZE, NBITS)
    cfg = PipelineConfig(img_size=SIZE, chunk_size=4, step_size=2,
                         yuv=False, nbits=NBITS)
    return TrainerModules(
        embedder=emb.module, extractor=ext.module,
        discriminator=NLayerDiscriminator(ndf=8, n_layers=2),
        augmenter=get_dummy_augmenter(), attenuation=JND(),
        cfg=cfg,
        loss=VideoSealLoss(balanced=False, total_norm=1.0, percep_loss="yuv",
                           decode_weight=1.0, detect_weight=0.0))


def _state(mods, seed=0):
    return create_train_state(mods, optax.adamw(1e-3), optax.adamw(1e-4),
                              seed=seed)


class TestVideoEval:
    def test_video_rows(self):
        """(V,F,H,W,3) clips run through the temporal embed path and every
        grid row scores all frames (reference eval_one_epoch video branch)."""
        mods = _modules()
        state = _state(mods)
        fn = make_intrain_eval(mods, eval_augs="identity", is_video=True)
        rng = np.random.default_rng(0)
        clips = rng.uniform(0.2, 0.8, (2, 4, SIZE, SIZE, 3)).astype(np.float32)
        scalars, imgs_w = fn(state, clips, jax.random.PRNGKey(0))
        assert imgs_w.shape == clips.shape
        assert np.isfinite(scalars["psnr"]) and np.isfinite(scalars["ssim"])
        assert 0.0 <= scalars["bit_acc_identity_0"] <= 1.0

    def test_video_grid_has_codec_row(self):
        """is_video=True sweeps the VIDEO validation grid (ref train.py:538):
        the subset grid's codec row (h264, jittable proxy) replaces the image
        grid's jpeg row, and temporal codec rows are applied per clip."""
        mods = _modules()
        state = _state(mods)
        fn = make_intrain_eval(mods, eval_augs="subset", is_video=True)
        rng = np.random.default_rng(3)
        clips = rng.uniform(0.2, 0.8, (2, 4, SIZE, SIZE, 3)).astype(np.float32)
        scalars, _ = fn(state, clips, jax.random.PRNGKey(0))
        assert "bit_acc_h264_30" in scalars, sorted(scalars)
        assert "bit_acc_jpeg_60" not in scalars
        assert np.isfinite(scalars["bit_acc_h264_30"])

    def test_video_propagation_matches_step_size(self):
        """Non-key frames carry the key frame's watermark (video_mode
        'repeat'): frames inside a step group get identical deltas."""
        mods = _modules()
        state = _state(mods)
        fn = make_intrain_eval(mods, eval_augs="identity", is_video=True)
        rng = np.random.default_rng(1)
        base = rng.uniform(0.3, 0.7, (1, 1, SIZE, SIZE, 3)).astype(np.float32)
        clips = np.repeat(base, 4, axis=1)  # identical frames
        _, imgs_w = fn(state, clips, jax.random.PRNGKey(0))
        w = np.asarray(imgs_w)[0]
        # step_size=2: frames (0,1) share a key, (2,3) share a key
        np.testing.assert_allclose(w[0], w[1], atol=1e-5)
        np.testing.assert_allclose(w[2], w[3], atol=1e-5)


class TestMaskSweep:
    def test_mask_rows_and_localization(self):
        """With validation masks + lambda_det>0 + a pixelwise extractor, the
        sweep logs per-mask bit_acc rows plus acc/miou localization rows."""
        mods = _modules(pixelwise=True)
        state = _state(mods)
        half = np.zeros((SIZE, SIZE), np.float32)
        half[:, : SIZE // 2] = 1.0
        fn = make_intrain_eval(mods, eval_augs="identity", lambda_det=1.0,
                               validation_masks=[np.ones((SIZE, SIZE)), half])
        rng = np.random.default_rng(2)
        imgs = rng.uniform(0.2, 0.8, (2, SIZE, SIZE, 3)).astype(np.float32)
        scalars, _ = fn(state, imgs, jax.random.PRNGKey(0))
        assert "bit_acc_identity_0" in scalars            # mask 0 (ones)
        assert "bit_acc_identity_0_mask1" in scalars      # mask 1 (half)
        assert "acc_identity_0" in scalars
        assert "miou_identity_0" in scalars
        assert "miou_identity_0_mask1" in scalars
        for v in scalars.values():
            assert np.isfinite(v)

    def test_pixelwise_bitacc_is_mask_selected(self):
        """Pixelwise bit accuracy must select by mask (metrics.py:150-178),
        not mean-pool unmasked: with preds correct only inside the mask,
        masked accuracy is 1.0 while the unmasked pool is wrong."""
        from videoseal_tpu.ops.metrics import bit_accuracy
        b, hw, k = 1, 8, NBITS
        msgs = jnp.asarray(np.tile([1, 0, 1, 0, 1, 0, 1, 0], (b, 1)))
        good = (msgs[:, None, None, :] * 2.0 - 1.0)      # +1/-1 logits
        preds = jnp.where(
            (jnp.arange(hw) < 4)[None, :, None, None], good,
            -good)                                       # bottom half flipped
        preds = jnp.broadcast_to(preds, (b, hw, hw, k))
        mask = (jnp.arange(hw) < 4).astype(jnp.float32)[None, :, None, None]
        mask = jnp.broadcast_to(mask, (b, hw, hw, 1))
        acc_masked = float(bit_accuracy(preds, msgs, mask=mask)[0])
        assert acc_masked == 1.0
        # unmasked: each bit's pixel mean is exactly 0.5 -> decoded 0s
        acc_unmasked = float(bit_accuracy(preds, msgs)[0])
        assert acc_unmasked == 0.5

    def test_no_det_metrics_for_global_extractor(self):
        """(B, K) preds have no spatial detection channel: no acc/miou rows
        even when lambda_det > 0."""
        mods = _modules(pixelwise=False)
        state = _state(mods)
        fn = make_intrain_eval(mods, eval_augs="identity", lambda_det=1.0)
        rng = np.random.default_rng(3)
        imgs = rng.uniform(0.2, 0.8, (2, SIZE, SIZE, 3)).astype(np.float32)
        scalars, _ = fn(state, imgs, jax.random.PRNGKey(0))
        assert "bit_acc_identity_0" in scalars
        assert not any(k.startswith(("acc_", "miou_")) for k in scalars)
