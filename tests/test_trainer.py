"""Train-step tests: the full GAN step runs, losses decrease-ish, multi-device
data parallelism over a CPU mesh works (the DDP-replacement check)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from videoseal_tpu.augmentation.augmenter import build_augmenter, get_dummy_augmenter
from videoseal_tpu.losses.videosealloss import VideoSealLoss
from videoseal_tpu.models.embedder import build_embedder
from videoseal_tpu.models.extractor import build_extractor
from videoseal_tpu.models.videoseal import PipelineConfig
from videoseal_tpu.modules.discriminator import NLayerDiscriminator
from videoseal_tpu.modules.jnd import JND
from videoseal_tpu.parallel import mesh as pmesh
from videoseal_tpu.parallel.trainer import (TrainerModules, create_train_state,
                                            make_train_step)


NBITS, SIZE = 8, 32


def _modules(yuv=False, balanced=True, augs=None):
    emb = build_embedder("unet_tiny" + ("_yuv" if yuv else ""), {
        "msg_processor": {"msg_processor_type": "binary+concat"},
        "unet": {"in_channels": 1 if yuv else 3, "out_channels": 1 if yuv else 3,
                 "z_channels": 4, "num_blocks": 1, "activation": "relu",
                 "normalization": "batch", "z_channels_mults": [1, 2],
                 "last_tanh": True}}, NBITS, 2)
    ext = build_extractor("convnext_tiny", {
        "encoder": {"depths": [1, 1, 1, 1], "dims": [8, 16, 32, 64]},
        "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                          "embed_dim": 64, "sigmoid_output": False}}, SIZE, NBITS)
    cfg = PipelineConfig(img_size=SIZE, chunk_size=4, step_size=2,
                         yuv=yuv, nbits=NBITS)
    augmenter = (build_augmenter(augs) if augs else get_dummy_augmenter())
    return TrainerModules(
        embedder=emb.module, extractor=ext.module,
        discriminator=NLayerDiscriminator(ndf=8, n_layers=2),
        augmenter=augmenter, attenuation=JND(),
        cfg=cfg,
        loss=VideoSealLoss(balanced=balanced, total_norm=1.0, percep_loss="yuv",
                           decode_weight=1.0, detect_weight=0.0),
        balanced=balanced)


def _opts():
    return optax.adamw(1e-3), optax.adamw(1e-4)


class TestTrainStep:
    def test_image_step_runs_and_updates(self):
        mods = _modules()
        og, od = _opts()
        state = create_train_state(mods, og, od, seed=0)
        step = make_train_step(mods, og, od, is_video=False)
        rng = np.random.default_rng(0)
        batch = {"imgs": jnp.asarray(rng.uniform(0, 1, (4, SIZE, SIZE, 3)),
                                     jnp.float32)}
        p0 = np.asarray(state.embedder_params["unet"]["outc"]["kernel"])  # copy: state is donated
        state2, logs = step(state, batch, jax.random.PRNGKey(0))
        assert int(state2.step) == 1
        assert np.isfinite(float(logs["total_loss"]))
        assert np.isfinite(float(logs["disc_loss"]))
        assert "loss_percep" in logs and "loss_decode" in logs and "scale_decode" in logs
        p1 = state2.embedder_params["unet"]["outc"]["kernel"]
        assert float(jnp.abs(p1 - p0).max()) > 0  # params moved

    def test_decode_loss_decreases(self):
        """Few steps of bit-only training on a fixed batch should reduce the
        decoding loss (training sanity heuristic, docs/training.md:76-79)."""
        mods = _modules(balanced=False)
        og, od = optax.adam(3e-3), optax.adam(1e-4)
        state = create_train_state(mods, og, od, seed=1)
        step = make_train_step(mods, og, od, is_video=False)
        rng = np.random.default_rng(1)
        batch = {"imgs": jnp.asarray(rng.uniform(0, 1, (4, SIZE, SIZE, 3)),
                                     jnp.float32)}
        first = last = None
        for i in range(8):
            state, logs = step(state, batch, jax.random.PRNGKey(42))  # same msgs each step
            v = float(logs["loss_decode"])
            first = v if first is None else first
            last = v
        assert last < first

    def test_video_step(self):
        mods = _modules(yuv=True, augs={
            "augs": {"identity": 1, "h264": 1, "crop": 1},
            "augs_params": {"crop": {"min_size": 0.5, "max_size": 1.0}}})
        og, od = _opts()
        state = create_train_state(mods, og, od, seed=2)
        step = make_train_step(mods, og, od, is_video=True)
        rng = np.random.default_rng(2)
        batch = {"imgs": jnp.asarray(rng.uniform(0, 1, (2, 6, SIZE, SIZE, 3)),
                                     jnp.float32)}  # 2 videos x 6 frames
        state2, logs = step(state, batch, jax.random.PRNGKey(3))
        assert int(state2.step) == 1
        assert np.isfinite(float(logs["total_loss"]))
        assert 0.0 <= float(logs["bit_acc"]) <= 1.0


class TestMeshDataParallel:
    def test_8device_dp_matches_semantics(self):
        """Train step over an 8-device CPU mesh: batch sharded on 'data',
        params replicated; runs and produces finite metrics."""
        devs = jax.devices("cpu")
        assert len(devs) >= 8, "conftest must set xla_force_host_platform_device_count=8"
        mesh = pmesh.make_mesh(n_data=8, devices=devs[:8])
        mods = _modules()
        og, od = _opts()
        with jax.default_device(devs[0]):
            state = create_train_state(mods, og, od, seed=0)
        step = make_train_step(mods, og, od, is_video=False)
        rng = np.random.default_rng(0)
        batch = {"imgs": jnp.asarray(rng.uniform(0, 1, (16, SIZE, SIZE, 3)),
                                     jnp.float32)}
        with mesh:
            state_r = jax.device_put(state, pmesh.replicated(mesh))
            batch_s = pmesh.shard_batch(mesh, batch)
            state2, logs = step(state_r, batch_s, jax.random.PRNGKey(0))
        assert np.isfinite(float(logs["total_loss"]))
        # params stay replicated-consistent
        k = np.asarray(state2.extractor_params["pixel_decoder"]["linear"]["bias"])
        assert np.isfinite(k).all()
