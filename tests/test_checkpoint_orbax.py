"""Orbax sharded TrainState checkpoints on an 8-device host mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_state():
    import optax
    from videoseal_tpu.augmentation.augmenter import get_dummy_augmenter
    from videoseal_tpu.losses.videosealloss import VideoSealLoss
    from videoseal_tpu.models.embedder import build_embedder
    from videoseal_tpu.models.extractor import build_extractor
    from videoseal_tpu.models.videoseal import PipelineConfig
    from videoseal_tpu.modules.discriminator import NLayerDiscriminator
    from videoseal_tpu.parallel.trainer import TrainerModules, create_train_state

    emb = build_embedder("unet_t_yuv", {
        "msg_processor": {"msg_processor_type": "binary+concat"},
        "unet": {"in_channels": 1, "out_channels": 1, "z_channels": 4,
                 "num_blocks": 1, "activation": "relu",
                 "normalization": "batch", "z_channels_mults": [1, 2],
                 "last_tanh": True}}, 4, 2)
    ext = build_extractor("convnext_tiny", {
        "encoder": {"depths": [1, 1, 1, 1], "dims": [8, 8, 8, 8]},
        "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                          "embed_dim": 8, "sigmoid_output": False}}, 32, 4)
    mods = TrainerModules(
        embedder=emb.module, extractor=ext.module,
        discriminator=NLayerDiscriminator(ndf=8, n_layers=1),
        augmenter=get_dummy_augmenter(), attenuation=None,
        cfg=PipelineConfig(img_size=32, yuv=True, nbits=4),
        loss=VideoSealLoss(balanced=False), balanced=False)
    og = optax.adam(1e-3)
    od = optax.adam(1e-3)
    return create_train_state(mods, og, od, seed=0, scaling_w=0.5)


class TestOrbaxCheckpoint:
    def test_save_restore_roundtrip(self, tiny_state, tmp_path):
        from videoseal_tpu.utils.checkpoint import (load_train_state_orbax,
                                                    save_train_state_orbax)
        state = tiny_state.replace(step=jnp.asarray(7))
        save_train_state_orbax(str(tmp_path / "ckpt"), state, keep=2)
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored, step = load_train_state_orbax(str(tmp_path / "ckpt"), template)
        assert step == 7
        a = jax.tree_util.tree_leaves(state.embedder_params)
        b = jax.tree_util.tree_leaves(restored.embedder_params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        np.testing.assert_allclose(float(restored.scaling_w), 0.5)

    def test_restore_with_replicated_sharding(self, tiny_state, tmp_path):
        """Restore into a mesh-replicated template: arrays come back with the
        template's sharding (the multi-host resume path)."""
        from videoseal_tpu.parallel.mesh import make_mesh, replicated
        from videoseal_tpu.utils.checkpoint import (load_train_state_orbax,
                                                    save_train_state_orbax)
        devs = jax.devices("cpu")
        if len(devs) < 8:
            pytest.skip("needs 8 host devices")
        save_train_state_orbax(str(tmp_path / "ckpt"), tiny_state, step=1)
        mesh = make_mesh(n_data=4, n_frames=2, devices=devs[:8])
        sh = replicated(mesh)
        template = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.zeros_like(x), sh), tiny_state)
        restored, _ = load_train_state_orbax(str(tmp_path / "ckpt"), template)
        leaf = jax.tree_util.tree_leaves(restored.embedder_params)[0]
        assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)
