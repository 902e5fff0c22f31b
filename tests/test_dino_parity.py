"""DinoViT parity vs transformers.Dinov2Model (offline oracle, random init).

The reference DinoExtractor (videoseal/models/extractor.py:72-110) uses
torch.hub dinov2 — architecturally identical to HF's Dinov2Model, which is
available in-image without network. We convert random-init torch weights into
the flax module and check the concatenated hooked feature maps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from videoseal_tpu.models.extractor import build_extractor
from videoseal_tpu.modules.dino import DinoViT


def _make_torch(dim=32, depth=4, heads=2, patch=14, image_size=28):
    cfg = transformers.Dinov2Config(
        hidden_size=dim, num_hidden_layers=depth, num_attention_heads=heads,
        intermediate_size=4 * dim, patch_size=patch, image_size=image_size,
        layerscale_value=1.0, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0, drop_path_rate=0.0)
    m = transformers.Dinov2Model(cfg).eval()
    # randomize layerscale so it actually participates in the parity check
    with torch.no_grad():
        for layer in m.encoder.layer:
            layer.layer_scale1.lambda1.uniform_(0.5, 1.5)
            layer.layer_scale2.lambda1.uniform_(0.5, 1.5)
    return m, cfg


def _convert(m, depth):
    """transformers Dinov2Model state -> DinoViT flax params."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    t = lambda a: np.ascontiguousarray(a.T)
    params = {
        "patch_embed": {
            "kernel": np.transpose(
                sd["embeddings.patch_embeddings.projection.weight"], (2, 3, 1, 0)),
            "bias": sd["embeddings.patch_embeddings.projection.bias"]},
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "norm": {"scale": sd["layernorm.weight"], "bias": sd["layernorm.bias"]},
    }
    for i in range(depth):
        p = f"encoder.layer.{i}."
        qw, kw, vw = (sd[p + f"attention.attention.{n}.weight"]
                      for n in ("query", "key", "value"))
        qb, kb, vb = (sd[p + f"attention.attention.{n}.bias"]
                      for n in ("query", "key", "value"))
        params[f"blocks_{i}"] = {
            "norm1": {"scale": sd[p + "norm1.weight"], "bias": sd[p + "norm1.bias"]},
            "norm2": {"scale": sd[p + "norm2.weight"], "bias": sd[p + "norm2.bias"]},
            "ls1": sd[p + "layer_scale1.lambda1"],
            "ls2": sd[p + "layer_scale2.lambda1"],
            "attn": {
                "qkv": {"kernel": np.concatenate([t(qw), t(kw), t(vw)], axis=1),
                        "bias": np.concatenate([qb, kb, vb])},
                "proj": {"kernel": t(sd[p + "attention.output.dense.weight"]),
                         "bias": sd[p + "attention.output.dense.bias"]},
            },
            "mlp_fc1": {"kernel": t(sd[p + "mlp.fc1.weight"]),
                        "bias": sd[p + "mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": t(sd[p + "mlp.fc2.weight"]),
                        "bias": sd[p + "mlp.fc2.bias"]},
        }
    return jax.tree_util.tree_map(jnp.asarray, params)


class TestDinoParity:
    @pytest.mark.parametrize("size,interp", [(28, False), (56, True)])
    def test_hooked_features(self, size, interp):
        torch.manual_seed(0)
        depth = 4
        hooks = (1, 3)
        m, cfg = _make_torch(depth=depth)
        params = _convert(m, depth)
        flax_mod = DinoViT(embed_dim=32, depth=depth, num_heads=2, patch_size=14,
                           pos_grid=cfg.image_size // cfg.patch_size,
                           hook_indices=hooks)

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)
        with torch.no_grad():
            out = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                    output_hidden_states=True)
            # hidden_states[0] is the embedding output; block i -> [i+1]
            feats = []
            g = size // 14
            for i in hooks:
                h = m.layernorm(out.hidden_states[i + 1])[:, 1:]
                feats.append(h.reshape(2, g, g, 32).numpy())
            ref = np.concatenate(feats, axis=-1)

        got = np.asarray(flax_mod.apply({"params": params}, jnp.asarray(x)))
        atol = 2e-4 if interp else 1e-4  # bicubic pos interp adds round-off
        np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)


class TestDinoRegistry:
    def test_build_and_run(self):
        spec = build_extractor("dino2_test", {
            "encoder": {"name": "dinov2_vits14", "hook_indices": [8, 11]},
            "pixel_decoder": {"pixelwise": True, "upscale_stages": [2],
                              "sigmoid_output": False}}, 224, 16)
        x = jnp.zeros((1, 28, 28, 3))
        v = spec.module.init(jax.random.PRNGKey(0), x)
        y = spec.module.apply(v, x)
        assert y.shape[0] == 1 and y.shape[-1] == 17


class TestDVMarkRegistry:
    def test_embedder_and_extractor_build(self):
        from videoseal_tpu.models.embedder import build_embedder
        es = build_embedder("dvmark", {}, 16, 2)
        xs = build_extractor("dvmark", {}, 64, 16)
        imgs = jnp.linspace(0, 1, 4 * 32 * 32 * 3).reshape(4, 32, 32, 3)
        msgs = jnp.ones((1, 16), jnp.int32)
        ev = es.module.init(jax.random.PRNGKey(0), imgs, msgs)
        w = es.module.apply(ev, imgs, msgs)
        assert w.shape == (4, 32, 32, 3)
        xv = xs.module.init(jax.random.PRNGKey(1), imgs)
        preds = xs.module.apply(xv, imgs)
        assert preds.shape == (4, 17)
