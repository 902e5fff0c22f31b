"""VGG16-family perceptual losses vs the reference loss code (random-init).

watson_vgg / dists oracles are the REAL reference modules
(videoseal/losses/{watson_vgg,dists}.py) running on a random-init VGG16 (the
torchvision stub in refloader). LPIPS's oracle is the lpips-package forward
reconstructed in torch (the package is not in-image; its forward is ~15 lines:
scaling layer -> VGG taps -> unit-norm -> squared diff -> 1x1 lin -> spatial
mean). Weight conversion goes through videoseal_tpu.tools.convert_lpips — the
same code a user runs on real weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from refloader import ref_module
from videoseal_tpu.losses.lpips import DISTS, LPIPS, WatsonDistanceVgg
from videoseal_tpu.tools import convert_lpips as conv


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _imgs(seed, n=2, size=64):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, 3, size, size)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.03, x.shape).astype(np.float32), 0, 1)
    return x, y


def _nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


class TestWatsonVgg:
    def test_parity(self):
        ref = ref_module("losses.watson_vgg")
        torch.manual_seed(0)
        tm = ref.WatsonDistanceVgg(reduction="none").eval()
        # randomize sensitivity params so they participate
        with torch.no_grad():
            for l in range(5):
                getattr(tm, f"t{l}_tild").uniform_(-0.5, 0.5)
                getattr(tm, f"w{l}_tild").uniform_(-2.0, 0.0)
            tm.beta.fill_(1.2)
        x, y = _imgs(0)
        with torch.no_grad():
            ref_out = tm(torch.from_numpy(x), torch.from_numpy(y)).numpy()
        params = conv.convert_watson_vgg(_sd(tm))
        got = WatsonDistanceVgg().apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(_nhwc(x)), jnp.asarray(_nhwc(y)))
        np.testing.assert_allclose(np.asarray(got), ref_out, rtol=2e-3, atol=2e-3)


class TestDISTS:
    def test_parity(self):
        ref = ref_module("losses.dists")
        torch.manual_seed(0)
        tm = ref.DISTS().eval()  # random alpha/beta ~ N(0.1, 0.01)
        x, y = _imgs(1)
        with torch.no_grad():
            ref_out = tm(torch.from_numpy(x), torch.from_numpy(y)).numpy()
        params = conv.convert_dists(None, _sd(tm))
        got = DISTS().apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(_nhwc(x)), jnp.asarray(_nhwc(y)))
        np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-3, atol=1e-4)


class TestLPIPS:
    def _torch_lpips(self, vgg_features, lins, x, y):
        """The lpips package forward (net='vgg', normalize=False, spatial=False)."""
        import torch.nn.functional as F
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        taps = {3, 8, 15, 22, 29}  # relu outputs after each stage

        def feats(v):
            h = (v - shift) / scale
            out = []
            for i, layer in enumerate(vgg_features):
                h = layer(h)
                if i in taps:
                    out.append(h)
            return out

        def unit(t):
            return t / (torch.sqrt((t ** 2).sum(dim=1, keepdim=True)) + 1e-10)

        fx, fy = feats(x), feats(y)
        total = 0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (unit(a) - unit(b)) ** 2
            total = total + F.conv2d(d, lins[i]).mean(dim=(2, 3))
        return total.squeeze(1)

    def test_parity(self):
        torch.manual_seed(3)
        from refloader import _ensure_torchvision_stub
        _ensure_torchvision_stub()
        import torchvision
        vgg = torchvision.models.vgg16(pretrained=True).features.eval()
        lins = [torch.rand(1, c, 1, 1) * 0.1
                for c in (64, 128, 256, 512, 512)]
        x, y = _imgs(2)
        with torch.no_grad():
            ref_out = self._torch_lpips(vgg, lins,
                                        torch.from_numpy(x), torch.from_numpy(y)).numpy()

        vgg16_sd = {f"features.{k}": v.detach().numpy()
                    for k, v in vgg.state_dict().items()}
        lpips_sd = {f"lin{i}.model.1.weight": l.numpy() for i, l in enumerate(lins)}
        params = conv.convert_lpips(vgg16_sd, lpips_sd)
        got = LPIPS().apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(_nhwc(x)), jnp.asarray(_nhwc(y)))
        np.testing.assert_allclose(np.asarray(got), ref_out, rtol=1e-3, atol=1e-5)


class TestBuildFromNpz:
    def test_roundtrip(self, tmp_path, monkeypatch):
        """convert -> npz -> losses.lpips.build() end to end."""
        ref = ref_module("losses.dists")
        torch.manual_seed(0)
        tm = ref.DISTS().eval()
        params = conv.convert_dists(None, _sd(tm))
        from videoseal_tpu.utils.checkpoint import flatten_tree
        np.savez(tmp_path / "dists.npz", **flatten_tree(params))
        from videoseal_tpu.losses import lpips as L
        fn = L.build("dists", str(tmp_path))
        x, y = _imgs(4)
        v = fn(jnp.asarray(_nhwc(x)), jnp.asarray(_nhwc(y)))
        with torch.no_grad():
            ref_out = tm(torch.from_numpy(x), torch.from_numpy(y)).numpy().mean()
        np.testing.assert_allclose(float(v), ref_out, rtol=1e-3, atol=1e-4)
