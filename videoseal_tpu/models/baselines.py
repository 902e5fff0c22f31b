"""Third-party watermarking baselines (parity: videoseal/models/baselines.py).

The reference wraps TorchScript exports of HiDDeN / MBRS / CIN / WAM /
TrustMark, each normalized into the Videoseal interface with method-specific
scaling (baselines.py:17-398). Those are opaque compiled torch graphs — not
convertible to JAX — so here they run through torch-CPU as host models behind
the same embed/detect API (baselines are eval-only comparison points; they
never ride the TPU training path). Method-specific constants mirror
build_baseline (baselines.py:326-398).

Use: model = build_baseline("baseline/hidden", ckpt_path="hidden.jit.pt")
"""

from __future__ import annotations

import numpy as np

# (scaling_w, scaling_i, img_size, normalization) per method, mirroring
# baselines.py:326-398
_BASELINE_SPECS = {
    "hidden": dict(scaling_w=0.2, scaling_i=1.0, img_size=128, norm="pm1"),
    "mbrs": dict(scaling_w=1.0, scaling_i=1.0, img_size=256, norm="pm1"),
    "cin": dict(scaling_w=1.0, scaling_i=1.0, img_size=128, norm="pm1"),
    "wam": dict(scaling_w=2.0, scaling_i=1.0, img_size=256, norm="imnet"),
    "trustmark": dict(scaling_w=1.0, scaling_i=1.0, img_size=256, norm="none"),
}

_IMNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class TorchScriptBaseline:
    """Host-side baseline with the Videoseal-style interface."""

    def __init__(self, method: str, embedder_path: str, extractor_path: str,
                 nbits: int):
        import torch
        self.method = method
        self.spec = _BASELINE_SPECS[method]
        self.embedder = torch.jit.load(embedder_path, map_location="cpu").eval()
        self.extractor = torch.jit.load(extractor_path, map_location="cpu").eval()
        self.nbits = nbits
        self.scaling_w = self.spec["scaling_w"]
        self._rng = np.random.default_rng(0)

    def _norm(self, x: np.ndarray) -> np.ndarray:
        if self.spec["norm"] == "pm1":
            return x * 2 - 1
        if self.spec["norm"] == "imnet":
            return (x - _IMNET_MEAN) / _IMNET_STD
        return x

    def _denorm(self, x: np.ndarray) -> np.ndarray:
        if self.spec["norm"] == "pm1":
            return (x + 1) / 2
        if self.spec["norm"] == "imnet":
            return x * _IMNET_STD + _IMNET_MEAN
        return x

    def get_random_msg(self, bsz: int = 1, nb_repetitions: int = 1) -> np.ndarray:
        return self._rng.integers(0, 2, (bsz, self.nbits))

    def embed(self, imgs, msgs=None, is_video: bool = False, **kw) -> dict:
        """imgs: (B|F, H, W, 3) [0,1] numpy/jax -> watermarked via torch CPU.

        Resizes to the method's processing size, embeds, adds the scaled
        residual at native resolution (baselines.py per-method forward).
        """
        import torch
        from ..ops.resize import resize_bilinear
        import jax.numpy as jnp

        x = np.asarray(imgs, np.float32)
        if msgs is None:
            msgs = self.get_random_msg(1 if is_video else x.shape[0])
        msgs = np.asarray(msgs)
        m = np.broadcast_to(msgs[:1], (x.shape[0], self.nbits)) if is_video else msgs

        s = self.spec["img_size"]
        x_res = np.asarray(resize_bilinear(jnp.asarray(x), s, s))
        with torch.no_grad():
            xt = torch.from_numpy(self._norm(x_res)).permute(0, 3, 1, 2)
            mt = torch.from_numpy(m.astype(np.float32))
            out = self.embedder(xt, mt)
            out = out.permute(0, 2, 3, 1).numpy()
        delta = self._denorm(out) - x_res
        delta_full = np.asarray(resize_bilinear(
            jnp.asarray(delta), x.shape[-3], x.shape[-2]))
        imgs_w = np.clip(x + self.scaling_w * delta_full, 0, 1)
        return {"imgs_w": imgs_w, "msgs": m, "preds_w": delta_full}

    def detect(self, imgs, is_video: bool = False) -> dict:
        import torch
        from ..ops.resize import resize_bilinear
        import jax.numpy as jnp

        x = np.asarray(imgs, np.float32)
        s = self.spec["img_size"]
        x_res = np.asarray(resize_bilinear(jnp.asarray(x), s, s))
        with torch.no_grad():
            xt = torch.from_numpy(self._norm(x_res)).permute(0, 3, 1, 2)
            preds = self.extractor(xt).numpy()
        if preds.shape[-1] == self.nbits:  # no detection channel: prepend one
            preds = np.concatenate(
                [np.zeros((preds.shape[0], 1), preds.dtype), preds], axis=-1)
        return {"preds": preds}

    def extract_message(self, imgs, aggregation: str = "avg"):
        preds = self.detect(imgs, is_video=True)["preds"][:, 1:]
        if aggregation == "avg" or aggregation is None:
            decoded = preds.mean(axis=0)
        else:
            decoded = preds.mean(axis=0)
        return (decoded > 0).astype(np.int32)[None]


def build_baseline(name: str, embedder_path: str | None = None,
                   extractor_path: str | None = None, nbits: int | None = None):
    """'baseline/<method>' -> wrapped host baseline (cfg.py:167-169 load path).

    TorchScript checkpoints are external artifacts (reference downloads them
    from fbaipublicfiles); provide local paths.
    """
    method = name.split("/")[-1]
    if method not in _BASELINE_SPECS:
        raise NotImplementedError(
            f"baseline {method!r}; available: {sorted(_BASELINE_SPECS)}")
    if not embedder_path or not extractor_path:
        raise FileNotFoundError(
            f"baseline/{method} needs local TorchScript files (zero-egress "
            f"environment): pass embedder_path=/path/encoder.jit.pt and "
            f"extractor_path=/path/decoder.jit.pt")
    default_bits = {"hidden": 48, "mbrs": 256, "cin": 30, "wam": 32,
                    "trustmark": 100}
    return TorchScriptBaseline(method, embedder_path, extractor_path,
                               nbits or default_bits[method])
