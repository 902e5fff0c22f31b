"""Convert VGG16-based perceptual-loss weights to the native npz format.

Sources (all local files — zero-egress environment):
* torchvision VGG16 state dict (`features.{i}.weight`) — the shared backbone
  the reference losses build on (watson_vgg.py:21, dists.py:35).
* `lpips` package checkpoint — the trained `lin{i}.model.1.weight` heads.
* Watson-VGG checkpoint (`rgb_watson_vgg_trial0.pth`, perceptual.py:14-17) —
  embeds its own vgg.slice* weights plus t/w/beta sensitivity params.
* DISTS checkpoint (`dists_ckpt.pth`) — alpha/beta channel weights (the
  backbone comes from torchvision).

Usage:
  python -m videoseal_tpu.tools.convert_lpips --out weights_dir \
      [--vgg16 vgg16.pth] [--lpips lpips_vgg.pth] \
      [--watson rgb_watson_vgg_trial0.pth] [--dists dists_ckpt.pth]

Writes lpips_vgg.npz / watson_vgg.npz / dists.npz consumed by
losses.lpips.build(). Conversion functions are also importable for tests.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..utils.checkpoint import flatten_tree

# torchvision features index -> (stage, conv-within-stage)
_CONV_IDX = {0: (0, 0), 2: (0, 1), 5: (1, 0), 7: (1, 1),
             10: (2, 0), 12: (2, 1), 14: (2, 2),
             17: (3, 0), 19: (3, 1), 21: (3, 2),
             24: (4, 0), 26: (4, 1), 28: (4, 2)}

# watson_vgg slices own these index ranges (watson_vgg.py:33-42)
_SLICE_OF_IDX = {i: s for s, rng in enumerate(
    [range(0, 4), range(4, 9), range(9, 16), range(16, 23), range(23, 30)],
    start=1) for i in rng}


def _hwio(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def convert_vgg_features(sd, key_of) -> dict:
    """Build VGG16Features params from any torch layout.

    key_of(idx, leaf) -> state-dict key for features index `idx`
    ('weight'/'bias'), e.g. 'features.0.weight' (torchvision),
    'vgg.slice1.0.weight' (watson), 'stage1.0.weight' (dists).
    """
    p = {}
    for idx, (si, ci) in _CONV_IDX.items():
        p[f"conv{si}_{ci}"] = {
            "kernel": _hwio(sd[key_of(idx, "weight")]),
            "bias": np.asarray(sd[key_of(idx, "bias")]),
        }
    return p


def _tv_key(idx, leaf):
    return f"features.{idx}.{leaf}"


def _watson_key(idx, leaf):
    return f"vgg.slice{_SLICE_OF_IDX[idx]}.{idx}.{leaf}"


def _dists_key(idx, leaf):
    stage = _SLICE_OF_IDX[idx] if idx != 23 else 5  # stage5 starts at 23 (pool)
    return f"stage{stage}.{idx}.{leaf}"


def _lin_heads(lpips_sd, params):
    for i in range(5):
        w = None
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in lpips_sd:
                w = lpips_sd[k]
                break
        if w is None:
            raise KeyError(f"lpips checkpoint missing lin{i} head")
        params[f"lin{i}"] = np.asarray(w).reshape(-1)  # (1,ch,1,1) -> (ch,)
    return params


def convert_lpips(vgg16_sd, lpips_sd) -> dict:
    """torchvision VGG16 + lpips lin heads -> LPIPS(net='vgg') params tree."""
    return _lin_heads(lpips_sd, {"vgg": convert_vgg_features(vgg16_sd, _tv_key)})


def convert_lpips_alex(alexnet_sd, lpips_sd) -> dict:
    """torchvision AlexNet + lpips lin heads -> LPIPS(net='alex') params
    (the reference's eval-time LPIPS, evals/full.py:94)."""
    alex = {}
    for ci, idx in enumerate((0, 3, 6, 8, 10)):  # torchvision alexnet convs
        alex[f"conv{ci}"] = {
            "kernel": _hwio(alexnet_sd[f"features.{idx}.weight"]),
            "bias": np.asarray(alexnet_sd[f"features.{idx}.bias"]),
        }
    return _lin_heads(lpips_sd, {"alex": alex})


def convert_watson_vgg(watson_sd) -> dict:
    """Reference watson_vgg checkpoint (embedded VGG slices + sensitivities)."""
    params = {"vgg": convert_vgg_features(watson_sd, _watson_key),
              "beta": np.asarray(watson_sd["beta"])}
    for l in range(5):
        params[f"t{l}_tild"] = np.asarray(watson_sd[f"t{l}_tild"])
        params[f"w{l}_tild"] = np.asarray(watson_sd[f"w{l}_tild"])
    return params


def convert_dists(vgg16_sd, dists_sd) -> dict:
    """torchvision VGG16 (or a full DISTS sd with stage*.* keys) + alpha/beta."""
    if "stage1.0.weight" in dists_sd:
        vgg = convert_vgg_features(dists_sd, _dists_key)
    else:
        vgg = convert_vgg_features(vgg16_sd, _tv_key)
    return {"vgg": vgg,
            "alpha": np.asarray(dists_sd["alpha"]).reshape(-1),
            "beta": np.asarray(dists_sd["beta"]).reshape(-1)}


def _load_sd(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output weights dir")
    ap.add_argument("--vgg16", help="torchvision vgg16 state dict (.pth)")
    ap.add_argument("--alexnet", help="torchvision alexnet state dict (.pth)")
    ap.add_argument("--lpips", help="lpips package vgg checkpoint (.pth)")
    ap.add_argument("--lpips_alex", help="lpips package alex checkpoint (.pth)")
    ap.add_argument("--watson", help="rgb_watson_vgg_trial0.pth")
    ap.add_argument("--dists", help="dists_ckpt.pth (alpha/beta weights)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    vgg16_sd = _load_sd(args.vgg16) if args.vgg16 else None
    if args.lpips:
        assert vgg16_sd is not None, "--lpips needs --vgg16"
        params = convert_lpips(vgg16_sd, _load_sd(args.lpips))
        np.savez(os.path.join(args.out, "lpips_vgg.npz"), **flatten_tree(params))
        print("wrote lpips_vgg.npz")
    if args.lpips_alex:
        assert args.alexnet, "--lpips_alex needs --alexnet"
        params = convert_lpips_alex(_load_sd(args.alexnet), _load_sd(args.lpips_alex))
        np.savez(os.path.join(args.out, "lpips_alex.npz"), **flatten_tree(params))
        print("wrote lpips_alex.npz")
    if args.watson:
        params = convert_watson_vgg(_load_sd(args.watson))
        np.savez(os.path.join(args.out, "watson_vgg.npz"), **flatten_tree(params))
        print("wrote watson_vgg.npz")
    if args.dists:
        params = convert_dists(vgg16_sd, _load_sd(args.dists))
        np.savez(os.path.join(args.out, "dists.npz"), **flatten_tree(params))
        print("wrote dists.npz")


if __name__ == "__main__":
    main()
