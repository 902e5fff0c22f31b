"""Inflate a 2D checkpoint to a temporal (2+1D) one
(parity: scripts/inflate_model_to_temporal.py:58-70).

Each spatial conv gains a temporal kx1x1 conv initialized to identity (center
tap = I, others 0), so the inflated model reproduces the 2D model exactly at
step 0 of temporal finetuning. Works on our .npz checkpoints: for every
UNet Conv*Op subtree it adds the `temporal/kernel` the conv2p1d variant
expects (modules/common.py Conv2p1dOp).

  python -m videoseal_tpu.scripts.inflate_model_to_temporal in.npz out.npz
"""

from __future__ import annotations

import argparse

import numpy as np

from ..utils.checkpoint import load_npz, save_npz, flatten_tree, unflatten_tree


def _identity_temporal_kernel(channels: int, k: int = 3) -> np.ndarray:
    """(k, 1, 1, C, C) conv kernel acting as identity over time."""
    w = np.zeros((k, 1, 1, channels, channels), np.float32)
    w[k // 2, 0, 0] = np.eye(channels, dtype=np.float32)
    return w


def inflate_tree(tree: dict, temporal_kernel_size: int = 3) -> dict:
    """Rewrite conv2d subtrees {conv: {kernel,...}} into conv2p1d layout
    {spatial: {conv: ...}, temporal: {kernel: identity}}."""
    out = {}
    for k, v in tree.items():
        is_conv_op = (isinstance(v, dict) and set(v) >= {"conv"}
                      and isinstance(v["conv"], dict) and "kernel" in v["conv"]
                      and np.asarray(v["conv"]["kernel"]).ndim == 4)
        # Conv*Op subtrees inside ResnetBlock/DBlock bodies get the conv2p1d
        # layout: spatial conv (+ identity temporal conv for k != 1,
        # Conv2p1dWrapper semantics, common.py:230-258). Plain nn.Conv layers
        # (downs/*/down, outc, ups/*/up/conv) are left untouched — the 2p1d
        # UNet keeps those 2D, like the reference's conv_layer plumbing.
        if is_conv_op and k in ("conv1", "conv2", "res_conv"):
            ksz = np.asarray(v["conv"]["kernel"]).shape[0]
            if ksz == 1:
                out[k] = {"spatial": v}
            else:
                ch = np.asarray(v["conv"]["kernel"]).shape[-1]
                out[k] = {"spatial": v,
                          "temporal": {"kernel": _identity_temporal_kernel(
                              ch, temporal_kernel_size)}}
        elif isinstance(v, dict):
            out[k] = inflate_tree(v, temporal_kernel_size)
        else:
            out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--temporal_kernel_size", type=int, default=3)
    args = ap.parse_args()
    emb, ext = load_npz(args.input)
    emb = {c: inflate_tree(t, args.temporal_kernel_size) for c, t in emb.items()}
    save_npz(args.output, emb, ext)
    print(f"inflated {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
