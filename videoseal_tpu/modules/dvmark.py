"""DVMark 3D-conv video watermarking baseline (videoseal/modules/dvmark.py:10-119).

Frames ride the batch dim at the API ((F,H,W,C)); internally treated as a
single video of length F via 3D convs, exactly like the reference's
unsqueeze/permute dance (dvmark.py:66,116) but without any transposes in NDHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear


def _conv3d(features, k, name):
    if isinstance(k, int):
        k = (k, k, k)
    pad = [(ki // 2, ki // 2) for ki in k]
    return nn.Conv(features, k, padding=pad, name=name)


def _avg_pool_spatial(x):
    """AvgPool3d((1,2,2)) on (1, F, H, W, C)."""
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2, 1),
                                 (1, 1, 2, 2, 1), "VALID") / 4.0


class DVMarkEncoder(nn.Module):
    """dvmark.py:10-88: multiscale message embedding at 2 scales."""
    num_bits: int

    @nn.compact
    def __call__(self, imgs, msgs, train: bool = False):
        f, h, w, _ = imgs.shape
        x = imgs[None]  # (1, F, H, W, C)
        # transform layer: 3 x (1,3,3) convs + 1 x (3,3,3) conv, relu between
        for i in range(4):
            k = (1, 3, 3) if i < 3 else (3, 3, 3)
            x = _conv3d(64, k, f"transform_{i}")(x)
            x = jax.nn.relu(x)
        # message tiled at full and half resolution (dvmark.py:73-75)
        m = msgs.astype(imgs.dtype)  # (1, nbits) — one msg per video... or (F, nbits)
        if m.shape[0] != f:
            m = jnp.broadcast_to(m[:1], (f, self.num_bits))
        m_full = jnp.broadcast_to(m[None, :, None, None, :], (1, f, h, w, self.num_bits))
        m_half = jnp.broadcast_to(m[None, :, None, None, :], (1, f, h // 2, w // 2, self.num_bits))

        x = jnp.concatenate([x, m_full], axis=-1)
        chans = [256, 128, 128]
        for i in range(3):
            x = _conv3d(chans[i], 3, f"emb1_{i}")(x)
            x = jax.nn.relu(x)
        x_skip = x

        x = _avg_pool_spatial(x_skip)
        x = jnp.concatenate([x, m_half], axis=-1)
        chans = [512, 256, 256]
        for i in range(3):
            x = _conv3d(chans[i], 3, f"emb2_{i}")(x)
            x = jax.nn.relu(x)

        x = resize_bilinear(x[0], h, w, antialias=False)[None]
        x = jnp.concatenate([x_skip, x], axis=-1)
        chans = [256, 128, 3]
        for i in range(3):
            x = _conv3d(chans[i], 3, f"emb3_{i}")(x)
            if i < 2:
                x = jax.nn.relu(x)
        return jnp.tanh(x)[0]


class DVMarkDecoder(nn.Module):
    """dvmark.py:91-119: 4 conv3d stages with 2 spatial poolings, mean over space."""
    num_bits: int

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        x = imgs[None]
        x = jax.nn.relu(_conv3d(128, 3, "layer1")(x))
        x = jax.nn.relu(_conv3d(128, 3, "layer2")(x))
        x = _avg_pool_spatial(x)
        x = jax.nn.relu(_conv3d(256, 3, "layer3")(x))
        x = _avg_pool_spatial(x)
        x = _conv3d(self.num_bits + 1, 3, "layer4")(x)
        return jnp.mean(x, axis=(2, 3))[0]  # (F, 1+nbits)
