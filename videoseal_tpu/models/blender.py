"""Watermark blending (parity: videoseal/models/blender.py:11-105).

Pure functions over NHWC arrays; `scaling_w` is traced (a runtime scalar), so
sweeping watermark strength — the user-facing knob (README.md:210-217) — never
recompiles.
"""

import jax
import jax.numpy as jnp

AVAILABLE_BLENDING_METHODS = [
    "additive", "multiplicative", "spatial_smoothed", "variance_based"
]


def blend(method: str, imgs: jnp.ndarray, preds_w: jnp.ndarray,
          scaling_i: float | jnp.ndarray, scaling_w: float | jnp.ndarray) -> jnp.ndarray:
    if method == "additive":
        return scaling_i * imgs + scaling_w * preds_w
    if method == "multiplicative":
        return scaling_i * imgs * (1 + scaling_w * preds_w)
    if method == "spatial_smoothed":
        att = jax.nn.sigmoid(preds_w)
        att = jax.lax.reduce_window(
            jnp.pad(att, [(0, 0)] * (att.ndim - 3) + [(2, 2), (2, 2), (0, 0)]),
            0.0, jax.lax.add, (1,) * (att.ndim - 3) + (5, 5, 1),
            (1,) * att.ndim, "VALID") / 25.0
        return scaling_i * imgs * (1 - att) + scaling_w * att * jax.nn.sigmoid(preds_w)
    if method == "variance_based":
        var = jnp.var(preds_w, axis=(-3, -2, -1), keepdims=True)
        strength = jax.nn.sigmoid(var * scaling_w)
        return scaling_i * imgs * (1 - strength) + strength * preds_w
    raise ValueError(f"Unknown blending method: {method}")
