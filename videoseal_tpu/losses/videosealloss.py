"""GAN + perceptual + detection/decoding loss (videoseal/losses/videosealloss.py:42-222).

Functional redesign of the reference's two-optimizer nn.Module:

* generator_loss(...) -> (scalar, logs): perceptual + hinge-G + detection BCE
  + decoding BCE with ADAPTIVE per-loss weights.
* discriminator_loss(...) -> (scalar, logs): hinge-D on real/fake.

Adaptive balancing parity note: the reference rescales each loss by
r_i * total_norm / ||∂loss_i/∂(last embedder layer)|| via K extra
autograd.grad calls (videosealloss.py:71-107). Here the gradient norms are
taken w.r.t. the embedder OUTPUT (the watermark residual) using one jax.vjp
of the downstream-only graph per loss — same balancing semantics (ratios of
downstream gradient norms), strictly cheaper (no backprop through the UNet),
and jit-friendly. total_norm>0 pins the target norm; otherwise the last
loss's norm is used (choose_norm_idx=-1 behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .perceptual import build_perceptual_loss


def hinge_d_loss(logits_real, logits_fake):
    """videosealloss.py:16-23."""
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(_bce(logits_real, jnp.ones_like(logits_real)))
                  + jnp.mean(_bce(logits_fake, jnp.zeros_like(logits_fake))))


def adopt_weight(weight, global_step, threshold: int = 0, value: float = 0.0):
    """Disc warmup (videosealloss.py:25-31); jit-safe."""
    return jnp.where(global_step < threshold, value, weight)


def _bce(logits, targets):
    """BCEWithLogits, elementwise."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@dataclasses.dataclass(frozen=True)
class VideoSealLoss:
    """Weights/config (videosealloss.py:42-69)."""
    balanced: bool = True
    total_norm: float = 0.0
    disc_weight: float = 1.0
    percep_weight: float = 1.0
    detect_weight: float = 1.0
    decode_weight: float = 0.0
    disc_start: int = 0
    disc_loss: str = "hinge"
    percep_loss: str = "yuv"

    def __post_init__(self):
        object.__setattr__(self, "_percep_fn", build_perceptual_loss(self.percep_loss))

    # ------------------------------------------------------------------
    def generator_losses(self, imgs, imgs_w, masks, msgs, preds,
                         disc_apply: Callable, global_step) -> dict:
        """Individual loss terms (videosealloss.py:116-169). All NHWC."""
        losses, weights = {}, {}
        if self.percep_weight > 0:
            losses["percep"] = self._percep_fn(imgs, imgs_w)
            weights["percep"] = self.percep_weight
        if self.disc_weight > 0:
            # hinge-G on frozen discriminator (videosealloss.py:129-135)
            logits_fake = disc_apply(imgs_w)
            losses["disc"] = -jnp.mean(logits_fake)
            weights["disc"] = adopt_weight(self.disc_weight, global_step, self.disc_start)
        if self.detect_weight > 0:
            det = preds[..., 0:1]  # detection channel
            if det.ndim == 4:
                losses["detect"] = jnp.mean(_bce(det, masks))
            else:
                # whole-image detector: target = does the image carry a wm (all 1s in train fwd)
                losses["detect"] = jnp.mean(_bce(det, jnp.ones_like(det)))
            weights["detect"] = self.detect_weight
        if self.decode_weight > 0:
            bits = preds[..., 1:]
            if bits.ndim == 2:
                losses["decode"] = jnp.mean(_bce(bits, msgs.astype(jnp.float32)))
            else:
                # pixelwise: BCE only inside the watermark mask (videosealloss.py:154-167)
                tgt = jnp.broadcast_to(msgs[:, None, None, :], bits.shape).astype(jnp.float32)
                m = jnp.broadcast_to(masks > 0.5, bits.shape)
                per = _bce(bits, tgt) * m
                losses["decode"] = jnp.sum(per) / jnp.maximum(jnp.sum(m), 1.0)
            weights["decode"] = self.decode_weight
        return losses, weights

    def combine(self, losses: dict, weights: dict, grad_norms: dict | None):
        """Adaptive or static combination (videosealloss.py:171-190)."""
        if grad_norms is None:
            scales = {k: weights[k] for k in losses}
        else:
            total_weight = sum(jnp.asarray(w, jnp.float32) for w in weights.values())
            keys = list(losses.keys())
            tn = (jnp.float32(self.total_norm) if self.total_norm > 0
                  else grad_norms[keys[-1]])
            scales = {k: (weights[k] / total_weight) * tn / (1e-12 + grad_norms[k])
                      for k in keys}
        total = sum(scales[k] * losses[k] for k in losses)
        logs = {"total_loss": total,
                **{f"loss_{k}": v for k, v in losses.items()},
                **{f"scale_{k}": scales[k] for k in losses}}
        return total, logs

    # ------------------------------------------------------------------
    def discriminator_loss(self, disc_apply: Callable, imgs, imgs_w, global_step):
        """videosealloss.py:192-214 (inputs pre-detached by caller via stop_gradient)."""
        logits_real = disc_apply(jax.lax.stop_gradient(imgs))
        logits_fake = disc_apply(jax.lax.stop_gradient(imgs_w))
        factor = adopt_weight(1.0, global_step, self.disc_start)
        fn = hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss
        d_loss = factor * fn(logits_real, logits_fake)
        logs = {"disc_loss": d_loss, "disc_factor": factor,
                "logits_real": jnp.mean(logits_real),
                "logits_fake": jnp.mean(logits_fake)}
        return d_loss, logs
