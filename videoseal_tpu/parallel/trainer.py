"""GAN training step (parity: train.py:575-715 + losses/videosealloss.py).

One pjit'd function per modality does everything the reference's Python loop
does per iteration: embed -> video-mode expand -> attenuate/blend/clamp ->
composite mask -> sampled attack -> detect -> generator loss (adaptive
balancing) -> discriminator loss -> both optimizer updates. Batch rides the
'data' mesh axis; gradient reduction is XLA's (replicated-param jit), the
TPU-native replacement for DDP all-reduce.

Video batches are (V, F, H, W, 3) with one message per video — the
reference's grad-accumulation-over-videos (train.py:599-643) becomes a real
batch dimension sharded over the mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from ..losses.videosealloss import VideoSealLoss
from ..models.blender import blend
from ..models.videoseal import PipelineConfig, _expand_video_mode
from ..modules.jnd import JND
from ..ops.color import rgb_to_y
from ..ops.metrics import psnr, bit_accuracy
from ..ops.resize import resize_bilinear


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    embedder_params: Any
    embedder_stats: Any          # BatchNorm running stats ({} if none)
    extractor_params: Any
    disc_params: Any
    opt_state_g: Any
    opt_state_d: Any
    scaling_w: jnp.ndarray       # schedulable strength (train.py:320-327)


@dataclasses.dataclass(frozen=True)
class TrainerModules:
    """Static bundle (hashable closure for jit)."""
    embedder: Any                # linen module
    extractor: Any
    discriminator: Any
    augmenter: Any               # augmentation.Augmenter
    attenuation: JND | None
    cfg: PipelineConfig
    loss: VideoSealLoss
    scaling_i: float = 1.0
    temperature: float = 1.0
    balanced: bool = True


def create_train_state(mods: TrainerModules, optimizer_g, optimizer_d,
                       seed: int = 0, scaling_w: float = 0.2,
                       embedder_vars=None, extractor_vars=None) -> TrainState:
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    s = mods.cfg.img_size
    in_c = 1 if mods.cfg.yuv else 3
    if embedder_vars is None:
        embedder_vars = mods.embedder.init(
            k1, jnp.zeros((1, s, s, in_c)), jnp.zeros((1, mods.cfg.nbits), jnp.int32))
    if extractor_vars is None:
        extractor_vars = mods.extractor.init(k2, jnp.zeros((1, s, s, 3)))
    disc_vars = mods.discriminator.init(k3, jnp.zeros((1, s, s, 3)))
    e_params = embedder_vars["params"]
    e_stats = embedder_vars.get("batch_stats", {})
    x_params = extractor_vars["params"]
    d_params = disc_vars["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        embedder_params=e_params,
        embedder_stats=e_stats,
        extractor_params=x_params,
        disc_params=d_params,
        opt_state_g=optimizer_g.init({"embedder": e_params, "extractor": x_params}),
        opt_state_d=optimizer_d.init(d_params),
        scaling_w=jnp.float32(scaling_w),
    )


def _embed_apply(mods: TrainerModules, e_params, e_stats, inp, msgs):
    """Embedder forward in train mode, updating BatchNorm stats."""
    variables = {"params": e_params}
    if e_stats:
        variables["batch_stats"] = e_stats
        out, upd = mods.embedder.apply(variables, inp, msgs, train=True,
                                       mutable=["batch_stats"])
        return out, upd["batch_stats"]
    return mods.embedder.apply(variables, inp, msgs, train=True), e_stats


def make_train_step(mods: TrainerModules, optimizer_g, optimizer_d,
                    is_video: bool = False, mode: str = "both") -> Callable:
    """Build the jitted train step. batch: dict(imgs, masks);
    imgs: (B,H,W,3) or (V,F,H,W,3); masks: imgs[...,:1]-shaped or None.

    mode: "both" (disc+gen each step, reference default), "gen" or "disc"
    (sleepwake alternation, train.py:610-614)."""

    cfg = mods.cfg
    loss_cfg = mods.loss

    def forward_and_losses(gen_params, state: TrainState, imgs, masks, msgs, key):
        """Returns (losses dict, aux) — everything downstream of params."""
        e_params, x_params = gen_params["embedder"], gen_params["extractor"]
        s = cfg.img_size
        if is_video:
            v, f = imgs.shape[0], imgs.shape[1]
            flat = imgs.reshape((v * f,) + imgs.shape[2:])
            flat_res = resize_bilinear(flat, s, s)
            res = flat_res.reshape((v, f, s, s, 3))
            keys_in = res[:, ::cfg.step_size]                      # (V,K,...)
            kcount = keys_in.shape[1]
            keys_flat = keys_in.reshape((v * kcount, s, s, 3))
            key_msgs = jnp.repeat(msgs, kcount, axis=0)            # (V*K, nbits)
            inp = rgb_to_y(keys_flat) if cfg.yuv else keys_flat
            preds_k, new_stats = _embed_apply(mods, e_params, state.embedder_stats,
                                              inp, key_msgs)
            preds_k = preds_k.reshape((v, kcount) + preds_k.shape[1:])
            preds_w = jax.vmap(
                lambda p: _expand_video_mode(p, f, cfg.step_size, cfg.video_mode)
            )(preds_k)                                             # (V,F,s,s,C)
            preds_w = preds_w.reshape((v * f, s, s, preds_w.shape[-1]))
            imgs_flat = flat
            msgs_frames = jnp.repeat(msgs, f, axis=0)              # (V*F, nbits)
            masks_flat = (masks.reshape((v * f,) + masks.shape[2:])
                          if masks is not None else None)
        else:
            imgs_flat = imgs
            imgs_res = resize_bilinear(imgs, s, s)
            inp = rgb_to_y(imgs_res) if cfg.yuv else imgs_res
            preds_w, new_stats = _embed_apply(mods, e_params, state.embedder_stats,
                                              inp, msgs)
            msgs_frames = msgs
            masks_flat = masks

        h, w = imgs_flat.shape[-3], imgs_flat.shape[-2]

        def downstream(pw):
            pw_full = resize_bilinear(pw, h, w)
            imgs_w = blend(cfg.blending_method, imgs_flat, pw_full,
                           mods.scaling_i, state.scaling_w)
            if mods.attenuation is not None:
                # train path: blend first, then attenuate (wam.py:103-108)
                imgs_w = mods.attenuation(imgs_flat, imgs_w)
            if cfg.clamp:
                imgs_w = jnp.clip(imgs_w, 0.0, 1.0)
            k_aug = jax.random.fold_in(key, 1)
            imgs_aug, mask_t, sel = mods.augmenter(
                k_aug, imgs_w, imgs_flat, masks_flat, is_video=is_video, train=True)
            imgs_aug_res = resize_bilinear(imgs_aug, s, s)
            preds = mods.extractor.apply({"params": x_params}, imgs_aug_res)
            preds = preds / mods.temperature                      # train.py:628
            disc_apply = lambda x: mods.discriminator.apply(
                {"params": jax.lax.stop_gradient(state.disc_params)}, x)
            losses, weights = loss_cfg.generator_losses(
                imgs_flat, imgs_w, mask_t, msgs_frames, preds, disc_apply, state.step)
            return losses, (weights, imgs_w, preds, mask_t, new_stats)

        return downstream, preds_w, msgs_frames

    def gen_loss_fn(gen_params, state, imgs, masks, msgs, key):
        downstream, preds_w, msgs_frames = forward_and_losses(
            gen_params, state, imgs, masks, msgs, key)
        losses, vjp, aux = jax.vjp(downstream, preds_w, has_aux=True)
        weights, imgs_w, preds, mask_t, new_stats = aux
        grad_norms = None
        if mods.balanced and len(losses) > 1:
            grad_norms = {}
            for i, k in enumerate(losses):
                cot = {kk: jnp.float32(1.0 if kk == k else 0.0) for kk in losses}
                (g,) = vjp(cot)
                grad_norms[k] = jax.lax.stop_gradient(
                    jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2)) )
        total, logs = loss_cfg.combine(losses, weights, grad_norms)
        return total, (logs, imgs_w, preds, mask_t, new_stats, msgs_frames)

    def train_step(state: TrainState, batch: dict, key):
        imgs = batch["imgs"]
        masks = batch.get("masks")
        k_msg, k_fwd = jax.random.split(key)
        n_msgs = imgs.shape[0]  # images: per image; video: per video
        msgs = jax.random.randint(k_msg, (n_msgs, cfg.nbits), 0, 2)

        gen_params = {"embedder": state.embedder_params,
                      "extractor": state.extractor_params}
        if mode in ("both", "gen"):
            (gen_total, aux), gen_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
                gen_params, state, imgs, masks, msgs, k_fwd)
            logs, imgs_w, preds, mask_t, new_stats, msgs_frames = aux
            updates, new_opt_g = optimizer_g.update(gen_grads, state.opt_state_g,
                                                    gen_params)
            new_gen = jax.tree_util.tree_map(lambda p, u: p + u, gen_params, updates)
        else:  # disc-only epoch: forward without gen grads
            downstream, preds_w, msgs_frames = forward_and_losses(
                gen_params, state, imgs, masks, msgs, k_fwd)
            losses, (weights, imgs_w, preds, mask_t, new_stats) = downstream(preds_w)
            logs = {f"loss_{k}": v for k, v in losses.items()}
            new_gen, new_opt_g = gen_params, state.opt_state_g

        # --- discriminator update (videosealloss.py:192-214) ---
        imgs_flat = imgs.reshape((-1,) + imgs.shape[-3:])

        def d_loss_fn(d_params):
            apply = lambda x: mods.discriminator.apply({"params": d_params}, x)
            return loss_cfg.discriminator_loss(apply, imgs_flat, imgs_w, state.step)

        if loss_cfg.disc_weight > 0 and mode in ("both", "disc"):
            (d_total, d_logs), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.disc_params)
            d_updates, new_opt_d = optimizer_d.update(d_grads, state.opt_state_d,
                                                      state.disc_params)
            new_disc = jax.tree_util.tree_map(lambda p, u: p + u,
                                              state.disc_params, d_updates)
            logs.update(d_logs)
        else:
            new_disc, new_opt_d = state.disc_params, state.opt_state_d

        # --- metrics (train.py:646-672) ---
        logs["psnr"] = jnp.mean(psnr(imgs_w, imgs_flat))
        bits = preds[..., 1:]
        logs["bit_acc"] = jnp.nanmean(bit_accuracy(
            bits, msgs_frames, mask_t if bits.ndim == 4 else None))

        new_state = state.replace(
            step=state.step + 1,
            embedder_params=new_gen["embedder"],
            extractor_params=new_gen["extractor"],
            embedder_stats=new_stats,
            disc_params=new_disc,
            opt_state_g=new_opt_g,
            opt_state_d=new_opt_d,
        )
        return new_state, logs

    return jax.jit(train_step, donate_argnums=(0,))
