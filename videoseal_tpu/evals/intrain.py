"""In-training evaluation (parity: reference train.py:532-544,718-882).

Every ``eval_freq`` epochs the reference's ``eval_one_epoch`` embeds a
held-out batch, logs quality metrics, then runs a mask x aug x strength
detection sweep. TPU-first shape: the embed path and every (aug, strength)
row are each jitted ONCE at construction with the TrainState and the mask as
*arguments*, so repeated evals across epochs — and every validation mask —
reuse the compiled programs (a per-eval recompile would cost minutes through
the remote-compile tunnel).

Parity notes vs the reference sweep (train.py:718-882):
  - watermark masking: ``imgs_masked = imgs_w*mask + imgs*(1-mask)`` before
    the augmentation, and the aug-transformed mask selects the pixels used
    for pixelwise bit accuracy (metrics.py:150-178 masked_select semantics,
    realized here as a mask-weighted mean — see ops.metrics.bit_accuracy).
  - localization: when ``lambda_det > 0`` and the extractor is pixelwise,
    each row also logs pixel accuracy and mean IoU of the detection channel
    against the PRE-aug mask (the reference compares mask_preds to ``masks``,
    not ``masks_aug`` — train.py:861-868; mirrored bug-for-bug).
  - video modality: clips (V,F,H,W,C) embed with the training video
    semantics (key frames every ``step_size``, ``video_mode`` propagation,
    trainer.py:114-134) and each row scores all frames.

Rows come from augmentation/validation.py grids; image-mode grids are fully
jittable (differentiable JPEG proxy, warp-based geometry). Exact host codecs
stay in the offline eval (evals/full.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.blender import blend
from ..models.videoseal import _expand_video_mode
from ..ops.color import rgb_to_y
from ..ops.metrics import accuracy as pixel_accuracy
from ..ops.metrics import bit_accuracy, iou, psnr, ssim
from ..ops.resize import resize_bilinear


def _flat(imgs):
    """(V,F,H,W,C) -> (V*F,H,W,C); identity on 4D batches."""
    return imgs.reshape((-1,) + imgs.shape[-3:])


def make_intrain_eval(mods, eval_augs: str = "subset",
                      lambda_det: float = 0.0,
                      validation_masks=None,
                      is_video: bool = False):
    """Build jit-once eval closures over TrainerModules.

    Returns ``eval_fn(state, imgs, key) -> (scalars dict, imgs_w)`` where
    ``imgs`` is a held-out (B, H, W, 3) float batch in [0, 1] — or, with
    ``is_video=True``, a (V, F, H, W, 3) batch of clips.

    ``validation_masks``: optional list of (H, W) or (H, W, 1) arrays in
    {0,1} (e.g. masks_host.MixedMaskEmbedder.sample_representative_masks);
    defaults to a single all-ones mask, matching the reference's
    NoMaskEmbedder validation path (masks.py:313-314).
    """
    from ..augmentation.validation import (get_validation_augs,
                                           get_validation_augs_geometric,
                                           get_validation_augs_subset)

    cfg = mods.cfg
    s = cfg.img_size

    def _embed(state, imgs, msgs):
        variables = {"params": state.embedder_params}
        if state.embedder_stats:
            variables["batch_stats"] = state.embedder_stats
        h, w = imgs.shape[-3], imgs.shape[-2]
        if is_video:
            # key-frame embedding + temporal propagation (trainer.py:114-134)
            v, f = imgs.shape[0], imgs.shape[1]
            flat_res = resize_bilinear(_flat(imgs), s, s)
            res = flat_res.reshape((v, f, s, s, 3))
            keys_in = res[:, ::cfg.step_size]
            kcount = keys_in.shape[1]
            keys_flat = keys_in.reshape((v * kcount, s, s, 3))
            inp = rgb_to_y(keys_flat) if cfg.yuv else keys_flat
            key_msgs = jnp.repeat(msgs, kcount, axis=0)
            preds_k = mods.embedder.apply(variables, inp, key_msgs)
            preds_k = preds_k.reshape((v, kcount) + preds_k.shape[1:])
            preds_w = jax.vmap(
                lambda p: _expand_video_mode(p, f, cfg.step_size,
                                             cfg.video_mode))(preds_k)
            preds_w = preds_w.reshape((v * f,) + preds_w.shape[2:])
            flat = _flat(imgs)
        else:
            imgs_res = resize_bilinear(imgs, s, s)
            inp = rgb_to_y(imgs_res) if cfg.yuv else imgs_res
            preds_w = mods.embedder.apply(variables, inp, msgs)
            flat = imgs
        pw_full = resize_bilinear(preds_w, h, w)
        imgs_w = blend(cfg.blending_method, flat, pw_full,
                       mods.scaling_i, state.scaling_w)
        if mods.attenuation is not None:
            imgs_w = mods.attenuation(flat, imgs_w)
        if cfg.clamp:
            imgs_w = jnp.clip(imgs_w, 0.0, 1.0)
        return imgs_w.reshape(imgs.shape)

    embed_fn = jax.jit(_embed)
    quality_fn = jax.jit(lambda a, b: (jnp.mean(psnr(_flat(a), _flat(b))),
                                       jnp.mean(ssim(_flat(a), _flat(b)))))

    # video modality sweeps the VIDEO grid (ref train.py:538 passes
    # val_modality == VIDEO into get_validation_augs*): codec rows use the
    # jittable differentiable proxy — a host codec cannot live inside the
    # jit-once row programs; exact codecs stay in the offline eval
    # (evals/full.py)
    if eval_augs == "identity":
        grid = get_validation_augs(is_video=is_video, only_identity=True)
    elif eval_augs == "full":
        grid = get_validation_augs(is_video=is_video, jittable=True)
    elif eval_augs == "geometric":
        grid = get_validation_augs_geometric(is_video=is_video, jittable=True)
    else:
        grid = get_validation_augs_subset(is_video=is_video, jittable=True)

    want_det = lambda_det > 0

    def make_row(aug, strength):
        def _row(state, imgs, imgs_w, mask, msgs):
            # watermark masking (train.py:826-829); mask broadcasts over
            # batch (and frames, in video mode)
            flat_w, flat_o = _flat(imgs_w), _flat(imgs)
            n = flat_w.shape[0]
            mask_b = jnp.broadcast_to(mask, (n,) + flat_w.shape[1:3] + (1,))
            masked = flat_w * mask_b + flat_o * (1.0 - mask_b)
            if is_video:
                # apply the attack PER CLIP: temporal codec proxies (and any
                # frame-coupled aug) must see one clip's frames as their
                # leading axis, not V*F flattened across clip boundaries
                v, f = imgs.shape[0], imgs.shape[1]
                clip = lambda a: a.reshape((v, f) + a.shape[1:])
                att, mask_aug = jax.vmap(
                    lambda im, ma: aug.apply_strength(im, ma, strength)
                )(clip(masked), clip(mask_b))
                att = _flat(att)
                mask_aug = _flat(mask_aug)
            else:
                att, mask_aug = aug.apply_strength(masked, mask_b, strength)
            att = resize_bilinear(att, s, s)
            preds = mods.extractor.apply(
                {"params": state.extractor_params}, att)
            out = {}
            frame_msgs = jnp.repeat(
                msgs, n // msgs.shape[0], axis=0)
            if preds.ndim == 4:          # pixelwise extractor
                # select bits by the augmented mask at the extractor's
                # spatial resolution (metrics.py:150-178)
                m_res = resize_bilinear(mask_aug, preds.shape[1],
                                        preds.shape[2])
                # nanmean: items whose augmented mask is empty yield NaN
                # from bit_accuracy (reference masked_select semantics) and
                # are excluded from the row mean
                out["bit_acc"] = jnp.nanmean(bit_accuracy(
                    preds[..., 1:], frame_msgs, mask=m_res))
                if want_det:
                    m_orig = resize_bilinear(mask_b, preds.shape[1],
                                             preds.shape[2])
                    mp = preds[..., :1]
                    out["acc"] = jnp.mean(pixel_accuracy(mp, m_orig))
                    out["miou"] = 0.5 * (
                        jnp.mean(iou(mp, m_orig, label=0))
                        + jnp.mean(iou(mp, m_orig, label=1)))
            else:
                out["bit_acc"] = jnp.mean(bit_accuracy(
                    preds[..., 1:], frame_msgs))
            return out
        return jax.jit(_row)

    rows = [(f"{aug.name}_{st}", make_row(aug, st))
            for aug, strengths in grid for st in strengths]

    if validation_masks is None:
        masks_list = [np.ones((1, 1, 1), np.float32)]  # broadcasts to any HW
    else:
        masks_list = [np.asarray(m, np.float32) for m in validation_masks]
        masks_list = [m[..., None] if m.ndim == 2 else m for m in masks_list]

    def eval_fn(state, imgs, key):
        imgs = jnp.asarray(imgs, jnp.float32)
        bsz = imgs.shape[0]
        msgs = jax.random.randint(key, (bsz, cfg.nbits), 0, 2)
        imgs_w = embed_fn(state, imgs, msgs)
        p, ss_ = quality_fn(imgs_w, imgs)
        scalars = {"psnr": float(p), "ssim": float(ss_)}
        for mask_id, mask in enumerate(masks_list):
            mj = jnp.asarray(mask)
            sfx = "" if mask_id == 0 else f"_mask{mask_id}"
            for name, fn in rows:
                vals = fn(state, imgs, imgs_w, mj, msgs)
                for k, v in vals.items():
                    key_name = (f"bit_acc_{name}{sfx}" if k == "bit_acc"
                                else f"{k}_{name}{sfx}")
                    scalars[key_name] = float(v)
        return scalars, imgs_w

    return eval_fn
