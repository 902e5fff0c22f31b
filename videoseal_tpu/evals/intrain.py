"""In-training evaluation (parity: reference train.py:532-544,718-882).

Every ``eval_freq`` epochs the reference's ``eval_one_epoch`` embeds a
held-out batch, logs quality metrics, then runs a mask x aug x strength
detection sweep. TPU-first shape: the embed path and every (aug, strength)
row are each jitted ONCE at construction with the TrainState as an
*argument*, so repeated evals across epochs reuse the compiled programs (a
per-eval recompile would cost minutes through the remote-compile tunnel).

Rows come from augmentation/validation.py grids; image-mode grids are fully
jittable (differentiable JPEG proxy, warp-based geometry). Exact host codecs
stay in the offline eval (evals/full.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.blender import blend
from ..ops.color import rgb_to_y
from ..ops.metrics import bit_accuracy, psnr, ssim
from ..ops.resize import resize_bilinear


def make_intrain_eval(mods, eval_augs: str = "subset"):
    """Build jit-once eval closures over TrainerModules.

    Returns ``eval_fn(state, imgs, key) -> (scalars dict, imgs_w)`` where
    ``imgs`` is a held-out (B, H, W, 3) float batch in [0, 1].
    """
    from ..augmentation.validation import (get_validation_augs,
                                           get_validation_augs_geometric,
                                           get_validation_augs_subset)

    cfg = mods.cfg
    s = cfg.img_size

    def _embed(state, imgs, msgs):
        imgs_res = resize_bilinear(imgs, s, s)
        inp = rgb_to_y(imgs_res) if cfg.yuv else imgs_res
        variables = {"params": state.embedder_params}
        if state.embedder_stats:
            variables["batch_stats"] = state.embedder_stats
        preds_w = mods.embedder.apply(variables, inp, msgs)
        h, w = imgs.shape[-3], imgs.shape[-2]
        pw_full = resize_bilinear(preds_w, h, w)
        imgs_w = blend(cfg.blending_method, imgs, pw_full,
                       mods.scaling_i, state.scaling_w)
        if mods.attenuation is not None:
            imgs_w = mods.attenuation(imgs, imgs_w)
        if cfg.clamp:
            imgs_w = jnp.clip(imgs_w, 0.0, 1.0)
        return imgs_w

    embed_fn = jax.jit(_embed)
    quality_fn = jax.jit(lambda a, b: (jnp.mean(psnr(a, b)),
                                       jnp.mean(ssim(a, b))))

    if eval_augs == "identity":
        grid = get_validation_augs(is_video=False, only_identity=True)
    elif eval_augs == "full":
        grid = get_validation_augs(is_video=False)
    elif eval_augs == "geometric":
        grid = get_validation_augs_geometric(is_video=False)
    else:
        grid = get_validation_augs_subset(is_video=False)

    def make_row(aug, strength):
        def _row(state, imgs_w, msgs):
            mask = jnp.ones_like(imgs_w[..., :1])
            att, _ = aug.apply_strength(imgs_w, mask, strength)
            att = resize_bilinear(att, s, s)
            preds = mods.extractor.apply(
                {"params": state.extractor_params}, att)
            if preds.ndim == 4:          # pixelwise extractor
                preds = preds.mean(axis=(1, 2))
            return jnp.mean(bit_accuracy(preds[..., 1:], msgs))
        return jax.jit(_row)

    rows = [(f"{aug.name}_{st}", make_row(aug, st))
            for aug, strengths in grid for st in strengths]

    def eval_fn(state, imgs, key):
        imgs = jnp.asarray(imgs, jnp.float32)
        msgs = jax.random.randint(key, (imgs.shape[0], cfg.nbits), 0, 2)
        imgs_w = embed_fn(state, imgs, msgs)
        p, ss_ = quality_fn(imgs_w, imgs)
        scalars = {"psnr": float(p), "ssim": float(ss_)}
        for name, fn in rows:
            scalars[f"bit_acc_{name}"] = float(fn(state, imgs_w, msgs))
        return scalars, imgs_w

    return eval_fn
