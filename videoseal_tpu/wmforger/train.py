"""Preference-model training (parity: wmforger/train.py:48-606).

Trains a ConvNeXt extractor with nbits=0 as a real-vs-watermarked preference
model: BCE or Bradley-Terry (DPO Eq. 2) loss, artificial FFT watermarks, and
GRADIENT-PERTURBATION adversarial hardening — inner ascent steps on an
additive perturbation maximizing the "real" score, then training the model to
still rank the perturbed watermarked image below the real one
(wmforger/train.py:463-485). The inner loop is a jax.lax unrolled grad ascent
inside the jitted step (the torch version does Python-side autograd steps).

Smoke:
  python -m videoseal_tpu.wmforger.train --steps 5 --synthetic 1 --tiny 1
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def construct_loss(loss_type: str):
    """wmforger/train.py:127-139."""
    import jax.numpy as jnp

    def bce(logits, targets):
        return jnp.mean(jnp.maximum(logits, 0) - logits * targets
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))

    if loss_type == "bce":
        return lambda real, wm: (bce(real, jnp.ones_like(real))
                                 + bce(wm, jnp.zeros_like(wm)))
    if loss_type == "bt_nll":  # Bradley-Terry / DPO Eq. (2)
        return lambda real, wm: bce(real - wm, jnp.ones_like(real))
    raise NotImplementedError(f"Loss {loss_type} is not implemented.")


def adversarial_perturb(score_fn, imgs_w, key, n_steps: int,
                        min_perturbation: float = 1e-3,
                        max_perturbation: float = 3e-2,
                        use_grad_sign_only: bool = False,
                        use_rand_perturbation: bool = False):
    """Inner adversarial ascent (wmforger/train.py:463-480): n unrolled
    gradient-ascent steps on an additive perturbation maximizing
    mean(score_fn(imgs_w + pert)) — the attacker trying to make the
    watermarked image look 'real'. Module-level so tests can check the
    ascent raises the score monotonically."""
    import jax
    import jax.numpy as jnp

    if use_rand_perturbation:
        pert = (jax.random.uniform(key, imgs_w.shape) * 2 - 1) * min_perturbation
    else:
        pert = jnp.zeros_like(imgs_w)
    for i in range(n_steps):
        g = jax.grad(lambda p: -jnp.mean(score_fn(imgs_w + p)))(pert)
        lr = jax.random.uniform(jax.random.fold_in(key, i), (),
                                minval=min_perturbation, maxval=max_perturbation)
        step_vec = jnp.sign(g) if use_grad_sign_only else g
        pert = pert - lr * step_vec
    return jax.lax.stop_gradient(jnp.clip(imgs_w + pert, 0, 1))


def make_train_step(extractor, loss_type: str, optimizer,
                    n_perturbation_steps: int = 0,
                    min_perturbation: float = 1e-3,
                    max_perturbation: float = 3e-2,
                    use_grad_sign_only: bool = False,
                    use_rand_perturbation: bool = False,
                    grad_matching: bool = False,
                    grad_matching_weight: float = 1.0,
                    strength_contrasting: bool = False,
                    weak_alpha: float = 0.5, strong_alpha: float = 1.5,
                    alpha_range: float = 0.5):
    import jax
    import jax.numpy as jnp
    import optax

    loss_fn = construct_loss(loss_type)

    def score(params, x):
        return extractor.apply({"params": params}, x)[..., 0]

    def perturb(params, imgs_w, key):
        return adversarial_perturb(
            functools.partial(score, params), imgs_w, key,
            n_perturbation_steps, min_perturbation, max_perturbation,
            use_grad_sign_only, use_rand_perturbation)

    def train_step(params, opt_state, batch, key):
        imgs, imgs_w = batch["imgs"], batch["imgs_w"]

        def total_loss(p):
            real_logits = score(p, imgs)
            wm_logits = score(p, imgs_w)
            loss = loss_fn(real_logits, wm_logits)
            logs = {}
            if grad_matching:
                # 2nd-order: make d(score)/d(input) align with -watermark
                # (wmforger/train.py:398-420)
                gp = jax.grad(lambda pert: jnp.mean(score(p, imgs_w + pert)))(
                    jnp.zeros_like(imgs_w))
                watermark = imgs_w - imgs
                cos = (jnp.vdot(gp, -watermark)
                       / (jnp.linalg.norm(gp.ravel()) *
                          jnp.linalg.norm(watermark.ravel()) + 1e-12))
                loss2 = (1 - cos) * grad_matching_weight
                loss = loss + loss2
                logs["loss_2ndorder"] = loss2
            if n_perturbation_steps > 0:
                perturbed = perturb(jax.lax.stop_gradient(p), imgs_w, key)
                loss = loss + loss_fn(score(p, imgs), score(p, perturbed))
            if strength_contrasting:
                # rank weaker watermark above stronger one (train.py:427-452)
                k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
                wm = imgs_w - imgs
                a1 = weak_alpha + (jax.random.uniform(k1, ()) - 0.5) * alpha_range
                a2 = strong_alpha + (jax.random.uniform(k2, ()) - 0.5) * alpha_range
                weak = jnp.clip(imgs + a1 * wm, 0, 1)
                strong = jnp.clip(imgs + a2 * wm, 0, 1)
                loss_c = loss_fn(score(p, weak), score(p, strong))
                loss = loss + loss_c
                logs["loss_wm_contrasting"] = loss_c
            acc = ((real_logits > 0).mean() + (wm_logits < 0).mean()) / 2
            ranking = ((real_logits - wm_logits) > 0).mean()
            logs.update({"acc": acc, "ranking": ranking})
            return loss, logs

        (loss, logs), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
        # skip non-finite updates (train.py:455-461 guard)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_params, params)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state)
        logs["loss"] = loss
        return params, opt_state, logs

    return jax.jit(train_step, donate_argnums=(0, 1))


def main(args=None):
    p = argparse.ArgumentParser("wmforger preference-model training")
    p.add_argument("--loss", default="bt_nll", choices=["bce", "bt_nll"])
    p.add_argument("--generator", default="random",
                   choices=["random", "waves", "gaussian", "lines"])
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--n_perturbation_steps", type=int, default=1)
    p.add_argument("--use_grad_sign_only", type=int, default=0)
    p.add_argument("--use_rand_perturbation", type=int, default=0)
    p.add_argument("--grad_matching", type=int, default=0)
    p.add_argument("--grad_matching_weight", type=float, default=1.0)
    p.add_argument("--watermark_strength_contrasting", type=int, default=0)
    p.add_argument("--image_dataset", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--tiny", type=int, default=0)
    p.add_argument("--output", default="wmforger_ckpt.npz")
    p.add_argument("--cpu", type=int, default=0,
                   help="pin jax_default_device to the host CPU (escape "
                        "hatch when the TPU tunnel is down or busy; same "
                        "knob as train.py --cpu)")
    args = p.parse_args(args)

    import jax
    import optax

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from ..models.extractor import build_extractor
    from ..utils.checkpoint import flatten_tree
    from .generators import build_generator

    enc = ({"depths": [1, 1, 2, 1], "dims": [16, 32, 64, 128]} if args.tiny
           else {"depths": [3, 3, 9, 3], "dims": [96, 192, 384, 768]})
    spec = build_extractor("convnext_tiny", {
        "encoder": enc,
        "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                          "embed_dim": enc["dims"][-1],
                          "sigmoid_output": False}}, args.img_size, nbits=0)

    with jax.default_device(jax.devices("cpu")[0]):
        variables = spec.module.init(
            jax.random.PRNGKey(0),
            np.zeros((1, args.img_size, args.img_size, 3), np.float32))
    params = variables["params"]
    optimizer = optax.adamw(args.lr)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(spec.module, args.loss, optimizer,
                              n_perturbation_steps=args.n_perturbation_steps,
                              use_grad_sign_only=bool(args.use_grad_sign_only),
                              use_rand_perturbation=bool(args.use_rand_perturbation),
                              grad_matching=bool(args.grad_matching),
                              grad_matching_weight=args.grad_matching_weight,
                              strength_contrasting=bool(
                                  args.watermark_strength_contrasting))

    if args.image_dataset and not args.synthetic:
        from ..data.datasets import ImageFolder
        ds = ImageFolder(args.image_dataset, img_size=args.img_size)
    else:
        from ..data.datasets import SyntheticImages
        ds = SyntheticImages(4096, img_size=args.img_size)

    gen = build_generator(args.generator)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(args.steps):
        idx = rng.integers(0, len(ds), args.batch_size)
        imgs = np.stack([ds[int(i)][0] for i in idx])
        imgs_w = gen.embed(imgs)["imgs_w"].astype(np.float32)
        key, k = jax.random.split(key)
        params, opt_state, logs = step_fn(params, opt_state,
                                          {"imgs": imgs, "imgs_w": imgs_w}, k)
        if it % 10 == 0:
            print(f"step {it}: loss={float(logs['loss']):.4f} "
                  f"acc={float(logs['acc']):.3f} "
                  f"ranking={float(logs['ranking']):.3f}", flush=True)
    print(f"{args.steps} steps in {time.time()-t0:.1f}s")
    np.savez(args.output, **flatten_tree({"params": params}))
    print(f"saved {args.output}")
    return params


if __name__ == "__main__":
    main()
