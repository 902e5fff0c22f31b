"""Training entry point (parity: reference train.py).

Wires dataset -> Augmenter -> GAN train step (parallel/trainer.py) -> periodic
eval + checkpointing. Single-host multi-chip data parallelism comes from the
mesh; multi-host works after jax.distributed.initialize() (flag).

Smoke run (synthetic data, tiny model):
  python -m videoseal_tpu.train --synthetic 1 --steps 20 --tiny 1
Real run:
  python -m videoseal_tpu.train --card videoseal_1.0 \
      --image_dataset /data/coco --epochs 100 --iter_per_epoch 1000
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser("videoseal_tpu training")
    # model
    p.add_argument("--card", default="videoseal_1.0",
                   help="model card providing embedder/extractor configs")
    p.add_argument("--embedder_model", default=None,
                   help="preset from configs/embedder.yaml (overrides card)")
    p.add_argument("--extractor_model", default=None,
                   help="preset from configs/extractor.yaml (overrides card)")
    p.add_argument("--nbits", type=int, default=None)
    p.add_argument("--img_size", type=int, default=None,
                   help="processing resolution (overrides the card's "
                        "img_size_proc when given)")
    p.add_argument("--scaling_w", type=float, default=0.2)
    p.add_argument("--scaling_w_schedule", default=None,
                   help='e.g. "Cosine,scaling_min=0.2,start_epoch=200,epochs=200"')
    p.add_argument("--scaling_i", type=float, default=1.0)
    p.add_argument("--attenuation", default="jnd_1_1")
    # losses (train.py lambda_* flags)
    p.add_argument("--lambda_dec", type=float, default=1.0)
    p.add_argument("--lambda_det", type=float, default=0.0)
    p.add_argument("--lambda_i", type=float, default=0.5)
    p.add_argument("--lambda_d", type=float, default=0.1)
    p.add_argument("--perceptual_loss", default="yuv")
    p.add_argument("--balanced", type=int, default=0)  # reference train.py:179
    p.add_argument("--total_gnorm", type=float, default=1.0)
    p.add_argument("--disc_start", type=int, default=0)
    p.add_argument("--disc_num_layers", type=int, default=2)
    p.add_argument("--sleepwake", type=int, default=0,
                   help="alternate disc/gen epochs (train.py:610-614)")
    p.add_argument("--temperature", type=float, default=1.0)
    # optimizers
    p.add_argument("--optimizer", default="AdamW,lr=1e-4")
    p.add_argument("--optimizer_d", default="AdamW,lr=5e-5")
    p.add_argument("--scheduler", default=None)
    # data
    p.add_argument("--image_dataset", default=None)
    p.add_argument("--video_dataset", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--batch_size_video", type=int, default=1)
    p.add_argument("--frames_per_clip", type=int, default=16)
    p.add_argument("--prop_img_vid", type=float, default=0.5,
                   help="fraction of video epochs in hybrid modality")
    p.add_argument("--augmentation_config", default=None,
                   help="YAML with {masks, augs, augs_params}")
    p.add_argument("--num_augs", type=int, default=2)
    # schedule
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--iter_per_epoch", type=int, default=1000)
    p.add_argument("--steps", type=int, default=None,
                   help="override: total steps (smoke runs)")
    p.add_argument("--seed", type=int, default=444)
    p.add_argument("--tiny", type=int, default=0, help="tiny debug model")
    # io
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--saveckpt_freq", type=int, default=10)
    p.add_argument("--eval_freq", type=int, default=5,
                   help="run the in-training eval sweep every N epochs "
                        "(reference train.py:532-544; 0 disables)")
    p.add_argument("--eval_augs", default="subset",
                   choices=["identity", "subset", "geometric", "full"],
                   help="validation grid for the in-training sweep")
    p.add_argument("--eval_samples", type=int, default=8,
                   help="held-out images for the in-training eval")
    p.add_argument("--tensorboard", type=int, default=1,
                   help="write TB scalars + snapshot images (train.py:679-701)")
    p.add_argument("--resume", default=None)
    p.add_argument("--reset_disc", type=int, default=0,
                   help="on --resume, keep a FRESH discriminator (+ its opt "
                        "state) instead of the checkpoint's. A stale disc "
                        "from an earlier GAN stage is instantly confident "
                        "against the resumed watermark and its hinge-G "
                        "gradient crushes the message before the disc gate "
                        "(--disc_start, compared against the RESTORED global "
                        "step) would let a scratch disc warm up.")
    p.add_argument("--ckpt_format", default="npz", choices=["npz", "orbax"],
                   help="orbax: sharded multi-host checkpoints (per-host "
                        "shard writes; resharding resume)")
    p.add_argument("--distributed", type=int, default=0,
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("--cpu", type=int, default=0,
                   help="pin everything to host CPU devices (debug runs that "
                        "must not touch the TPU; the axon plugin ignores "
                        "JAX_PLATFORMS=cpu so this pins jax_default_device)")
    return p


TINY_CARD = {
    "args": {"attenuation": "jnd_1_1", "nbits": 16, "hidden_size_multiplier": 2,
             "img_size_proc": 64, "blending_method": "additive",
             "scaling_w": 0.2, "scaling_i": 1.0},
    "embedder": {"model": "unet_tiny_yuv", "params": {
        "msg_processor": {"msg_processor_type": "binary+concat"},
        "unet": {"in_channels": 1, "out_channels": 1, "z_channels": 8,
                 "num_blocks": 2, "activation": "relu", "normalization": "batch",
                 "z_channels_mults": [1, 2], "last_tanh": True}}},
    "extractor": {"model": "convnext_tiny", "params": {
        "encoder": {"depths": [1, 1, 2, 1], "dims": [16, 32, 64, 128]},
        "pixel_decoder": {"pixelwise": False, "upscale_stages": [1],
                          "embed_dim": 128, "sigmoid_output": False}}},
}

DEFAULT_AUGS = {
    "masks": {"kind": None},
    "augs": {"identity": 4, "jpeg": 1, "resize": 1, "crop": 1, "rotate": 1,
             "hflip": 1, "perspective": 1, "gaussian_blur": 1, "median_filter": 1,
             "brightness": 1, "contrast": 1, "saturation": 1, "hue": 1,
             "h264": 1, "h264rgb": 1, "h265": 1},
    "augs_params": {
        "resize": {"min_size": 0.7, "max_size": 1.5},
        "crop": {"min_size": 0.5, "max_size": 1.0},
        "rotate": {"min_angle": -10, "max_angle": 10, "do90": True},
        "perspective": {"min_distortion_scale": 0.1, "max_distortion_scale": 0.5},
        "jpeg": {"min_quality": 40, "max_quality": 80},
        "gaussian_blur": {"min_kernel_size": 3, "max_kernel_size": 17},
        "median_filter": {"min_kernel_size": 3, "max_kernel_size": 3},
        "brightness": {"min_factor": 0.5, "max_factor": 2},
        "contrast": {"min_factor": 0.5, "max_factor": 2.0},
        "saturation": {"min_factor": 0.5, "max_factor": 2},
        "hue": {"min_factor": -0.1, "max_factor": 0.1},
        "h264": {"min_crf": 28, "max_crf": 36},
        "h264rgb": {"min_crf": 28, "max_crf": 36},
        "h265": {"min_crf": 28, "max_crf": 36},
    },
}


def _save_ckpt(args, state):
    """npz from host 0, or collective sharded orbax (utils/checkpoint.py)."""
    import jax
    from .utils import checkpoint as ckpt_io
    if args.ckpt_format == "orbax":
        ckpt_io.save_train_state_orbax(
            os.path.join(os.path.abspath(args.output_dir), "ckpts"), state)
    elif jax.process_index() == 0:
        ckpt_io.save_train_state(
            os.path.join(args.output_dir, "checkpoint.npz"), state)


def main(args=None):
    args = args or get_parser().parse_args()
    import jax
    import jax.numpy as jnp
    import optax
    import yaml

    if args.distributed:
        jax.distributed.initialize()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from .augmentation.augmenter import build_augmenter
    from .losses.videosealloss import VideoSealLoss
    from .models.embedder import build_embedder
    from .models.extractor import build_extractor
    from .models.videoseal import PipelineConfig
    from .modules.discriminator import NLayerDiscriminator
    from .modules.jnd import build_attenuation
    from .parallel import mesh as pmesh
    from .parallel.trainer import TrainerModules, create_train_state, make_train_step
    from .utils.cfg import load_card
    from .utils.optim import (ScalingSchedule, build_lr_schedule,
                              build_optimizer, parse_params)
    from .utils.logger import MetricLogger
    from .utils import checkpoint as ckpt_io

    os.makedirs(args.output_dir, exist_ok=True)
    card = TINY_CARD if args.tiny else load_card(args.card)
    cargs = card["args"]
    nbits = args.nbits or int(cargs.get("nbits", 256))
    img_size = int(args.img_size or cargs.get("img_size_proc", 256))

    # preset overrides (parity: --embedder_model/--extractor_model flags,
    # resolved against configs/{embedder,extractor}.yaml)
    cfg_dir = os.path.join(os.path.dirname(__file__), "configs")
    if args.embedder_model:
        with open(os.path.join(cfg_dir, "embedder.yaml")) as f:
            presets = yaml.safe_load(f)
        card["embedder"] = {"model": args.embedder_model,
                            "params": presets[args.embedder_model]}
    if args.extractor_model:
        with open(os.path.join(cfg_dir, "extractor.yaml")) as f:
            presets = yaml.safe_load(f)
        card["extractor"] = {"model": args.extractor_model,
                             "params": presets[args.extractor_model]}

    emb = build_embedder(card["embedder"]["model"], card["embedder"]["params"],
                         nbits, float(cargs.get("hidden_size_multiplier", 2)))
    ext = build_extractor(card["extractor"]["model"], card["extractor"]["params"],
                          img_size, nbits)
    if args.augmentation_config:
        with open(args.augmentation_config) as f:
            aug_cfg = yaml.safe_load(f)
    else:
        aug_cfg = DEFAULT_AUGS

    # Mask families (reference augmenter.py:173-176 composites
    # MixedMaskEmbedder masks into every step). kind "mixed" routes to the
    # host-side reference-distribution samplers (masks_host.py) feeding the
    # jitted step's mask input via kind "segmentation" passthrough; the
    # fully-fused on-device families stay available as kind "mixed_device".
    mask_cfg = dict(aug_cfg.get("masks") or {"kind": None})
    host_mask_embedder = None
    if mask_cfg.get("kind") in ("mixed", "host", "mixed_host"):
        from .augmentation.masks_host import get_mask_embedder
        host_mask_embedder = get_mask_embedder(
            "mixed", seed=args.seed,
            **{k: v for k, v in mask_cfg.items() if k != "kind"})
        aug_cfg = {**aug_cfg, "masks": {"kind": "segmentation"}}
    elif mask_cfg.get("kind") == "mixed_device":
        aug_cfg = {**aug_cfg, "masks": {**mask_cfg, "kind": "mixed"}}
    augmenter = build_augmenter(aug_cfg, num_augs=args.num_augs)
    cfg = PipelineConfig(img_size=img_size, yuv=emb.yuv, nbits=nbits,
                         blending_method=cargs.get("blending_method", "additive"))
    mods = TrainerModules(
        embedder=emb.module, extractor=ext.module,
        discriminator=NLayerDiscriminator(n_layers=args.disc_num_layers),
        augmenter=augmenter, attenuation=build_attenuation(args.attenuation),
        cfg=cfg,
        loss=VideoSealLoss(balanced=bool(args.balanced), total_norm=args.total_gnorm,
                           disc_weight=args.lambda_d, percep_weight=args.lambda_i,
                           detect_weight=args.lambda_det, decode_weight=args.lambda_dec,
                           disc_start=args.disc_start,
                           percep_loss=args.perceptual_loss),
        scaling_i=args.scaling_i, temperature=args.temperature,
        balanced=bool(args.balanced))

    base_lr = parse_params(args.optimizer).get("lr", 1e-4)
    sched = build_lr_schedule(args.scheduler, args.iter_per_epoch, base_lr)
    opt_g = build_optimizer(args.optimizer, schedule=sched if args.scheduler else None)
    opt_d = build_optimizer(args.optimizer_d)
    state = create_train_state(mods, opt_g, opt_d, seed=args.seed,
                               scaling_w=args.scaling_w)
    if args.resume:
        fresh = state
        if args.ckpt_format == "orbax" or os.path.isdir(args.resume):
            state, _ = ckpt_io.load_train_state_orbax(args.resume, state)
        else:
            state = ckpt_io.load_train_state(args.resume, state)
        if args.reset_disc:
            state = state.replace(disc_params=fresh.disc_params,
                                  opt_state_d=fresh.opt_state_d)

    scaling_sched = (ScalingSchedule(args.scaling_w_schedule, args.scaling_w)
                     if args.scaling_w_schedule else None)

    # data: image and/or video datasets; hybrid modality picks per epoch
    # (parity: train.py:471-495 modality selection)
    from .data.loader import DataLoader
    loaders = {}
    if args.synthetic or not (args.image_dataset or args.video_dataset):
        from .data.datasets import SyntheticImages
        ds = SyntheticImages(4096, img_size=img_size, seed=args.seed)
        loaders["img"] = DataLoader(ds, args.batch_size, seed=args.seed,
                                    process_index=jax.process_index(),
                                    process_count=jax.process_count())
    if args.image_dataset and not args.synthetic:
        from .data.datasets import ImageFolder
        ds = ImageFolder(args.image_dataset, img_size=img_size)
        loaders["img"] = DataLoader(ds, args.batch_size, seed=args.seed,
                                    process_index=jax.process_index(),
                                    process_count=jax.process_count())
    if args.video_dataset:
        from .data.datasets import VideoClipDataset
        vds = VideoClipDataset(args.video_dataset,
                               frames_per_clip=args.frames_per_clip,
                               img_size=img_size, seed=args.seed)
        loaders["vid"] = DataLoader(vds, args.batch_size_video, seed=args.seed,
                                    process_index=jax.process_index(),
                                    process_count=jax.process_count())

    mesh = pmesh.make_mesh(devices=jax.devices("cpu") if args.cpu else None)

    # Synthetic single-chip runs: keep the whole dataset device-resident
    # (u8) and gather batches ON DEVICE. The per-step host->device batch
    # upload rides a ~15-100 MB/s tunnel here (6.3 MB/step at 128px b32 =
    # hundreds of ms) and was the training-throughput bottleneck; with the
    # pool, per-step transfer is 32 indices.
    device_pool = None
    if (args.synthetic and host_mask_embedder is None
            and jax.process_count() == 1 and mesh.devices.size == 1):
        ds_pool = loaders["img"].ds
        pool_np = np.stack([
            np.clip(ds_pool[i][0] * 255.0, 0, 255).astype(np.uint8)
            for i in range(len(ds_pool))])
        device_pool = jax.device_put(
            pool_np, jax.devices("cpu")[0] if args.cpu else None)
        pool_rng = np.random.default_rng(args.seed + 7)

        @jax.jit
        def gather_batch(pool, idx):
            return {"imgs": pool[idx].astype(jnp.float32) * (1.0 / 255.0)}

    def build_steps(mode):
        fns = {"img": make_train_step(mods, opt_g, opt_d, is_video=False, mode=mode)}
        if "vid" in loaders:
            fns["vid"] = make_train_step(mods, opt_g, opt_d, is_video=True, mode=mode)
        return fns

    step_fns_by_mode = {"both": build_steps("both")}
    if args.sleepwake:
        step_fns_by_mode = {"gen": build_steps("gen"), "disc": build_steps("disc")}
    logger = MetricLogger()
    key = jax.random.PRNGKey(args.seed)
    modality_rng = np.random.default_rng(args.seed)

    # --- observability + in-training eval (reference train.py:532-544,
    # 679-701,718-882): TB scalars every log step, an aug x strength
    # detection sweep + orig/wm/diff snapshots every eval_freq epochs ---
    from .utils.tensorboard import TensorboardWriter
    is_main = jax.process_index() == 0
    writer = TensorboardWriter(os.path.join(args.output_dir, "tensorboard"),
                               enabled=bool(args.tensorboard) and is_main)
    eval_fn = None
    eval_fn_vid = None
    eval_imgs = None
    eval_clips = None
    if args.eval_freq and "img" in loaders:
        from .evals.intrain import make_intrain_eval
        # representative validation masks (reference train.py:451-452) —
        # only when localization is actually trained (lambda_det > 0);
        # otherwise the all-ones default mirrors NoMaskEmbedder.
        val_masks = None
        if host_mask_embedder is not None and args.lambda_det > 0:
            val_masks = [m[0] for m in
                         host_mask_embedder.sample_representative_masks(
                             img_size, img_size)]
        eval_fn = make_intrain_eval(mods, eval_augs=args.eval_augs,
                                    lambda_det=args.lambda_det,
                                    validation_masks=val_masks)
        ds_eval = loaders["img"].ds
        n_eval = min(args.eval_samples, len(ds_eval))
        eval_imgs = np.stack([ds_eval[i][0] for i in range(n_eval)])
    if args.eval_freq and "vid" in loaders:
        from .evals.intrain import make_intrain_eval
        eval_fn_vid = make_intrain_eval(mods, eval_augs=args.eval_augs,
                                        lambda_det=args.lambda_det,
                                        is_video=True)
        vds_eval = loaders["vid"].ds
        n_eval_v = min(max(1, args.eval_samples // args.frames_per_clip),
                       len(vds_eval))
        eval_clips = np.stack([vds_eval[i][0] for i in range(n_eval_v)])

    def run_eval(state, epoch, it):
        rows = []
        if eval_fn is not None:
            rows.append(("", eval_fn, eval_imgs))
        if eval_fn_vid is not None:
            rows.append(("vid_", eval_fn_vid, eval_clips))
        for prefix, fn, batch in rows:
            scalars, imgs_w = fn(state, batch, jax.random.PRNGKey(args.seed + 1))
            scalars = {prefix + k: v for k, v in scalars.items()}
            if not is_main:
                continue
            writer.add_scalars("valid", scalars, it)
            with open(os.path.join(args.output_dir, "eval.jsonl"), "a") as f:
                f.write(json.dumps({"epoch": epoch, "step": it,
                                    "modality": prefix.rstrip("_") or "img",
                                    **scalars}) + "\n")
            from .utils.display import create_diff_img, save_img
            snap = os.path.join(args.output_dir, "snapshots")
            os.makedirs(snap, exist_ok=True)
            ori = np.asarray(batch).reshape((-1,) + batch.shape[-3:])
            wm = np.asarray(imgs_w).reshape((-1,) + imgs_w.shape[-3:])
            for i in range(min(2, wm.shape[0])):
                save_img(ori[i], os.path.join(
                    snap, f"{epoch:03d}_{prefix}{i}_ori.png"))
                save_img(wm[i], os.path.join(
                    snap, f"{epoch:03d}_{prefix}{i}_wm.png"))
                save_img(create_diff_img(ori[i], wm[i]),
                         os.path.join(snap, f"{epoch:03d}_{prefix}{i}_diff.png"))
            print("eval @ epoch", epoch,
                  json.dumps({k: round(v, 4) for k, v in scalars.items()}),
                  flush=True)

    total_steps = args.steps or args.epochs * args.iter_per_epoch
    log_path = os.path.join(args.output_dir, "log.txt")
    it = 0
    t_start = time.time()
    with mesh:
        state = jax.device_put(state, pmesh.replicated(mesh))
        epoch = 0
        while it < total_steps:
            if "vid" in loaders and "img" in loaders:
                modality = "vid" if modality_rng.random() < args.prop_img_vid else "img"
            else:
                modality = next(iter(loaders))
            loader = loaders[modality]
            loader.set_epoch(epoch)
            if args.sleepwake:
                step_fns = step_fns_by_mode["disc" if epoch % 2 == 1 else "gen"]
            else:
                step_fns = step_fns_by_mode["both"]
            if scaling_sched is not None:
                state = state.replace(scaling_w=jnp.float32(scaling_sched(epoch)))
            epoch_it = 0
            if device_pool is not None and modality == "img":
                batch_src = iter(lambda: "pool", None)     # sentinel stream
            else:
                batch_src = loader
            for batch in batch_src:
                # an "epoch" is iter_per_epoch steps (reference train.py
                # epoch semantics; loaders are effectively infinite)
                if it >= total_steps or epoch_it >= args.iter_per_epoch:
                    break
                epoch_it += 1
                key, k = jax.random.split(key)
                if batch == "pool":
                    idx = pool_rng.integers(0, device_pool.shape[0],
                                            args.batch_size)
                    batch = gather_batch(device_pool, jnp.asarray(idx))
                else:
                    if host_mask_embedder is not None:
                        imgs_np = np.asarray(batch["imgs"])
                        flat = imgs_np.reshape((-1,) + imgs_np.shape[-3:])
                        dsm = batch.get("masks")
                        dsm = (np.asarray(dsm).reshape(
                            (-1,) + flat.shape[1:3] + (1,))
                            if dsm is not None and np.asarray(dsm).size
                            else None)
                        m = host_mask_embedder(flat, dsm)
                        batch["masks"] = m.reshape(imgs_np.shape[:-1] + (1,))
                    batch = pmesh.shard_batch(mesh, batch)
                state, logs = step_fns[modality](state, batch, k)
                # Fetch logs only on log steps: a per-step host readback costs
                # a full tunnel RTT and serializes the dispatch pipeline.
                if it % 10 == 0:
                    logger.update(**{k2: float(v) for k2, v in
                                     jax.device_get(logs).items()})
                    if jax.process_index() == 0:
                        line = logger.line(
                            prefix=f"step {it}/{total_steps} [{modality}]")
                        print(line, flush=True)
                        with open(log_path, "a") as f:
                            f.write(json.dumps({"step": it, **logger.recent()})
                                    + "\n")
                        writer.add_scalars("train", logger.recent(), it)
                it += 1
            epoch += 1
            if epoch % args.saveckpt_freq == 0:
                _save_ckpt(args, state)
            if (eval_fn is not None or eval_fn_vid is not None) \
                    and epoch % args.eval_freq == 0:
                run_eval(state, epoch, it)
    _save_ckpt(args, state)
    writer.close()
    if jax.process_index() == 0:
        print(f"done: {it} steps in {time.time() - t_start:.1f}s; "
              f"final {logger.line()}", flush=True)
    return state, logger


if __name__ == "__main__":
    main()
