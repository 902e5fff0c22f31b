"""Run the full robustness eval on a TRAINING checkpoint (train-state npz).

Bridges train.py's TrainState checkpoints to the serving model + eval
harness: rebuilds the embedder/extractor exactly as train.py did, restores
the trained params, wraps them in a VideoSeal, and runs evals.full.evaluate
(aug x strength sweep -> metrics.csv).

    python -m videoseal_tpu.tools.eval_checkpoint \
        --checkpoint outputs/convergence_r2/stageB/checkpoint.npz \
        --card videoseal_1.0 --nbits 32 --img_size 128 --scaling_w 0.4 \
        --samples 4 --out_csv outputs/convergence_r2/stageB/metrics.csv
"""

from __future__ import annotations

import argparse

import numpy as np


def load_trained_model(checkpoint: str, card: str = "videoseal_1.0",
                       nbits: int = 32, img_size: int = 128,
                       scaling_w: float = 0.4, attenuation: str = "jnd_1_1"):
    """TrainState npz -> serving VideoSeal (same construction as train.py)."""
    import jax.numpy as jnp
    import optax

    from ..models.embedder import build_embedder
    from ..models.extractor import build_extractor
    from ..models.videoseal import PipelineConfig, VideoSeal
    from ..modules.discriminator import NLayerDiscriminator
    from ..modules.jnd import build_attenuation
    from ..augmentation.augmenter import build_augmenter
    from ..losses.videosealloss import VideoSealLoss
    from ..parallel.trainer import TrainerModules, create_train_state
    from ..utils import checkpoint as ckpt_io
    from ..utils.cfg import load_card

    c = load_card(card)
    cargs = c["args"]
    emb = build_embedder(c["embedder"]["model"], c["embedder"]["params"],
                         nbits, float(cargs.get("hidden_size_multiplier", 2)))
    ext = build_extractor(c["extractor"]["model"], c["extractor"]["params"],
                          img_size, nbits)
    cfg = PipelineConfig(img_size=img_size, yuv=emb.yuv, nbits=nbits,
                         blending_method=cargs.get("blending_method",
                                                   "additive"))
    att = build_attenuation(attenuation)
    mods = TrainerModules(
        embedder=emb.module, extractor=ext.module,
        discriminator=NLayerDiscriminator(n_layers=2),
        augmenter=build_augmenter({"masks": {"kind": None},
                                   "augs": {"identity": 1},
                                   "augs_params": {}}, num_augs=1),
        attenuation=att, cfg=cfg,
        loss=VideoSealLoss(balanced=False, percep_loss="none"))
    template = create_train_state(mods, optax.adamw(1e-4), optax.adamw(1e-4),
                                  seed=0, scaling_w=scaling_w)
    state = ckpt_io.load_train_state(checkpoint, template)
    evars = {"params": state.embedder_params}
    if state.embedder_stats:
        evars["batch_stats"] = state.embedder_stats
    return VideoSeal(emb, ext, evars, {"params": state.extractor_params},
                     att, cfg, scaling_w=scaling_w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--nbits", type=int, default=32)
    ap.add_argument("--img_size", type=int, default=128)
    ap.add_argument("--scaling_w", type=float, default=0.4)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--sample_size", type=int, default=128)
    ap.add_argument("--out_csv", default="metrics.csv")
    ap.add_argument("--is_video", type=int, default=0)
    args = ap.parse_args()

    from ..data.datasets import SyntheticImages
    from ..evals.full import evaluate

    model = load_trained_model(args.checkpoint, args.card, args.nbits,
                               args.img_size, args.scaling_w)
    ds = SyntheticImages(args.samples, img_size=args.sample_size, seed=123)
    samples = [np.stack([ds[i][0]]) for i in range(args.samples)]
    rows = evaluate(model, samples, is_video=bool(args.is_video),
                    out_csv=args.out_csv, bdrate=False)
    # compact summary: mean bit_acc per aug
    agg: dict = {}
    for r in rows:
        key = f"{r['aug']}_{r['strength']}"
        agg.setdefault(key, []).append(r.get("bit_acc", float("nan")))
    print("== mean bit accuracy per attack ==")
    for k, v in agg.items():
        print(f"  {k}: {np.nanmean(v):.4f}")


if __name__ == "__main__":
    main()
