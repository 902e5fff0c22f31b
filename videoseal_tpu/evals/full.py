"""Full robustness/quality evaluation (parity: videoseal/evals/full.py:56-376).

Per sample: embed -> quality metrics (PSNR/SSIM/MS-SSIM/Linf) -> for every
(augmentation, strength): attack the watermarked media, detect, compute bit
accuracy / p-value / log10-pvalue / capacity -> rows -> metrics.csv.

Run:
  python -m videoseal_tpu.evals.full --card videoseal_1.0 \
      --checkpoint ckpt.npz --dataset /path/to/images --is_video 0
(without --dataset, evaluates on procedural synthetic images — useful for
smoke/regression since the environment ships no SA-V data).
"""

from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np

import jax.numpy as jnp


def _lpips_fn():
    """Eval-time LPIPS (full.py:94 uses net='alex'; falls back to the vgg
    weights file, then to None -> NaN column) when no converted weights exist
    (zero-egress environment)."""
    from ..losses import lpips as L
    for name in ("lpips_alex", "lpips"):
        try:
            return L.build(name, None)
        except FileNotFoundError:
            continue
    return None


def evaluate(model, samples, is_video: bool = False, validation_augs=None,
             aggregation: str = "avg", out_csv: str | None = None,
             max_samples: int | None = None, verbose: bool = True,
             bdrate: bool = True, bdrate_crfs=(28, 34, 40, 46)):
    """samples: iterable of (F|B, H, W, 3) float arrays in [0,1].

    Returns list of per-(sample, aug, strength) metric dicts; optionally
    writes metrics.csv (parity: full.py:96-99,244-247).
    """
    from ..augmentation.validation import get_validation_augs
    from ..ops import metrics as M

    if validation_augs is None:
        validation_augs = get_validation_augs(is_video)
    lpips = _lpips_fn()
    if lpips is None and verbose:
        print("eval: LPIPS column skipped (no converted weights on disk — "
              "run tools/convert_lpips.py; column will be NaN)")

    rows = []
    for si, imgs in enumerate(samples):
        if max_samples is not None and si >= max_samples:
            break
        imgs = jnp.asarray(imgs, jnp.float32)
        t0 = time.time()
        outputs = model.embed(imgs, is_video=is_video)
        imgs_w, msgs = outputs["imgs_w"], outputs["msgs"]
        embed_time = time.time() - t0

        base = {
            "sample": si,
            "embed_time": embed_time,
            "psnr": float(M.psnr(imgs_w, imgs, is_video=is_video).mean()),
            "ssim": float(M.ssim(imgs_w, imgs).mean()),
            "msssim": float(M.ms_ssim(imgs_w, imgs).mean())
            if min(imgs.shape[-3:-1]) > 160 else float("nan"),
            "linf": float(M.linf(imgs_w, imgs)),
            # reference eval measures LPIPS on [-1,1] inputs (full.py:145-146)
            "lpips": float(lpips(2 * imgs_w - 1, 2 * imgs - 1))
            if lpips is not None else float("nan"),
        }
        if is_video:
            # optional: needs an ffmpeg with libvmaf (evals/vmaf.py);
            # reference records it for video evals (full.py:175-180)
            from .vmaf import vmaf_available, vmaf_on_tensor
            if not vmaf_available():
                if verbose and si == 0:
                    print("eval: VMAF/BD-rate columns skipped (no ffmpeg "
                          "with libvmaf on PATH)")
            else:
                base["vmaf"] = vmaf_on_tensor(np.asarray(imgs),
                                              np.asarray(imgs_w))
                if bdrate:
                    # Bjontegaard delta rate over a CRF sweep: watermarked vs
                    # original rate/VMAF curves (full.py:152-166)
                    r1, v1, r2, v2 = [], [], [], []
                    for crf in bdrate_crfs:
                        s, aux = vmaf_on_tensor(np.asarray(imgs),
                                                return_aux=True, crf=crf)
                        r1.append(aux["bps2"]); v1.append(s)
                        s, aux = vmaf_on_tensor(np.asarray(imgs_w),
                                                return_aux=True, crf=crf)
                        r2.append(aux["bps2"]); v2.append(s)
                    if any(x is None for x in v1 + v2):
                        if verbose:
                            print(f"eval: BD-rate skipped for sample {si} "
                                  "(a VMAF run in the CRF sweep returned None)")
                    else:
                        base.update({
                            "r1": "_".join(f"{x:.4g}" for x in r1),
                            "vmaf1": "_".join(f"{x:.4g}" for x in v1),
                            "r2": "_".join(f"{x:.4g}" for x in r2),
                            "vmaf2": "_".join(f"{x:.4g}" for x in v2),
                            "bd_rate": float(M.bd_rate(r1, v1, r2, v2)),
                        })

        mask = jnp.ones_like(imgs_w[..., :1])
        for aug, strengths in validation_augs:
            for strength in strengths:
                imgs_att, _ = aug.apply_strength(imgs_w, mask, strength)
                t0 = time.time()
                if is_video:
                    preds = model.detect(imgs_att, is_video=True)["preds"]
                    if preds.ndim == 4:
                        preds = preds.mean(axis=(1, 2))
                    from ..models.videoseal import aggregate_message
                    decoded = aggregate_message(preds, aggregation)  # (1, k)
                    bit_acc = float(jnp.mean(
                        (decoded > 0.5) == (msgs[:1] > 0.5)))
                else:
                    preds = model.detect(imgs_att, is_video=False)["preds"]
                    bits = preds[..., 1:]
                    bit_acc = float(M.bit_accuracy(bits, msgs).mean())
                extract_time = time.time() - t0
                loc = {}
                if preds.ndim == 4:  # pixelwise extractor: localization metrics
                    det = preds[..., 0:1]
                    tgt = jnp.ones_like(det)
                    loc = {
                        "iou1": float(M.iou(det, tgt, label=1).mean()),
                        "acc": float(M.accuracy(det, tgt).mean()),
                        "bit_acc_1msg": float(M.bit_accuracy_1msg(
                            preds[..., 1:], msgs).mean()),
                    }
                pv = float(M.pvalue(np.asarray([bit_acc]), model.nbits)[0])
                row = dict(base)
                row.update({
                    "aug": repr(aug), "strength": str(strength),
                    "bit_acc": bit_acc, "pvalue": pv,
                    "log10_pvalue": math.log10(max(pv, 1e-300)),
                    "capacity": float(M.capacity(jnp.asarray([bit_acc]),
                                                 model.nbits)[0]),
                    "extract_time": extract_time,
                    **loc,
                })
                rows.append(row)
                if verbose:
                    print(f"[{si}] {row['aug']}@{strength}: "
                          f"bit_acc={bit_acc:.3f} psnr={base['psnr']:.2f}")
    if out_csv:
        import pandas as pd
        pd.DataFrame(rows).to_csv(out_csv, index=False)
        if verbose:
            print(f"wrote {out_csv} ({len(rows)} rows)")
    return rows


def synthetic_samples(n: int, shape=(4, 256, 256, 3), seed: int = 0):
    """Procedural photo-like samples (gradients + texture), FakeData analog
    (evals/flops.py:122-133)."""
    rng = np.random.default_rng(seed)
    for _ in range(n):
        b, h, w, c = shape
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack([yy / h, xx / w, (xx + yy) / (h + w)], -1)[None]
        tex = rng.normal(0, 0.08, (b, h // 8, w // 8, c)).astype(np.float32)
        tex = np.repeat(np.repeat(tex, 8, 1), 8, 2)
        phase = rng.uniform(0, 2 * np.pi, (b, 1, 1, 1)).astype(np.float32)
        waves = 0.1 * np.sin(xx[None, ..., None] / rng.uniform(3, 17) + phase)
        yield np.clip(base + tex + waves, 0, 1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--is_video", type=int, default=0)
    ap.add_argument("--num_samples", type=int, default=2)
    ap.add_argument("--output_dir", default="outputs")
    ap.add_argument("--scaling_w", type=float, default=None)
    ap.add_argument("--videoseal_step_size", type=int, default=None)
    ap.add_argument("--video_aggregation", default="avg")
    ap.add_argument("--only_identity", type=int, default=0)
    ap.add_argument("--bdrate", type=int, default=1,
                    help="BD-rate CRF sweep for video (full.py:152-166)")
    args = ap.parse_args()

    import videoseal_tpu as vs
    from ..augmentation.validation import get_validation_augs

    model = vs.load(args.card, checkpoint=args.checkpoint)
    if args.scaling_w is not None:  # override (full.py:317-336)
        model.scaling_w = args.scaling_w
    if args.videoseal_step_size is not None:
        import dataclasses
        model.cfg = dataclasses.replace(model.cfg, step_size=args.videoseal_step_size)

    if args.dataset:
        from ..data.datasets import iter_samples
        samples = iter_samples(args.dataset, is_video=bool(args.is_video))
    else:
        shape = (8, 256, 256, 3) if args.is_video else (4, 256, 256, 3)
        samples = synthetic_samples(args.num_samples, shape)

    os.makedirs(args.output_dir, exist_ok=True)
    augs = get_validation_augs(bool(args.is_video),
                               only_identity=bool(args.only_identity))
    evaluate(model, samples, is_video=bool(args.is_video), validation_augs=augs,
             aggregation=args.video_aggregation,
             out_csv=os.path.join(args.output_dir, "metrics.csv"),
             max_samples=args.num_samples, bdrate=bool(args.bdrate))


if __name__ == "__main__":
    main()
