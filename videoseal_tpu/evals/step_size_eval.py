"""Step-size robustness/speed sweep (parity: videoseal/evals/step_size_eval.py:41-236).

Re-runs the full evaluation for videoseal_step_size in {1,2,4,8,16} and
aggregates a summary CSV — the robustness/speed trade study for temporal
watermark propagation.

  python -m videoseal_tpu.evals.step_size_eval --card videoseal_1.0
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--step_sizes", default="1,2,4,8,16")
    ap.add_argument("--num_samples", type=int, default=2)
    ap.add_argument("--output_dir", default="outputs/step_size_eval")
    args = ap.parse_args()

    import pandas as pd
    import videoseal_tpu as vs
    from .full import evaluate, synthetic_samples
    from ..augmentation.validation import get_validation_augs_subset

    os.makedirs(args.output_dir, exist_ok=True)
    summary = []
    for step in [int(s) for s in args.step_sizes.split(",")]:
        model = vs.load(args.card, checkpoint=args.checkpoint)
        model.cfg = dataclasses.replace(model.cfg, step_size=step)
        # rebuild jitted fns with the new static config
        model = vs.models.VideoSeal(
            model.embedder_spec, model.extractor_spec, model.embedder_vars,
            model.extractor_vars, model.attenuation, model.cfg,
            scaling_w=model.scaling_w, scaling_i=model.scaling_i, card=model.card)
        rows = evaluate(model, synthetic_samples(args.num_samples, (16, 256, 256, 3)),
                        is_video=True,
                        validation_augs=get_validation_augs_subset(True),
                        out_csv=os.path.join(args.output_dir, f"metrics_step{step}.csv"),
                        verbose=False)
        df = pd.DataFrame(rows)
        summary.append({
            "step_size": step,
            "bit_acc": df["bit_acc"].mean(),
            "psnr": df["psnr"].mean(),
            "embed_time": df["embed_time"].mean(),
        })
        print(summary[-1])
    pd.DataFrame(summary).to_csv(os.path.join(args.output_dir, "summary.csv"),
                                 index=False)
    print(f"wrote {args.output_dir}/summary.csv")


if __name__ == "__main__":
    main()
