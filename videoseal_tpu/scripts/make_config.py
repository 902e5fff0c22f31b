"""Extract a model card from a training checkpoint
(parity: scripts/make_config.py).

Our train CLI saves args alongside the checkpoint; this emits a
cards/*.yaml-style file for `videoseal_tpu.load()`.
"""

from __future__ import annotations

import argparse
import json

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--args_json", default=None,
                    help="training args json (defaults to <ckptdir>/args.json)")
    ap.add_argument("--output", default="card.yaml")
    args = ap.parse_args()

    import os
    args_path = args.args_json or os.path.join(
        os.path.dirname(args.checkpoint), "args.json")
    with open(args_path) as f:
        targs = json.load(f)
    card = {
        "checkpoint_path": os.path.abspath(args.checkpoint),
        "args": {k: targs[k] for k in
                 ("nbits", "img_size", "scaling_w", "scaling_i", "attenuation")
                 if k in targs},
        "embedder": targs.get("embedder_card", {}),
        "extractor": targs.get("extractor_card", {}),
    }
    with open(args.output, "w") as f:
        yaml.safe_dump(card, f, sort_keys=False)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
