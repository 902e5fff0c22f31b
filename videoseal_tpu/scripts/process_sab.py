"""Prepare an SA-1B-style image directory for training.

Parity: reference scripts/process_sab.py — deterministically splits a flat
image directory into test (first `num_test` files, sorted), val (next
`num_val`) and train (the rest), resizing train images to `size`x`size`.
The reference hardcodes its cluster paths and runs 10 srun jobs; here the
paths are flags and sharding is `--num_shards/--shard` (run one process per
shard under any launcher).

Usage:
  python -m videoseal_tpu.scripts.process_sab SRC DST \
      [--size 256] [--num_test 1000] [--num_val 1000] \
      [--num_shards 1] [--shard 0] [--workers 0]
"""

from __future__ import annotations

import argparse
import os
import shutil

EXTS = (".jpg", ".jpeg", ".png")


def list_images(src: str) -> list[str]:
    return sorted(f for f in os.listdir(src) if f.lower().endswith(EXTS))


def split_files(files: list[str], num_test: int, num_val: int):
    """(test, val, train) — reference semantics: leading files become the
    held-out splits, copied unresized; the remainder trains at low res."""
    return (files[:num_test], files[num_test:num_test + num_val],
            files[num_test + num_val:])


def process_one(src_path: str, dst_path: str, size: int | None) -> None:
    if os.path.exists(dst_path):
        return
    if size is None:
        shutil.copyfile(src_path, dst_path)
        return
    from PIL import Image
    with Image.open(src_path) as img:
        img.resize((size, size)).save(dst_path)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--size", type=int, default=256,
                    help="train-split resize (test/val keep full res)")
    ap.add_argument("--num_test", type=int, default=1000)
    ap.add_argument("--num_val", type=int, default=1000)
    ap.add_argument("--num_shards", type=int, default=1)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--workers", type=int, default=0,
                    help="process pool size; 0 = in-process")
    args = ap.parse_args(argv)

    files = list_images(args.src)
    test, val, train = split_files(files, args.num_test, args.num_val)
    for split in ("train", "test", "val"):
        os.makedirs(os.path.join(args.dst, split), exist_ok=True)

    jobs = ([(f, "test", None) for f in test]
            + [(f, "val", None) for f in val]
            + [(f, "train", args.size) for f in train])
    jobs = jobs[args.shard::args.num_shards]

    def run(job):
        f, split, size = job
        process_one(os.path.join(args.src, f),
                    os.path.join(args.dst, split, f), size)

    if args.workers > 0:
        from multiprocessing import Pool
        with Pool(args.workers) as pool:
            pool.map(run, jobs)
    else:
        for job in jobs:
            run(job)
    print(f"shard {args.shard}/{args.num_shards}: {len(jobs)} files "
          f"(splits: {len(test)} test / {len(val)} val / {len(train)} train)")


if __name__ == "__main__":
    main()
