"""scripts/process_sab: deterministic split + train-split resize
(parity: reference scripts/process_sab.py split/resize semantics)."""

import os

import numpy as np
from PIL import Image

from videoseal_tpu.scripts.process_sab import main, split_files


def test_split_semantics():
    files = [f"{i:04d}.jpg" for i in range(10)]
    test, val, train = split_files(files, 2, 3)
    assert test == files[:2] and val == files[2:5] and train == files[5:]


def test_end_to_end_sharded(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8)
                        ).save(src / f"{i}.png")
    for shard in range(2):
        main([str(src), str(dst), "--size", "16", "--num_test", "2",
              "--num_val", "2", "--num_shards", "2", "--shard", str(shard)])
    assert sorted(os.listdir(dst / "test")) == ["0.png", "1.png"]
    assert sorted(os.listdir(dst / "val")) == ["2.png", "3.png"]
    assert sorted(os.listdir(dst / "train")) == [f"{i}.png" for i in range(4, 8)]
    with Image.open(dst / "train" / "4.png") as im:
        assert im.size == (16, 16)          # train resized
    with Image.open(dst / "test" / "0.png") as im:
        assert im.size == (48, 32)          # held-out splits keep full res
