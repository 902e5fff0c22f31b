"""Data layer tests: datasets, loader sharding, native video reading."""

import os

import numpy as np
import pytest

from videoseal_tpu import native
from videoseal_tpu.data.datasets import (ImageFolder, SyntheticImages,
                                         VideoClipDataset, LRUDict)
from videoseal_tpu.data.loader import DataLoader


class TestSynthetic:
    def test_shapes_and_determinism(self):
        ds = SyntheticImages(10, img_size=64, seed=3)
        img, mask = ds[0]
        assert img.shape == (64, 64, 3) and mask.shape == (64, 64, 1)
        assert img.min() >= 0 and img.max() <= 1
        img2, _ = ds[0]
        np.testing.assert_array_equal(img, img2)
        img3, _ = ds[1]
        assert np.abs(img3 - img).max() > 0.01


class TestImageFolder:
    def test_folder_and_cache(self, tmp_path):
        import cv2
        for i in range(3):
            cv2.imwrite(str(tmp_path / f"im{i}.png"),
                        np.random.default_rng(i).integers(0, 255, (80, 100, 3),
                                                          dtype=np.uint8))
        ds = ImageFolder(str(tmp_path), img_size=64)
        assert len(ds) == 3
        img, mask = ds[0]
        assert img.shape == (64, 64, 3)
        assert os.path.exists(tmp_path / ".cache" / "paths.json")
        ds2 = ImageFolder(str(tmp_path), img_size=64)  # from cache
        assert len(ds2) == 3


class TestLoader:
    def test_host_sharding_partitions(self):
        ds = SyntheticImages(64, img_size=16)
        seen = []
        for pi in range(4):
            dl = DataLoader(ds, batch_size=4, shuffle=False, process_index=pi,
                            process_count=4)
            for batch in dl:
                assert batch["imgs"].shape == (4, 16, 16, 3)
            seen.append(len(dl))
        assert all(n == 4 for n in seen)  # 64 / 4 hosts / bs 4

    def test_shuffle_changes_with_epoch(self):
        ds = SyntheticImages(32, img_size=16)
        dl = DataLoader(ds, batch_size=8, seed=1)
        dl.set_epoch(0)
        b0 = next(iter(dl))["imgs"]
        dl.set_epoch(1)
        b1 = next(iter(dl))["imgs"]
        assert np.abs(b0 - b1).max() > 0


class TestLRUDict:
    def test_eviction(self):
        d = LRUDict(maxsize=2)
        assert d.get_or("a", lambda: 1) == 1
        assert d.get_or("b", lambda: 2) == 2
        d.get_or("a", lambda: -1)  # refresh a
        d.get_or("c", lambda: 3)   # evicts b
        assert "b" not in d and "a" in d


@pytest.mark.skipif(not native.available(), reason="native runtime not built")
class TestVideoClips:
    def test_clip_sampler_on_real_video(self, tmp_path):
        rng = np.random.default_rng(0)
        frames = rng.uniform(0, 1, (48, 64, 64, 3)).astype(np.float32)
        path = str(tmp_path / "v.mp4")
        native.encode_file(path, frames, codec="h264", crf=18, fps=24)
        ds = VideoClipDataset(str(tmp_path), frames_per_clip=8, img_size=64,
                              num_clips=2)
        assert len(ds) == 2
        clip, mask = ds[0]
        assert clip.shape == (8, 64, 64, 3)
        assert 0 <= clip.min() and clip.max() <= 1

    def test_corrupt_video_resampled(self, tmp_path):
        rng = np.random.default_rng(0)
        frames = rng.uniform(0, 1, (32, 64, 64, 3)).astype(np.float32)
        native.encode_file(str(tmp_path / "good.mp4"), frames, "h264", 18, 24)
        with open(tmp_path / "bad.mp4", "wb") as f:
            f.write(b"not a video")
        ds = VideoClipDataset(str(tmp_path), frames_per_clip=8, img_size=64,
                              num_clips=1)
        # both indices must return clips (bad one resamples to good)
        for i in range(len(ds)):
            clip, _ = ds[i]
            assert clip.shape == (8, 64, 64, 3)
