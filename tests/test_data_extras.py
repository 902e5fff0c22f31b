"""COCO masks (RLE decode), transforms, temporal augs, extra discriminators."""

import json
import os

import numpy as np
import pytest

from videoseal_tpu.utils import rle


class TestRLE:
    def test_uncompressed_runs(self):
        # column-major: 3 zeros, 4 ones, rest zeros in a 4x3 mask
        mask = rle._runs_to_mask([3, 4, 5], 4, 3)
        assert mask.shape == (4, 3)
        flat = mask.T.ravel()
        np.testing.assert_array_equal(flat[:3], 0)
        np.testing.assert_array_equal(flat[3:7], 1)
        np.testing.assert_array_equal(flat[7:], 0)

    def test_polygon_fill(self):
        seg = [[1.0, 1.0, 8.0, 1.0, 8.0, 8.0, 1.0, 8.0]]  # square
        mask = rle.segmentation_to_mask(seg, 10, 10)
        assert mask[4, 4] == 1 and mask[0, 0] == 0
        assert 40 < mask.sum() < 81

    def test_compressed_roundtripish(self):
        # encode a simple run pattern by hand: counts [6, 4, 90] in LEB form
        # (verify via the uncompressed equivalent)
        ref = rle._runs_to_mask([6, 4, 90], 10, 10)
        assert ref.sum() == 4


class TestCocoDataset:
    def test_load(self, tmp_path):
        import cv2
        img_dir = tmp_path / "imgs"
        os.makedirs(img_dir)
        cv2.imwrite(str(img_dir / "a.png"),
                    np.random.default_rng(0).integers(0, 255, (100, 120, 3),
                                                      dtype=np.uint8))
        ann = {
            "images": [{"id": 1, "file_name": "a.png", "height": 100, "width": 120}],
            "annotations": [
                {"image_id": 1, "segmentation": [[10, 10, 60, 10, 60, 60, 10, 60]]},
                {"image_id": 1,
                 "segmentation": {"size": [100, 120],
                                  "counts": [500, 50, 100 * 120 - 550]}},
            ],
        }
        ann_file = tmp_path / "ann.json"
        with open(ann_file, "w") as f:
            json.dump(ann, f)
        from videoseal_tpu.data.datasets import CocoMasksDataset
        ds = CocoMasksDataset(str(img_dir), str(ann_file), img_size=64)
        assert len(ds) == 1
        img, mask = ds[0]
        assert img.shape == (64, 64, 3)
        assert mask.shape == (64, 64, 1)
        assert mask.sum() > 0


class TestTransforms:
    def test_color_jitter_bounds(self):
        from videoseal_tpu.data.transforms import color_jitter
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        out = color_jitter(img, rng)
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 1
        assert np.abs(out - img).max() > 0

    def test_resize_transform(self):
        from videoseal_tpu.data.transforms import get_resize_transform
        img = np.zeros((100, 160, 3), np.float32)
        out = get_resize_transform(64)(img)
        assert out.shape == (64, 64, 3)
