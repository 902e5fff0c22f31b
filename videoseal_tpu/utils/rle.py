"""COCO mask decoding without pycocotools (replaces the C extension dep,
SURVEY.md §2.11). Supports polygon segmentations (rasterized with cv2),
uncompressed RLE (counts list) and compressed RLE (COCO's LEB128-style
string encoding)."""

from __future__ import annotations

import numpy as np


def decode_compressed_rle(counts: str | bytes, h: int, w: int) -> np.ndarray:
    """COCO compressed RLE string -> (h, w) uint8 mask (column-major runs)."""
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    nums = []
    i = 0
    while i < len(counts):
        x = 0
        k = 0
        more = True
        while more:
            c = counts[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(nums) > 2:
            x += nums[-2]
        nums.append(x)
    return _runs_to_mask(nums, h, w)


def _runs_to_mask(counts: list[int], h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T  # COCO RLE is column-major


def segmentation_to_mask(seg, h: int, w: int) -> np.ndarray:
    """Any COCO segmentation (polygons / RLE dict) -> (h, w) uint8 mask."""
    if isinstance(seg, list):  # polygons
        import cv2
        mask = np.zeros((h, w), np.uint8)
        for poly in seg:
            pts = np.asarray(poly, np.float64).reshape(-1, 2)
            cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
        return mask
    if isinstance(seg, dict):
        counts = seg["counts"]
        sh, sw = seg.get("size", (h, w))
        if isinstance(counts, list):  # uncompressed RLE
            return _runs_to_mask(counts, sh, sw)
        return decode_compressed_rle(counts, sh, sw)
    raise TypeError(f"unsupported segmentation {type(seg)}")
