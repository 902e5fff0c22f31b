"""VMAF perceptual video quality (parity: videoseal/evals/metrics.py:325-403).

VMAF needs an ffmpeg binary built with libvmaf — an external tool in the
reference too (it hardcodes a user-local static ffmpeg path,
metrics.py:328). We discover a capable binary instead:

  1. $VSM_FFMPEG, if set;
  2. `ffmpeg` on $PATH;

and verify it actually exposes the libvmaf filter. When none is found,
`vmaf_available()` is False and the scoring functions return None (the
evals CSV records an empty column rather than crashing), matching how the
reference degrades when its ffmpeg path doesn't exist.

Video writing uses the native media runtime (native/media.cpp) so the
encode settings (codec/CRF) match the reference's tensor_to_video
(metrics.py:369-378).
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import tempfile
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=1)
def find_ffmpeg() -> str | None:
    """Locate an ffmpeg binary with the libvmaf filter, or None."""
    candidates = []
    env = os.environ.get("VSM_FFMPEG")
    if env:
        candidates.append(env)
    on_path = shutil.which("ffmpeg")
    if on_path:
        candidates.append(on_path)
    for cand in candidates:
        try:
            out = subprocess.run([cand, "-hide_banner", "-filters"],
                                 capture_output=True, text=True, timeout=30)
            if "libvmaf" in out.stdout:
                return cand
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def vmaf_available() -> bool:
    return find_ffmpeg() is not None


def vmaf_on_file(vid_o: str, vid_w: str, n_threads: int = 8) -> float | None:
    """`ffmpeg -i ref -i dist -lavfi libvmaf` -> pooled VMAF score
    (metrics.py:325-350). None if no libvmaf-capable ffmpeg exists."""
    ffmpeg = find_ffmpeg()
    if ffmpeg is None:
        return None
    cmd = [ffmpeg, "-i", vid_o, "-i", vid_w,
           "-lavfi", f"libvmaf='n_threads={n_threads}'", "-f", "null", "-"]
    result = subprocess.run(cmd, text=True, capture_output=True)
    for line in result.stderr.split("\n"):
        m = re.search(r"VMAF score: ([0-9.]+)", line)
        if m:
            return float(m.group(1))
    return None


def vmaf_on_tensor(frames1: np.ndarray, frames2: np.ndarray | None = None,
                   fps: int = 24, codec: str = "h264", crf: int = 23,
                   return_aux: bool = False):
    """VMAF between two (F, H, W, 3) frame arrays in [0, 1] or uint8
    (metrics.py:352-403). frames2=None measures frames1 against its own
    codec round trip. Returns None (or (None, aux)) without libvmaf."""
    from .. import native

    if not native.available():
        raise RuntimeError("native media runtime unavailable")
    with tempfile.TemporaryDirectory() as td:
        f1 = os.path.join(td, "ref.mp4")
        f2 = os.path.join(td, "dist.mp4")
        if frames2 is None:
            # reference writes file1 un-encoded here (codec=None,
            # metrics.py:373-375); CRF 0 x264 is the near-lossless analogue
            native.encode_file(f1, frames1, codec="h264", crf=0, fps=fps)
            frames2 = frames1
        else:
            native.encode_file(f1, frames1, codec=codec, crf=crf, fps=fps)
        native.encode_file(f2, frames2, codec=codec, crf=crf, fps=fps)
        score = vmaf_on_file(f1, f2)
        if not return_aux:
            return score
        mb = 1024 * 1024
        s1 = os.path.getsize(f1) / mb
        s2 = os.path.getsize(f2) / mb
        d1, d2 = len(frames1) / fps, len(frames2) / fps
        return score, {"filesize1": s1, "filesize2": s2, "duration1": d1,
                       "duration2": d2, "bps1": s1 / d1, "bps2": s2 / d2}
