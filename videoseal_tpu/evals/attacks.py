"""Host-side EXACT codec attacks for evaluation parity.

The training path uses on-device differentiable proxies (augmentation/augs.py);
evaluation robustness numbers, like the reference's, use real codecs
(videoseal/augmentation/valuemetric.py:21-50, video.py:20-259):

  jpeg / webp          -> cv2.imencode (bit-exact libjpeg/libwebp round trip)
  h264 / h264rgb / h265 / vp9 / av1
                       -> the native libavcodec runtime (native/media.cpp,
                          linked against libx264/x265/libvpx/libsvtav1) with
                          exact CRF control — the same encoders the
                          reference's PyAV path drives (video.py:54-86)
  mpeg4 / mjpeg        -> cv2.VideoWriter fallback when the native runtime
                          is unavailable (no CRF control)
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def jpeg_exact(img: np.ndarray, quality: int) -> np.ndarray:
    """PIL/libjpeg-exact JPEG round trip of (..., H, W, 3) RGB in [0,1]
    (parity: utils/image.py:13-37)."""
    import cv2
    x = _to_u8(img)
    single = x.ndim == 3
    if single:
        x = x[None]
    out = np.empty_like(x)
    for i in range(x.shape[0]):
        ok, buf = cv2.imencode(".jpg", x[i][..., ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, int(quality)])
        assert ok
        out[i] = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]
    out = out.astype(np.float32) / 255.0
    return out[0] if single else out


def webp_exact(img: np.ndarray, quality: int) -> np.ndarray:
    """WebP round trip (parity: utils/image.py:40-58)."""
    import cv2
    x = _to_u8(img)
    single = x.ndim == 3
    if single:
        x = x[None]
    out = np.empty_like(x)
    for i in range(x.shape[0]):
        ok, buf = cv2.imencode(".webp", x[i][..., ::-1],
                               [cv2.IMWRITE_WEBP_QUALITY, int(quality)])
        assert ok
        out[i] = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]
    out = out.astype(np.float32) / 255.0
    return out[0] if single else out


_FOURCC = {"mpeg4": ("mp4v", ".mp4"), "vp9": ("VP90", ".mp4"),
           "mjpeg": ("MJPG", ".avi")}

_NATIVE_CODECS = ("h264", "h264rgb", "h265", "vp9", "av1", "mpeg4", "mjpeg")


def video_codec_exact(frames: np.ndarray, codec: str = "mpeg4",
                      fps: int = 24, quality: float | None = None,
                      crf: int | None = None) -> np.ndarray:
    """Real encode/decode round trip of (F, H, W, 3) RGB float frames
    (parity: augmentation/video.py:20-119's in-memory PyAV round trip).

    Prefers the native libavcodec runtime (native/media.cpp) — exact
    libx264/x265/vp9/av1 with CRF control; falls back to cv2's bundled
    FFMPEG (mpeg4/vp9/mjpeg, no CRF)."""
    from .. import native
    if codec in _NATIVE_CODECS and native.available() and native.codec_available(codec):
        return native.video_roundtrip(np.asarray(frames), codec,
                                      crf if crf is not None else 28, fps)
    import cv2
    fourcc, ext = _FOURCC[codec]
    x = _to_u8(frames)
    f, h, w, _ = x.shape
    path = tempfile.mktemp(suffix=ext)
    try:
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError(f"codec {codec} unavailable")
        if quality is not None:
            vw.set(cv2.VIDEOWRITER_PROP_QUALITY, float(quality))
        for i in range(f):
            vw.write(x[i][..., ::-1])
        vw.release()
        cap = cv2.VideoCapture(path)
        out = np.empty_like(x)
        for i in range(f):
            ret, fr = cap.read()
            if not ret:
                fr = out[max(i - 1, 0)][..., ::-1]
            out[i] = fr[..., ::-1]
        cap.release()
    finally:
        if os.path.exists(path):
            os.remove(path)
    return out.astype(np.float32) / 255.0


def available_video_codecs() -> list[str]:
    import cv2
    ok = []
    from .. import native
    if native.available():
        ok.extend(c for c in _NATIVE_CODECS if native.codec_available(c))
    for name, (fourcc, ext) in _FOURCC.items():
        if name in ok:
            continue
        path = tempfile.mktemp(suffix=ext)
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), 24, (64, 64))
        if vw.isOpened():
            ok.append(name)
            vw.release()
        if os.path.exists(path):
            os.remove(path)
    return ok
