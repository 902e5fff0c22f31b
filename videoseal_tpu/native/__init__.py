"""ctypes bindings for the native C++ media runtime (native/media.cpp).

Compiled lazily on first use (g++ + system libav*; ~2s) and cached. All
functions fall back gracefully — callers check `available()` and use the
cv2/proxy paths otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libvideoseal_media.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(
                        os.path.join(_NATIVE_DIR, "media.cpp"))):
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                               capture_output=True, timeout=180)
            lib = ctypes.CDLL(_SO)
            lib.vsm_last_error.restype = ctypes.c_char_p
            lib.vsm_codec_available.argtypes = [ctypes.c_char_p]
            lib.vsm_video_roundtrip.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
            lib.vsm_open.restype = ctypes.c_void_p
            lib.vsm_open.argtypes = [ctypes.c_char_p]
            lib.vsm_info.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
            lib.vsm_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
            lib.vsm_read_planar.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.vsm_read_planar.argtypes += [ctypes.c_int] * 5
            lib.vsm_seek_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.vsm_close.argtypes = [ctypes.c_void_p]
            lib.vsm_encode_file.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
            lib.vsm_mux_audio.argtypes = [ctypes.c_char_p] * 3
            lib.vsm_enc_open.restype = ctypes.c_void_p
            lib.vsm_enc_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_char_p,
                                         ctypes.c_int, ctypes.c_int]
            lib.vsm_enc_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_int]
            lib.vsm_enc_write_planar.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_void_p]
            lib.vsm_enc_write_planar.argtypes += [ctypes.c_int] * 5
            lib.vsm_enc_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def codec_available(codec: str) -> bool:
    lib = _load()
    return bool(lib and lib.vsm_codec_available(codec.encode()))


def _to_u8(frames: np.ndarray) -> np.ndarray:
    if frames.dtype == np.uint8:
        return np.ascontiguousarray(frames)
    return np.ascontiguousarray(
        np.clip(frames * 255.0 + 0.5, 0, 255).astype(np.uint8))


def video_roundtrip(frames: np.ndarray, codec: str = "h264", crf: int = 28,
                    fps: int = 24) -> np.ndarray:
    """EXACT codec attack: encode+decode (F, H, W, 3) frames ([0,1] float or
    uint8). Parity: augmentation/video.py:20-119. Pads odd dims to even
    (video.py:100-104). Returns float32 in [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native media runtime unavailable")
    u8 = _to_u8(frames)
    f, h, w, _ = u8.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        u8 = np.pad(u8, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    out = np.empty_like(u8)
    n = lib.vsm_video_roundtrip(
        u8.ctypes.data_as(ctypes.c_void_p), f, u8.shape[1], u8.shape[2],
        codec.encode(), int(crf), int(fps), out.ctypes.data_as(ctypes.c_void_p))
    if n < 0:
        raise RuntimeError(f"roundtrip failed: {lib.vsm_last_error().decode()}")
    if ph or pw:
        out = out[:, :h, :w]
    return out.astype(np.float32) / 255.0


class VideoReader:
    """Sequential/seekable frame reader (decord replacement)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native media runtime unavailable")
        self._lib = lib
        self._h = lib.vsm_open(path.encode())
        if not self._h:
            raise IOError(lib.vsm_last_error().decode())
        w = ctypes.c_int()
        ht = ctypes.c_int()
        fps = ctypes.c_double()
        nf = ctypes.c_int64()
        lib.vsm_info(self._h, ctypes.byref(w), ctypes.byref(ht),
                     ctypes.byref(fps), ctypes.byref(nf))
        self.width, self.height = w.value, ht.value
        self.fps, self.nframes = fps.value, nf.value

    def read(self, n: int) -> np.ndarray:
        buf = np.empty((n, self.height, self.width, 3), np.uint8)
        got = self._lib.vsm_read(self._h, buf.ctypes.data_as(ctypes.c_void_p), n)
        return buf[:got]

    def read_planar(self, n: int) -> np.ndarray:
        """Decode straight into the TPU serving layout (padded planar RGB,
        kernels/fused_planar.planar_shape): zero extra copies vs rgb24 —
        libswscale writes the planes at the padded offsets directly."""
        from ..kernels.fused_planar import C0, R0, planar_shape
        shape = planar_shape(n, self.height, self.width)
        buf = np.zeros(shape, np.uint8)
        got = self._lib.vsm_read_planar(
            self._h, buf.ctypes.data_as(ctypes.c_void_p), n,
            shape[2], shape[3], R0, C0)
        return buf[:got]

    def seek(self, frame_idx: int) -> None:
        self._lib.vsm_seek_frame(self._h, int(frame_idx))

    def close(self):
        if self._h:
            self._lib.vsm_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class VideoWriter:
    """Incremental encoder (streaming writes chunk-by-chunk; libx264 etc. at
    a controlled crf — the cv2.VideoWriter/ffmpeg-pipe replacement)."""

    def __init__(self, path: str, w: int, h: int, codec: str = "h264",
                 crf: int = 18, fps: float = 24.0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native media runtime unavailable")
        self._lib = lib
        self.w, self.h = w, h
        self._h = lib.vsm_enc_open(path.encode(), w, h, codec.encode(),
                                   int(crf), int(round(fps)))
        if not self._h:
            raise RuntimeError(lib.vsm_last_error().decode())

    def write(self, frames: np.ndarray) -> int:
        """frames: (N, H, W, 3) uint8 interleaved RGB."""
        u8 = np.ascontiguousarray(frames)
        assert u8.dtype == np.uint8 and u8.shape[1:] == (self.h, self.w, 3)
        return self._lib.vsm_enc_write(
            self._h, u8.ctypes.data_as(ctypes.c_void_p), u8.shape[0])

    def write_planar(self, frames_p: np.ndarray, r0: int = 0,
                     c0: int = 0) -> int:
        """frames_p: (N, 3, Hp, Wb) uint8 planar (the embed kernel's output
        layout: image at rows [r0, r0+H), cols [c0, c0+W))."""
        u8 = np.ascontiguousarray(frames_p)
        assert u8.dtype == np.uint8 and u8.ndim == 4 and u8.shape[1] == 3
        return self._lib.vsm_enc_write_planar(
            self._h, u8.ctypes.data_as(ctypes.c_void_p), u8.shape[0],
            u8.shape[2], u8.shape[3], r0, c0)

    def close(self) -> int:
        if self._h:
            n = self._lib.vsm_enc_close(self._h)
            self._h = None
            return n
        return 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def encode_file(path: str, frames: np.ndarray, codec: str = "h264",
                crf: int = 23, fps: int = 24) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native media runtime unavailable")
    u8 = _to_u8(frames)
    f, h, w, _ = u8.shape
    n = lib.vsm_encode_file(path.encode(), u8.ctypes.data_as(ctypes.c_void_p),
                            f, h, w, codec.encode(), int(crf), int(fps))
    if n < 0:
        raise RuntimeError(f"encode failed: {lib.vsm_last_error().decode()}")


def mux_audio(video_path: str, audio_src_path: str, out_path: str) -> bool:
    """Copy the audio stream(s) of audio_src_path onto video_path's video
    (stream copy, no re-encode) — parity: utils/display.py:75-147.
    Returns True if an audio stream was copied (False: source had none)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native media runtime unavailable")
    r = lib.vsm_mux_audio(video_path.encode(), audio_src_path.encode(),
                          out_path.encode())
    if r < 0:
        raise RuntimeError(f"mux failed: {lib.vsm_last_error().decode()}")
    return bool(r)
