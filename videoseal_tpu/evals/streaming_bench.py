"""End-to-end streaming throughput: decode -> embed -> encode (perf tool).

Closes the round-3 gap "the overlapped decode/embed/encode path exists but
has no measured fps". Synthesizes a test video with the native encoder,
then measures:

  decode_fps    native planar decode alone (host)
  encode_fps    native planar encode alone (host)
  stream_fps    embed_video_planar wall-clock (decode || device embed ||
                encode, overlapped via the bounded queues)
  device_fps    the scored device-resident number for reference (bench.py)

Honesty note for this environment: host<->device rides a ~15-100 MB/s
network tunnel here, so stream_fps is TRANSFER-bound (a 1080p planar chunk
is ~7.7 MB/frame each way) and far below the device-resident number; on a
host-attached TPU the transfer is PCIe DMA and the pipeline bound is
max(decode, device, encode) instead. The overlap claim is evidenced by
stream wall-clock ~= the slowest stage (not the sum) — printed as
overlap_ratio = sum(stage walls) / stream wall (>1 means overlap works).

Usage: python -m videoseal_tpu.evals.streaming_bench [--height 360]
       [--frames 96] [--card videoseal_1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def synth_video(path: str, frames: int, h: int, w: int, crf: int = 23):
    from videoseal_tpu import native
    wr = native.VideoWriter(path, w, h, codec="h264", crf=crf, fps=24)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([yy / h, xx / w, (xx + yy) / (h + w)], -1)
    for i in range(frames):
        img = base * (0.6 + 0.4 * np.sin(i / 7.0))
        img = img + rng.normal(0, 0.03, img.shape)
        u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
        wr.write(u8[None])
    wr.close()


class _StubDevice:
    """Tunnel-free device stand-in: embed_planar sleeps chunk/fps seconds and
    returns the output-layout planar frames (input image shifted to rows
    [0,h) cols [0,w)). Lets the pipeline-overlap claim be evidenced on any
    host: with the device stage stubbed, stream wall must approach
    max(decode, stub, encode) — not their sum."""

    def __init__(self, fps: float, h: int, w: int):
        from videoseal_tpu.kernels.fused_planar import C0, R0
        self.fps, self.h, self.w, self.r0, self.c0 = fps, h, w, R0, C0

    def get_random_msg(self, n):
        return np.zeros((n, 8), np.int32)

    def embed_planar(self, chunk, h, w, msgs=None, lowres_attenuation=None):
        time.sleep(chunk.shape[0] / self.fps)
        out = np.zeros_like(chunk)
        out[:, :, :h, :w] = chunk[:, :, self.r0:self.r0 + h,
                                  self.c0:self.c0 + w]
        return {"imgs_w": out, "msgs": msgs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--stub_device_fps", type=float, default=0,
                    help="replace the device stage with a host-side sleep "
                         "sustaining N fps: measures the decode||embed||"
                         "encode queue overlap itself, independent of the "
                         "host<->device tunnel (0 = use the real model)")
    args = ap.parse_args()

    import videoseal_tpu as vs
    from videoseal_tpu import native
    from videoseal_tpu.inference_streaming import embed_video_planar

    assert native.available(), "native media runtime required"
    tmp = tempfile.mkdtemp(prefix="vsm_stream_")
    src = os.path.join(tmp, "src.mp4")
    dst = os.path.join(tmp, "wm.mp4")
    synth_video(src, args.frames, args.height, args.width)

    # stage walls in isolation
    t0 = time.perf_counter()
    r = native.VideoReader(src)
    chunks = []
    while True:
        c = r.read_planar(args.chunk)
        if c.shape[0] == 0:
            break
        chunks.append(c)
    r.close()
    t_dec = time.perf_counter() - t0
    n = sum(c.shape[0] for c in chunks)

    t0 = time.perf_counter()
    wr = native.VideoWriter(os.path.join(tmp, "copy.mp4"),
                            args.width, args.height, codec="h264", crf=18,
                            fps=24)
    for c in chunks:
        wr.write_planar(np.ascontiguousarray(
            c[:, :, 28:28 + args.height, 128:128 + args.width]), r0=0, c0=0)
    wr.close()
    t_enc = time.perf_counter() - t0

    if args.stub_device_fps > 0:
        model = _StubDevice(args.stub_device_fps, args.height, args.width)
        t_dev = n / args.stub_device_fps
        note = "device stage stubbed (host sleep) — measures queue overlap"
    else:
        model = vs.load(args.card).with_dtype("bfloat16")
        # warm the jit caches so stream timing excludes compiles
        _ = model.embed_planar(chunks[0], args.height, args.width)
        t_dev = None
        note = "tunnel-transfer-bound in this environment; see docstring"

    t0 = time.perf_counter()
    out = embed_video_planar(model, src, dst, chunk_size=args.chunk)
    t_stream = time.perf_counter() - t0
    assert out["frames"] == n

    stage_walls = [t_dec, t_enc] + ([t_dev] if t_dev else [])
    overlap = sum(stage_walls) / t_stream
    result = {
        "height": args.height,
        "frames": n,
        "decode_fps": round(n / t_dec, 1),
        "encode_fps": round(n / t_enc, 1),
        "stream_fps": round(n / t_stream, 1),
        "overlap_ratio": round(overlap, 3),
        "note": note,
    }
    if t_dev:
        result["stub_device_fps"] = args.stub_device_fps
        # overlap works iff the wall tracks the slowest stage, not the sum
        result["stream_vs_slowest_stage"] = round(
            t_stream / max(stage_walls), 3)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
