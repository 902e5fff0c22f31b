"""Streaming video watermark embedding/detection (parity: inference_streaming.py).

The reference pipes raw RGB through ffmpeg synchronously (decode -> embed ->
encode per chunk, inference_streaming.py:35-114). TPU redesign: a
double-buffered host->device pipeline — cv2 decodes chunk k+1 on a worker
thread while the device embeds chunk k; encoded writes happen on a third
thread. Device compute never waits on the decoder for realtime-ish codecs.

  python -m videoseal_tpu.inference_streaming --input in.mp4 --output out.mp4 \
      --card videoseal_1.0 [--checkpoint ckpt.npz] [--detect 1]
"""

from __future__ import annotations

import argparse
import queue
import threading

import numpy as np


def _reader(path: str, chunk_size: int, out_q: queue.Queue):
    import cv2
    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24
    frames = []
    while True:
        ret, fr = cap.read()
        if not ret:
            break
        frames.append(fr[..., ::-1].astype(np.float32) / 255.0)
        if len(frames) == chunk_size:
            out_q.put(np.stack(frames))
            frames = []
    if frames:
        out_q.put(np.stack(frames))
    out_q.put(None)
    cap.release()
    return fps


def _reader_planar(path: str, chunk_size: int, out_q: queue.Queue):
    """Native decode straight into the padded planar u8 serving layout —
    no float conversion, no interleave->planar work on device."""
    from . import native
    r = native.VideoReader(path)
    while True:
        chunk = r.read_planar(chunk_size)
        if chunk.shape[0] == 0:
            break
        out_q.put(chunk)
    out_q.put(None)
    r.close()


def embed_video_planar(model, input_path: str, output_path: str,
                       chunk_size: int = 32, crf: int = 18,
                       lowres_attenuation: bool = True) -> dict:
    """Planar-u8 streaming embed: the native decoder fills planar buffers,
    ONE fused Pallas pass does JND+upsample+blend per chunk, and the native
    incremental encoder (libx264) consumes the planar output directly — no
    interleave ever happens on host or device. Requires
    model.supports_planar and the native media runtime.

    lowres_attenuation defaults True — the reference's own video-serving
    configuration (ref inference_streaming.py:28): JND at processing
    resolution, which also collapses the blend kernel's full-res VPU work."""
    from . import native

    rdr = native.VideoReader(input_path)
    h, w, fps = rdr.height, rdr.width, rdr.fps
    rdr.close()

    in_q: queue.Queue = queue.Queue(maxsize=2)
    out_q: queue.Queue = queue.Queue(maxsize=2)
    threading.Thread(target=_reader_planar,
                     args=(input_path, chunk_size, in_q), daemon=True).start()

    writer = native.VideoWriter(output_path, w, h, codec="h264", crf=crf,
                                fps=fps)

    def _writer():
        while True:
            item = out_q.get()
            if item is None:
                return
            writer.write_planar(item)   # image at rows [0,h) cols [0,w)

    t_write = threading.Thread(target=_writer, daemon=True)
    t_write.start()

    msgs = model.get_random_msg(1)
    n = 0
    pending = None
    while True:
        chunk = in_q.get()
        if pending is not None:
            out_q.put(np.asarray(pending))
            pending = None
        if chunk is None:
            break
        out = model.embed_planar(chunk, h, w, msgs=msgs,
                                 lowres_attenuation=lowres_attenuation)
        pending = out["imgs_w"]   # stays planar end to end
        n += chunk.shape[0]
    out_q.put(None)
    t_write.join()
    writer.close()
    return {"msgs": msgs, "frames": n, "fps": fps}


def embed_video(model, input_path: str, output_path: str, chunk_size: int = 32,
                codec: str = "mp4v") -> dict:
    from . import native as _native
    if getattr(model, "supports_planar", False) and _native.available():
        return embed_video_planar(model, input_path, output_path, chunk_size)
    import cv2
    import jax

    in_q: queue.Queue = queue.Queue(maxsize=2)   # decode-ahead depth
    out_q: queue.Queue = queue.Queue(maxsize=2)

    cap = cv2.VideoCapture(input_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()

    t_read = threading.Thread(target=_reader, args=(input_path, chunk_size, in_q),
                              daemon=True)
    t_read.start()

    writer = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*codec), fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cannot open writer for {output_path}")

    def _writer():
        while True:
            item = out_q.get()
            if item is None:
                return
            u8 = np.clip(item * 255.0 + 0.5, 0, 255).astype(np.uint8)
            for fr in u8:
                writer.write(fr[..., ::-1])

    t_write = threading.Thread(target=_writer, daemon=True)
    t_write.start()

    msgs = model.get_random_msg(1)
    n = 0
    pending = None  # device computation in flight while next chunk decodes
    while True:
        chunk = in_q.get()
        if pending is not None:
            out_q.put(np.asarray(pending))  # sync previous result
            pending = None
        if chunk is None:
            break
        out = model.embed(chunk, msgs=msgs, is_video=True)
        pending = out["imgs_w"]  # async: device works while reader decodes
        n += chunk.shape[0]
    out_q.put(None)
    t_write.join()
    writer.release()
    return {"msgs": msgs, "frames": n, "fps": fps}


def detect_video(model, input_path: str, chunk_size: int = 32,
                 aggregation: str = "avg"):
    import jax.numpy as jnp
    in_q: queue.Queue = queue.Queue(maxsize=2)
    threading.Thread(target=_reader, args=(input_path, chunk_size, in_q),
                     daemon=True).start()
    all_preds = []
    while True:
        chunk = in_q.get()
        if chunk is None:
            break
        preds = model.detect(chunk, is_video=True)["preds"]
        if preds.ndim == 4:
            preds = preds.mean(axis=(1, 2))
        all_preds.append(np.asarray(preds))
    from .models.videoseal import aggregate_message
    preds = jnp.asarray(np.concatenate(all_preds))
    return aggregate_message(preds, aggregation)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="watermarked.mp4")
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--chunk_size", type=int, default=32)
    ap.add_argument("--detect", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import videoseal_tpu as vs
    model = vs.load(args.card, checkpoint=args.checkpoint)
    if args.dtype != "float32":
        model = model.with_dtype(args.dtype)
    info = embed_video(model, args.input, args.output, args.chunk_size)
    print(f"embedded {info['frames']} frames -> {args.output}")
    if args.detect:
        msg = detect_video(model, args.output, args.chunk_size)
        import numpy as np
        orig = np.asarray(info["msgs"])[0]
        dec = np.asarray(msg)[0]
        acc = float((orig == dec).mean())
        print(f"bit accuracy after {args.output.split('.')[-1]} round trip: {acc:.4f}")


if __name__ == "__main__":
    main()
