"""Video+audio watermarking (parity: reference inference_av.py).

Watermarks the video stream and, with --audio_wm 1, the audio track too
(spread-spectrum, audio_wm.py); otherwise the original audio is stream-copied
via the native remuxer. The reference watermarks audio with AudioSeal
(inference_av.py:83-108) — an external learned model family; the
`audio_processor` hook accepts any replacement (audio_wm.make_audio_processor
is the built-in one).

  python -m videoseal_tpu.inference_av --input in.mp4 --output out.mp4 \
      [--audio_wm 1]
"""

from __future__ import annotations

import argparse
import os
import tempfile


def embed_av(model, input_path: str, output_path: str, chunk_size: int = 32,
             codec: str = "h264", crf: int = 18, audio_processor=None) -> dict:
    from . import native
    from .inference_streaming import embed_video

    if not native.available():
        # no audio path without the native muxer: plain video embed
        return embed_video(model, input_path, output_path, chunk_size)

    tmp_video = tempfile.mktemp(suffix=".mp4")
    try:
        # 1) watermark the video stream (chunked, double-buffered)
        reader = native.VideoReader(input_path)
        fps = int(round(reader.fps)) or 24
        import numpy as np
        msgs = model.get_random_msg(1)
        frames_out = []
        n = 0
        while True:
            chunk = reader.read(chunk_size)
            if chunk.shape[0] == 0:
                break
            out = model.embed(chunk.astype(np.float32) / 255.0, msgs=msgs,
                              is_video=True)
            frames_out.append(np.asarray(out["imgs_w"]))
            n += chunk.shape[0]
        reader.close()
        all_frames = np.concatenate(frames_out) if frames_out else np.zeros((0,))
        native.encode_file(tmp_video, all_frames, codec=codec, crf=crf, fps=fps)
        # 2) remux original audio (optionally processed)
        audio_src = input_path
        if audio_processor is not None:
            audio_src = audio_processor(input_path)
        try:
            had_audio = native.mux_audio(tmp_video, audio_src, output_path)
        except RuntimeError:
            os.replace(tmp_video, output_path)  # mux failed: keep video-only
            return {"msgs": msgs, "frames": n, "audio": False}
        return {"msgs": msgs, "frames": n, "audio": bool(had_audio)}
    finally:
        if os.path.exists(tmp_video):
            os.remove(tmp_video)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="watermarked_av.mp4")
    ap.add_argument("--card", default="videoseal_1.0")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--crf", type=int, default=18)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--audio_wm", type=int, default=0,
                    help="watermark the audio track too (spread-spectrum "
                         "audio_wm.py; the reference uses AudioSeal here)")
    ap.add_argument("--audio_nbits", type=int, default=16)
    args = ap.parse_args()

    import videoseal_tpu as vs
    model = vs.load(args.card, checkpoint=args.checkpoint)
    if args.dtype != "float32":
        model = model.with_dtype(args.dtype)
    audio_processor = None
    if args.audio_wm:
        import numpy as np
        from .audio_wm import SpreadSpectrumAudio, make_audio_processor
        wm = SpreadSpectrumAudio(nbits=args.audio_nbits)
        audio_msg = wm.get_random_msg(np.random.default_rng(0))
        audio_processor = make_audio_processor(audio_msg, wm)
        print(f"audio msg: {''.join(map(str, audio_msg))}")
    info = embed_av(model, args.input, args.output,
                    audio_processor=audio_processor)
    print(f"embedded {info['frames']} frames -> {args.output} "
          f"(audio={'copied' if info.get('audio') else 'none'})")


if __name__ == "__main__":
    main()
