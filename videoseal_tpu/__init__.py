"""videoseal_tpu: TPU-native invisible watermarking for images and videos.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/videoseal (reference: /root/reference). The public API mirrors
the reference (`videoseal/__init__.py:13-17`):

    import videoseal_tpu as vs
    model = vs.load("videoseal")              # model card name or checkpoint path
    out = model.embed(frames, msgs, is_video=True)   # frames: [f, h, w, 3] in [0,1]
    preds = model.detect(out["imgs_w"], is_video=True)
    msg = model.extract_message(out["imgs_w"])

Layout convention: NHWC (TPU-native), float in [0, 1]. Helpers for converting
from the reference's NCHW layout live in `videoseal_tpu.utils.layout`.
"""

__version__ = "0.1.0"

from .utils.cfg import load, setup_model_from_model_card  # noqa: F401
