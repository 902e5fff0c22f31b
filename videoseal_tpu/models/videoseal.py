"""VideoSeal pipeline: embed / detect / extract_message for images and videos.

Functional parity with videoseal/models/{wam,videoseal}.py, redesigned
TPU-first:

* The reference's Python chunk loop (videoseal.py:292-340) becomes
  ``jax.lax.map(..., batch_size=chunk_size)`` — one compiled program whose
  memory is bounded by the chunk size, with the remainder handled by the
  primitive itself.
* Frames ride the batch dimension; the embedder runs on key frames only
  (1 in step_size), and video-mode expansion (repeat / alternate /
  interpolate, videoseal.py:80-118) is a gather/linear-mix on device.
* JND attenuation + blending + clamping at full resolution — the
  memory-bound stage — is a single fused computation (see
  kernels/fused_blend.py for the Pallas version).
* `scaling_w` is a traced scalar: strength sweeps don't recompile.

Layout: NHWC, [0,1] floats. Messages are (B, nbits) int {0,1}.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
from typing import Any

_nullcontext = contextlib.nullcontext

import numpy as np
import jax
import jax.numpy as jnp

from ..modules.jnd import JND, build_attenuation
from ..modules.msg_processor import get_random_msg
from ..ops.color import rgb_to_y
from ..ops.resize import resize_bilinear
from .blender import blend
from .embedder import EmbedderSpec, build_embedder
from .extractor import ExtractorSpec, build_extractor


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static pipeline knobs (hashable -> usable as jit static arg).

    Performance knobs (bench/serving defaults differ from parity-test
    defaults): compute_dtype="bfloat16" runs the embedder/extractor forwards
    on the MXU in bf16 (params must be cast too — VideoSeal.with_dtype);
    resize_precision="default" uses single-pass bf16 resize matmuls instead
    of 6-pass f32 emulation (~1 LSB at 8-bit scale). The full-resolution
    JND + blend stage always runs in float32 — the watermark residual is
    ~1e-2 scale and bf16 there would quantize it visibly.
    """
    img_size: int = 256
    clamp: bool = True
    blending_method: str = "additive"
    chunk_size: int = 32
    step_size: int = 4
    video_mode: str = "repeat"
    lowres_attenuation: bool = False
    yuv: bool = False
    nbits: int = 256
    compute_dtype: str = "float32"
    resize_precision: str = "highest"
    fused_blend: bool = False      # Pallas JND+blend kernel (TPU serving mode)
    fused_extractor: bool = False  # Pallas ConvNeXt block kernels (TPU serving)
    fused_embedder: bool = False   # BN-folded raw-param UNet forward (serving)
    s2d_embedder: bool = False     # space-to-depth UNet layout (kernels/unet_s2d)


# ---------------------------------------------------------------------------
# pure pipeline functions (jitted; modules/cfg/attenuation are static)
# ---------------------------------------------------------------------------

def _expand_video_mode(preds: jnp.ndarray, total_frames: int, step_size: int,
                       video_mode: str) -> jnp.ndarray:
    """Expand key-frame predictions to all frames (videoseal.py:80-118)."""
    if step_size == 1:
        return preds[:total_frames]
    if video_mode == "repeat":
        out = jnp.repeat(preds, step_size, axis=0)
    elif video_mode == "alternate":
        n = preds.shape[0]
        out = jnp.zeros((n * step_size,) + preds.shape[1:], preds.dtype)
        out = out.at[::step_size].set(preds)
    elif video_mode == "interpolate":
        # linear mix between consecutive key frames (videoseal.py:101-117)
        n = preds.shape[0]
        alpha = 1.0 - jnp.linspace(0.0, 1.0, step_size)  # (step,)
        start = jnp.repeat(preds[:-1], step_size, axis=0) if n > 1 else preds[:0]
        end = jnp.repeat(preds[1:], step_size, axis=0) if n > 1 else preds[:0]
        a = jnp.tile(alpha, max(n - 1, 0)).reshape((-1,) + (1,) * (preds.ndim - 1))
        interp = a * start + (1 - a) * end
        tail_len = n * step_size - interp.shape[0]
        tail = jnp.broadcast_to(preds[-1][None], (tail_len,) + preds.shape[1:])
        out = jnp.concatenate([interp, tail], axis=0)
    else:
        raise ValueError(f"Unknown video_mode {video_mode}")
    return out[:total_frames]


def _chunked_apply(fn, xs, chunk_size: int):
    """Apply a batched fn over the leading axis in chunks of chunk_size.

    Replaces the reference's Python chunk loops (videoseal.py:292-340,376-383)
    with a single compiled ``lax.map`` over chunk groups; bounds peak memory on
    long clips. The remainder is padded (extra work, not extra compile).
    """
    leaves = jax.tree_util.tree_leaves(xs)
    n = leaves[0].shape[0]
    if n <= chunk_size:
        return fn(xs)
    pad = (-n) % chunk_size
    if pad:
        xs = jax.tree_util.tree_map(
            lambda a: jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]), xs)
    xs = jax.tree_util.tree_map(
        lambda a: a.reshape((n + pad) // chunk_size, chunk_size, *a.shape[1:]), xs)
    ys = jax.lax.map(fn, xs)
    return jax.tree_util.tree_map(lambda a: a.reshape(-1, *a.shape[2:])[:n], ys)


def _make_run_embedder(embedder, cfg: PipelineConfig, variables,
                       pre_scale: float | None = None):
    """Embedder forward closure shared by the NHWC and planar pipelines:
    optional input rescale -> YUV-Y select -> compute-dtype cast -> plain /
    fused / space-to-depth UNet apply."""
    cdtype = jnp.dtype(cfg.compute_dtype)

    def run_embedder(inp_msgs):
        inp, m = inp_msgs
        if pre_scale is not None:
            inp = inp * pre_scale
        x = rgb_to_y(inp) if cfg.yuv else inp
        x = x.astype(cdtype)
        if cfg.fused_embedder:
            from .embedder import UnetEmbedder
            if isinstance(embedder, UnetEmbedder):
                u = embedder.unet
                kwargs = dict(
                    nbits=embedder.nbits, hidden_size=embedder.hidden_size,
                    z_channels_mults=tuple(u["z_channels_mults"]),
                    activation=u.get("activation", "relu"),
                    normalization=u.get("normalization", "batch"),
                    num_blocks=u.get("num_blocks", 8),
                    last_tanh=u.get("last_tanh", True))
                if cfg.s2d_embedder:
                    from ..kernels.unet_s2d import unet_apply_s2d
                    return unet_apply_s2d(
                        variables["params"], variables.get("batch_stats", {}),
                        x, m, **kwargs)
                from ..kernels.unet_fused import unet_apply_fused
                return unet_apply_fused(
                    variables["params"], variables.get("batch_stats", {}), x, m,
                    **kwargs)
        return embedder.apply(variables, x, m)

    return run_embedder


def embed_pipeline(embedder, attenuation: JND | None, cfg: PipelineConfig,
                   variables, imgs, msgs, scaling_w, scaling_i,
                   is_video: bool, lowres_attenuation: bool):
    """Shared embed path (wam.py:134-204 / videoseal.py:258-350).

    imgs: (B|F, H, W, 3); msgs: (B, nbits) for images, (1, nbits) for video.
    Returns (imgs_w, preds_w_fullres).
    """
    h, w = imgs.shape[-3], imgs.shape[-2]
    s = cfg.img_size
    cdtype = jnp.dtype(cfg.compute_dtype)
    # uint8 frames are first-class (production video is rgb24, exactly what
    # the reference's streaming pipe carries — inference_streaming.py:52-75):
    # full-res reads/writes stay 1 byte/channel; float conversion happens
    # after downscale or fused into the elementwise blend.
    is_u8 = not jnp.issubdtype(imgs.dtype, jnp.floating)
    u8_scale = 255.0 if is_u8 else 1.0
    run_embedder = _make_run_embedder(
        embedder, cfg, variables, pre_scale=(1.0 / 255.0 if is_u8 else None))

    if is_video:
        # resize only the key frames unless the lowres-attenuation path needs
        # all of them at proc res (videoseal.py:304-310 resizes the full
        # chunk; keyframe-only halves the resize work at step_size 4+)
        if attenuation is not None and lowres_attenuation:
            imgs_res = resize_bilinear(imgs, s, s, precision=cfg.resize_precision)
            keys = imgs_res[::cfg.step_size]
        else:
            keys = resize_bilinear(imgs[::cfg.step_size], s, s,
                                   precision=cfg.resize_precision)
        key_msgs = jnp.broadcast_to(msgs[:1], (keys.shape[0], msgs.shape[-1]))
        preds = _chunked_apply(run_embedder, (keys, key_msgs), cfg.chunk_size)
        preds = _expand_video_mode(preds, imgs.shape[0], cfg.step_size, cfg.video_mode)
    else:
        imgs_res = resize_bilinear(imgs, s, s, precision=cfg.resize_precision)
        preds = _chunked_apply(run_embedder, (imgs_res, msgs), cfg.chunk_size)

    preds = preds.astype(jnp.float32)  # fullres watermark math stays f32
    if attenuation is not None and lowres_attenuation:
        lr = imgs_res.astype(jnp.float32)
        if is_u8:
            lr = lr * (1.0 / 255.0)
        preds = attenuation.heatmaps(lr) * preds
    preds_full = resize_bilinear(preds, h, w, precision=cfg.resize_precision)
    if attenuation is not None and not lowres_attenuation:
        if cfg.fused_blend and cfg.clamp:
            from ..kernels.fused_blend import (_pick_tile_delta,
                                               fused_jnd_blend, fused_jnd_delta,
                                               fused_jnd_delta_up,
                                               supports_fused_blend)
            if supports_fused_blend(h, w, preds_full.shape[-1], attenuation,
                                    cfg.blending_method):
                if preds_full.shape[-1] == 1:
                    # transpose-free fast path: kernel emits the delta plane,
                    # the RGB blend fuses into one XLA elementwise pass.
                    # When the proc-res grid is square, the prediction
                    # upsample fuses INTO the kernel (banded height lift) —
                    # the full-res prediction is never materialized.
                    if (preds.shape[-2] == preds.shape[-3]
                            and _pick_tile_delta(h, w) is not None):
                        delta = fused_jnd_delta_up(imgs, preds[..., 0], scaling_w)
                    else:
                        delta = fused_jnd_delta(imgs, preds_full[..., 0], scaling_w)
                    if is_u8:
                        out = (scaling_i * imgs.astype(jnp.float32)
                               + 255.0 * delta[..., None])
                        imgs_w = jnp.clip(jnp.round(out), 0.0, 255.0
                                          ).astype(jnp.uint8)
                    else:
                        imgs_w = jnp.clip(scaling_i * imgs + delta[..., None],
                                          0.0, 1.0)
                    return imgs_w, preds_full
                if not is_u8:
                    imgs_w = fused_jnd_blend(imgs, preds_full, scaling_i, scaling_w)
                    return imgs_w, preds_full
        hm_in = imgs.astype(jnp.float32) * (1.0 / 255.0) if is_u8 else imgs
        preds_full = attenuation.heatmaps(hm_in) * preds_full
    if is_u8:
        if cfg.blending_method == "additive":
            out = (scaling_i * imgs.astype(jnp.float32)
                   + 255.0 * scaling_w * preds_full)
        else:
            out = 255.0 * blend(cfg.blending_method,
                                imgs.astype(jnp.float32) * (1.0 / 255.0),
                                preds_full, scaling_i, scaling_w)
        imgs_w = (jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
                  if cfg.clamp else out)
        return imgs_w, preds_full
    imgs_w = blend(cfg.blending_method, imgs, preds_full, scaling_i, scaling_w)
    if cfg.clamp:
        imgs_w = jnp.clip(imgs_w, 0.0, 1.0)
    return imgs_w, preds_full


def detect_pipeline(extractor, cfg: PipelineConfig, variables, imgs):
    """Shared detect path (wam.py:206-234 / videoseal.py:352-388)."""
    s = cfg.img_size
    imgs_res = resize_bilinear(imgs, s, s, precision=cfg.resize_precision)
    if not jnp.issubdtype(imgs.dtype, jnp.floating):  # uint8 video buffers
        imgs_res = imgs_res * (1.0 / 255.0)
    return _detect_resized(extractor, cfg, variables, imgs_res)


def _detect_resized(extractor, cfg: PipelineConfig, variables, imgs_res):
    """Extractor over proc-res [0,1] frames (plain or fused ConvNeXt)."""
    cdtype = jnp.dtype(cfg.compute_dtype)
    from .extractor import ConvnextExtractor

    def run(x):
        x = x.astype(cdtype)
        if cfg.fused_extractor and isinstance(extractor, ConvnextExtractor):
            from ..kernels.convnext_fused import convnext_apply_fused
            from ..modules.pixel_decoder import PixelDecoder
            enc = extractor.encoder
            feats = convnext_apply_fused(
                variables["params"]["encoder"], x * 2 - 1,
                depths=tuple(enc.get("depths", (3, 3, 9, 3))),
                dims=tuple(enc.get("dims", (96, 192, 384, 768))),
                stem_stride=enc.get("stem_stride", 4))
            preds = PixelDecoder(**extractor.pixel_decoder).apply(
                {"params": variables["params"]["pixel_decoder"]}, feats)
            return preds.astype(jnp.float32)
        return extractor.apply(variables, x).astype(jnp.float32)

    return _chunked_apply(run, imgs_res, cfg.chunk_size)


def embed_pipeline_planar(embedder, attenuation: JND | None,
                          cfg: PipelineConfig, variables, imgs_p, msgs,
                          scaling_w, scaling_i, h: int, w: int,
                          interpret: bool = False, gain=None,
                          with_detect_input: bool = False,
                          lowres_attenuation: bool | None = None):
    """Planar-u8 video serving embed: the production fast path.

    imgs_p: (F, 3, Hp, Wb) uint8 padded planar frames
    (kernels/fused_planar.planar_shape) — the layout a decoder writes
    directly. Key frames are resized straight out of the planar buffer
    (offsets folded into the resize matmuls), the full-res JND + prediction
    upsample + blend run as ONE Pallas pass over u8 planes. Returns planar
    watermarked frames (F, 3, ceil(h/TH)*TH, ceil(w/128)*128) u8, with TH the
    kernel tile height (kernels/fused_planar.TH).

    lowres_attenuation (default: cfg.lowres_attenuation) selects the
    reference's video-serving JND placement (inference_streaming.py:28,
    videoseal.py:321-331): ALL frames are resized to proc res, the heatmap
    is computed and multiplied into the prediction there, and the blend
    kernel runs with no full-res JND math (lowres=True fast path).

    with_detect_input=True additionally returns the extractor's input — the
    watermarked frames at processing resolution, (F, s, s, 3) f32 in [0,1] —
    produced inside the blend kernel's tile loop (detect_size path of
    fused_jnd_blend_planar), so embed+detect serving never re-reads the
    full-res planes from HBM.

    Requires: jnd_1_1-style attenuation, additive blending, 1-channel
    prediction (the production card family) — asserted.
    """
    from ..kernels.fused_planar import fused_jnd_blend_planar, resize_planar

    assert attenuation is not None and cfg.blending_method == "additive"
    lowres = (cfg.lowres_attenuation if lowres_attenuation is None
              else lowres_attenuation)
    s = cfg.img_size
    run_embedder = _make_run_embedder(embedder, cfg, variables)
    if lowres:
        # the heatmap needs every frame at proc res (ref videoseal.py:304-307
        # resizes the whole chunk); keys are a view of the same resize
        frames_res = resize_planar(imgs_p, h, w, s, s,
                                   precision=cfg.resize_precision,
                                   gain=gain)              # (F, s, s, 3) [0,1]
        keys = frames_res[::cfg.step_size]
    else:
        keys = resize_planar(imgs_p[::cfg.step_size], h, w, s, s,
                             precision=cfg.resize_precision,
                             gain=gain)                    # (K, s, s, 3) [0,1]
    key_msgs = jnp.broadcast_to(msgs[:1], (keys.shape[0], msgs.shape[-1]))
    preds = _chunked_apply(run_embedder, (keys, key_msgs), cfg.chunk_size)
    preds = _expand_video_mode(preds, imgs_p.shape[0], cfg.step_size,
                               cfg.video_mode).astype(jnp.float32)
    assert preds.shape[-1] == 1, "planar path expects a 1-channel prediction"
    pred1 = preds[..., 0]
    if lowres:
        if attenuation.in_channels == 1:
            # shift-add luminance formulation — single-channel grouped convs
            # waste the MXU (see JND.heatmap_lum)
            hm1 = attenuation.heatmap_lum(frames_res.astype(jnp.float32))
        else:
            hm1 = attenuation.heatmaps(frames_res.astype(jnp.float32))[..., 0]
        pred1 = hm1 * pred1
    if with_detect_input:
        imgs_wp, det = fused_jnd_blend_planar(
            imgs_p, pred1, scaling_w, scaling_i, h, w,
            interpret=interpret, detect_size=s, lowres=lowres)
        return imgs_wp, jnp.transpose(det, (0, 2, 3, 1))   # (F, s, s, 3)
    return fused_jnd_blend_planar(imgs_p, pred1, scaling_w, scaling_i,
                                  h, w, interpret=interpret, lowres=lowres)


def detect_pipeline_planar(extractor, cfg: PipelineConfig, variables, imgs_wp,
                           h: int, w: int):
    """Detect over planar watermarked output (embed_pipeline_planar's
    layout: image at rows [0, h), cols [0, w))."""
    from ..kernels.fused_planar import resize_planar

    s = cfg.img_size
    imgs_res = resize_planar(imgs_wp, h, w, s, s, r0=0, c0=0,
                             precision=cfg.resize_precision)
    return _detect_resized(extractor, cfg, variables, imgs_res)


def aggregate_message(preds: jnp.ndarray, aggregation: str = "avg"):
    """Frame aggregation -> binary message (videoseal.py:390-428).

    preds: (F, 1+nbits) detector logits.
    """
    bit_preds = preds[:, 1:]
    if aggregation is None or aggregation == "none":
        return bit_preds
    if aggregation == "avg":
        decoded = bit_preds.mean(axis=0)
    elif aggregation == "squared_avg":
        decoded = (bit_preds * jnp.abs(bit_preds)).mean(axis=0)
    elif aggregation == "l1norm_avg":
        wgt = jnp.sum(jnp.abs(bit_preds), axis=1, keepdims=True)
        decoded = (bit_preds * wgt).mean(axis=0)
    elif aggregation == "l2norm_avg":
        wgt = jnp.sqrt(jnp.sum(bit_preds ** 2, axis=1, keepdims=True))
        decoded = (bit_preds * wgt).mean(axis=0)
    else:
        raise ValueError(f"Unknown aggregation {aggregation}")
    return (decoded > 0)[None].astype(jnp.int32)  # (1, nbits)


# ---------------------------------------------------------------------------
# user-facing model
# ---------------------------------------------------------------------------

class VideoSeal:
    """Stateful convenience wrapper mirroring the reference public API
    (videoseal.py:16-428): embed / detect / extract_message with is_video.
    """

    def __init__(self, embedder_spec: EmbedderSpec, extractor_spec: ExtractorSpec,
                 embedder_vars, extractor_vars, attenuation: JND | None,
                 cfg: PipelineConfig, scaling_w: float = 0.2, scaling_i: float = 1.0,
                 card: dict | None = None, seed: int = 0):
        self.embedder_spec = embedder_spec
        self.extractor_spec = extractor_spec
        self.embedder_vars = embedder_vars
        self.extractor_vars = extractor_vars
        self.attenuation = attenuation
        self.cfg = cfg
        self.scaling_w = scaling_w  # mutable knob, traced (no recompile)
        self.scaling_i = scaling_i
        self.card = card or {}
        self._rng = np.random.default_rng(seed)

        self._embed_fn = jax.jit(
            functools.partial(embed_pipeline, embedder_spec.module, attenuation, cfg),
            static_argnames=("is_video", "lowres_attenuation"))
        self._detect_fn = jax.jit(
            functools.partial(detect_pipeline, extractor_spec.module, cfg))

    # -- messages ----------------------------------------------------------
    @property
    def nbits(self) -> int:
        return self.cfg.nbits

    def get_random_msg(self, bsz: int = 1, nb_repetitions: int = 1) -> jnp.ndarray:
        key = jax.random.PRNGKey(int(self._rng.integers(2 ** 31)))
        return get_random_msg(key, self.nbits, bsz, nb_repetitions)

    # -- inference ---------------------------------------------------------
    def embed(self, imgs, msgs=None, is_video: bool = False,
              lowres_attenuation: bool | None = None) -> dict:
        """imgs: (B|F, H, W, 3) in [0,1]. Returns dict with imgs_w/preds_w/msgs."""
        imgs = jnp.asarray(imgs)
        if msgs is None:
            msgs = self.get_random_msg(1 if is_video else imgs.shape[0])
        msgs = jnp.asarray(msgs)
        if is_video and msgs.shape[0] != 1:
            raise ValueError("Message should be unique for video (videoseal.py:281)")
        lowres = (self.cfg.lowres_attenuation if lowres_attenuation is None
                  else lowres_attenuation)
        imgs_w, preds_w = self._embed_fn(
            self.embedder_vars, imgs, msgs,
            jnp.float32(self.scaling_w), jnp.float32(self.scaling_i),
            is_video=is_video, lowres_attenuation=lowres)
        n = imgs.shape[0]
        out_msgs = jnp.broadcast_to(msgs[:1], (n, msgs.shape[-1])) if is_video else msgs
        return {"imgs_w": imgs_w, "preds_w": preds_w, "msgs": out_msgs}

    def detect(self, imgs, is_video: bool = False) -> dict:
        """imgs: (B|F, H, W, 3) -> preds (B|F, 1+nbits[, H, W])."""
        preds = self._detect_fn(self.extractor_vars, jnp.asarray(imgs))
        return {"preds": preds}

    # -- planar-u8 serving fast path --------------------------------------
    @property
    def supports_planar(self) -> bool:
        """Can the padded-planar u8 video path be used? (jnd attenuation,
        additive blending, 1-channel prediction — the production cards)."""
        return (self.attenuation is not None
                and self.cfg.blending_method == "additive"
                and self.embedder_spec.out_channels == 1)

    def embed_planar(self, imgs_p, h: int, w: int, msgs=None,
                     lowres_attenuation: bool | None = None) -> dict:
        """Video embed over padded planar RGB u8 frames
        (kernels/fused_planar.planar_shape; what native.VideoReader
        .read_planar returns). Returns planar watermarked frames — one fused
        Pallas pass does JND + prediction upsample + blend on u8 planes.
        lowres_attenuation (default: cfg) applies the JND at processing
        resolution, the reference's video-serving mode
        (inference_streaming.py:28)."""
        imgs_p = jnp.asarray(imgs_p)
        if msgs is None:
            msgs = self.get_random_msg(1)
        msgs = jnp.asarray(msgs)
        imgs_w = embed_pipeline_planar(
            self.embedder_spec.module, self.attenuation, self.cfg,
            self.embedder_vars, imgs_p, msgs, jnp.float32(self.scaling_w),
            jnp.float32(self.scaling_i), h, w,
            lowres_attenuation=lowres_attenuation)
        return {"imgs_w": imgs_w, "msgs": msgs}

    def detect_planar(self, imgs_wp, h: int, w: int) -> dict:
        """Detect over embed_planar output."""
        preds = detect_pipeline_planar(self.extractor_spec.module, self.cfg,
                                       self.extractor_vars,
                                       jnp.asarray(imgs_wp), h, w)
        return {"preds": preds}

    def embed_detect_planar(self, imgs_p, h: int, w: int, msgs=None,
                            lowres_attenuation: bool | None = None,
                            fused_detect: bool | None = None,
                            interpret: bool = False) -> dict:
        """Embed AND detect in one serving call over padded planar u8 frames
        — the watermark-then-verify loop (ref evals/full.py's embed→detect
        flow, videoseal.py:258-388) as one device program.

        fused_detect (default: follow lowres_attenuation) selects where the
        extractor's 256px input comes from: produced INSIDE the blend
        kernel's tile loop (with_detect_input — the full-res watermarked
        planes are never re-read from HBM) or by a separate planar resize.
        Measured (PERF.md round-4/5 ledgers): the in-kernel path loses in
        full-res-JND mode (+3.3 ms of matmul serialized against the VPU JND
        math) and wins in lowres mode (2027 vs 1964 fps @1080p — no VPU work
        left to serialize against), hence the mode-coupled default.
        """
        imgs_p = jnp.asarray(imgs_p)
        if msgs is None:
            msgs = self.get_random_msg(1)
        msgs = jnp.asarray(msgs)
        lowres = (self.cfg.lowres_attenuation if lowres_attenuation is None
                  else lowres_attenuation)
        fused = lowres if fused_detect is None else fused_detect
        if fused:
            imgs_w, det = embed_pipeline_planar(
                self.embedder_spec.module, self.attenuation, self.cfg,
                self.embedder_vars, imgs_p, msgs, jnp.float32(self.scaling_w),
                jnp.float32(self.scaling_i), h, w, interpret=interpret,
                with_detect_input=True, lowres_attenuation=lowres)
            preds = _detect_resized(self.extractor_spec.module, self.cfg,
                                    self.extractor_vars, det)
        else:
            imgs_w = embed_pipeline_planar(
                self.embedder_spec.module, self.attenuation, self.cfg,
                self.embedder_vars, imgs_p, msgs, jnp.float32(self.scaling_w),
                jnp.float32(self.scaling_i), h, w, interpret=interpret,
                lowres_attenuation=lowres)
            preds = detect_pipeline_planar(self.extractor_spec.module,
                                           self.cfg, self.extractor_vars,
                                           imgs_w, h, w)
        return {"imgs_w": imgs_w, "preds": preds, "msgs": msgs}

    def extract_message(self, imgs, aggregation: str = "avg") -> jnp.ndarray:
        preds = self.detect(imgs, is_video=True)["preds"]
        if preds.ndim == 4:  # pixelwise extractor: average spatially first
            preds = preds.mean(axis=(1, 2))
        return aggregate_message(preds, aggregation)

    def with_dtype(self, dtype: str = "bfloat16", resize_precision: str = "default",
                   fused_blend: bool | None = None):
        """Return a copy configured for serving-speed inference: params cast
        to `dtype`, model forwards in `dtype`, single-pass resize matmuls,
        Pallas fused JND+blend on TPU. Full-res blend math stays f32."""
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype) if jnp.issubdtype(
                jnp.asarray(a).dtype, jnp.floating) else jnp.asarray(a), t)
        if fused_blend is None:
            fused_blend = jax.default_backend() not in ("cpu",)
        from .extractor import ConvnextExtractor
        from .embedder import UnetEmbedder
        from ..kernels.unet_fused import supports_unet_fused
        fused_ext = (fused_blend
                     and isinstance(self.extractor_spec.module, ConvnextExtractor))
        fused_emb = (isinstance(self.embedder_spec.module, UnetEmbedder)
                     and supports_unet_fused(self.embedder_spec.module.unet))
        # Space-to-depth UNet layout (kernels/unet_s2d.py): keeps the small-
        # channel top levels MXU-dense. TPU serving only — on CPU the extra
        # FLOPs are a loss. Parity-gated by tests/test_unet_s2d.py.
        s2d_emb = fused_emb and fused_blend and self.cfg.img_size % 8 == 0
        cfg = dataclasses.replace(self.cfg, compute_dtype=dtype,
                                  resize_precision=resize_precision,
                                  fused_blend=fused_blend,
                                  fused_extractor=fused_ext,
                                  fused_embedder=fused_emb,
                                  s2d_embedder=s2d_emb)
        return VideoSeal(self.embedder_spec, self.extractor_spec,
                         cast(self.embedder_vars), cast(self.extractor_vars),
                         self.attenuation, cfg, scaling_w=self.scaling_w,
                         scaling_i=self.scaling_i, card=self.card)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_card(cls, card: dict, checkpoint: str | None = None, seed: int = 0):
        args = card.get("args", {})
        nbits = int(args.get("nbits", 256))
        img_size = int(args.get("img_size_proc", args.get("img_size", 256)))
        emb_cfg = card["embedder"]
        ext_cfg = card["extractor"]
        embedder_spec = build_embedder(
            emb_cfg["model"], emb_cfg.get("params", {}), nbits,
            float(args.get("hidden_size_multiplier", 2.0)))
        extractor_spec = build_extractor(
            ext_cfg["model"], ext_cfg.get("params", {}), img_size, nbits)
        attenuation = build_attenuation(args.get("attenuation"))
        cfg = PipelineConfig(
            img_size=img_size,
            blending_method=args.get("blending_method", "additive"),
            chunk_size=int(args.get("videoseal_chunk_size",
                                    args.get("videowam_chunk_size", 32))),
            step_size=int(args.get("videoseal_step_size",
                                   args.get("videowam_step_size", 4))),
            video_mode=args.get("video_mode", "repeat"),
            lowres_attenuation=bool(args.get("lowres_attenuation", False)),
            yuv=embedder_spec.yuv,
            nbits=nbits,
        )

        if checkpoint is None:
            checkpoint = card.get("checkpoint_path")
        embedder_vars, extractor_vars = _init_or_load(
            embedder_spec, extractor_spec, cfg, card, checkpoint, seed)

        return cls(embedder_spec, extractor_spec, embedder_vars, extractor_vars,
                   attenuation, cfg,
                   scaling_w=float(args.get("scaling_w", 1.0)),
                   scaling_i=float(args.get("scaling_i", 1.0)),
                   card=card, seed=seed)


def _init_or_load(embedder_spec, extractor_spec, cfg: PipelineConfig, card,
                  checkpoint: str | None, seed: int):
    """Random-init params, then overwrite from a checkpoint if given.

    Supported checkpoint formats: reference ``.pth`` (converted on the fly via
    utils/torch_convert) and this framework's native ``.npz``
    (utils/checkpoint.py). Remote URLs are ignored (zero-egress environment).
    """
    s = cfg.img_size
    in_c = 1 if cfg.yuv else 3
    # init on CPU: param creation needs no accelerator, and remote-TPU
    # (tunnelled) compilation of init programs is pathologically slow. All
    # inputs (including the PRNG keys!) must be created inside the context,
    # else they commit the computation to the accelerator.
    try:
        cpu0 = jax.devices("cpu")[0]
    except RuntimeError:
        cpu0 = None
    ctx = jax.default_device(cpu0) if cpu0 is not None else _nullcontext()
    with ctx:
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        dummy_img = jnp.zeros((1, s, s, in_c))
        dummy_full = jnp.zeros((1, s, s, 3))
        dummy_msg = jnp.zeros((1, cfg.nbits), jnp.int32)
        embedder_vars = embedder_spec.module.init(k1, dummy_img, dummy_msg)
        extractor_vars = extractor_spec.module.init(k2, dummy_full)

    if checkpoint and not str(checkpoint).startswith(("http://", "https://")):
        from ..utils import checkpoint as ckpt_io
        embedder_vars, extractor_vars = ckpt_io.load_into(
            str(checkpoint), card, embedder_vars, extractor_vars)
    return embedder_vars, extractor_vars
