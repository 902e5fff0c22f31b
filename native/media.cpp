// videoseal_tpu native media runtime.
//
// TPU-native replacement for the reference's PyAV/decord/ffmpeg-python
// dependencies (videoseal/augmentation/video.py:20-259,
// data/datasets.py:188-546, inference_streaming.py:52-75): in-memory codec
// round trips (the training/eval "compression attack"), and file
// decode/encode, implemented directly on libavcodec/libavformat/libswscale.
//
// Exposed as a C ABI consumed from Python via ctypes
// (videoseal_tpu/native/__init__.py). All frame buffers are packed RGB24.
//
// Build: make -C native   (links system libav*; see native/Makefile)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct LogSilencer {
  LogSilencer() { av_log_set_level(AV_LOG_ERROR); }
} g_log_silencer;

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

struct Scaler {
  SwsContext* ctx = nullptr;
  ~Scaler() { if (ctx) sws_freeContext(ctx); }
};

// RGB24 (h, w, 3) -> AVFrame in the encoder's pixel format.
bool rgb_to_frame(const uint8_t* rgb, int w, int h, AVFrame* frame,
                  AVPixelFormat dst_fmt, Scaler& s) {
  s.ctx = sws_getCachedContext(s.ctx, w, h, AV_PIX_FMT_RGB24, w, h, dst_fmt,
                               SWS_BICUBIC, nullptr, nullptr, nullptr);
  if (!s.ctx) return false;
  const uint8_t* src[1] = {rgb};
  int src_stride[1] = {3 * w};
  sws_scale(s.ctx, src, src_stride, 0, h, frame->data, frame->linesize);
  return true;
}

bool frame_to_rgb(const AVFrame* frame, uint8_t* rgb, int w, int h, Scaler& s) {
  s.ctx = sws_getCachedContext(s.ctx, frame->width, frame->height,
                               (AVPixelFormat)frame->format, w, h,
                               AV_PIX_FMT_RGB24, SWS_BICUBIC, nullptr, nullptr,
                               nullptr);
  if (!s.ctx) return false;
  uint8_t* dst[1] = {rgb};
  int dst_stride[1] = {3 * w};
  sws_scale(s.ctx, frame->data, frame->linesize, 0, frame->height, dst,
            dst_stride);
  return true;
}

// Decode straight into the TPU serving layout: padded planar RGB u8, one
// (hp, wb) plane per channel, image at rows [r0, r0+h) cols [c0, c0+w).
// Two sws stages: yuv->RGB24 (bit-identical to frame_to_rgb, so planar and
// interleaved reads agree exactly) then an RGB24->GBRP de-interleave (a pure
// SIMD shuffle, no color math) writing the planes at the padded offsets.
// Caller zeroes padding once.
bool frame_to_planar(const AVFrame* frame, uint8_t* buf, int w, int h,
                     int hp, int wb, int r0, int c0, Scaler& s,
                     Scaler& split, std::vector<uint8_t>& scratch) {
  s.ctx = sws_getCachedContext(s.ctx, frame->width, frame->height,
                               (AVPixelFormat)frame->format, w, h,
                               AV_PIX_FMT_RGB24, SWS_BICUBIC, nullptr, nullptr,
                               nullptr);
  if (!s.ctx) return false;
  scratch.resize((size_t)3 * h * w);
  uint8_t* rgb[1] = {scratch.data()};
  int rgb_stride[1] = {3 * w};
  sws_scale(s.ctx, frame->data, frame->linesize, 0, frame->height, rgb,
            rgb_stride);

  split.ctx = sws_getCachedContext(split.ctx, w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_GBRP, SWS_POINT, nullptr,
                                   nullptr, nullptr);
  if (!split.ctx) return false;
  size_t plane = (size_t)hp * wb;
  uint8_t* base = buf + (size_t)r0 * wb + c0;
  // GBRP plane order is G,B,R; map onto our R,G,B plane slots
  uint8_t* dst[3] = {base + plane, base + 2 * plane, base};
  int dst_stride[3] = {wb, wb, wb};
  sws_scale(split.ctx, rgb, rgb_stride, 0, h, dst, dst_stride);
  return true;
}

struct EncoderChoice {
  const char* encoder;
  AVCodecID decoder_id;
  AVPixelFormat pix_fmt;
};

bool pick_codec(const std::string& name, EncoderChoice* out) {
  if (name == "h264" || name == "libx264")
    *out = {"libx264", AV_CODEC_ID_H264, AV_PIX_FMT_YUV420P};
  else if (name == "h264rgb")
    *out = {"libx264rgb", AV_CODEC_ID_H264, AV_PIX_FMT_RGB24};
  else if (name == "h265" || name == "hevc" || name == "libx265")
    *out = {"libx265", AV_CODEC_ID_HEVC, AV_PIX_FMT_YUV420P};
  else if (name == "vp9" || name == "libvpx-vp9")
    *out = {"libvpx-vp9", AV_CODEC_ID_VP9, AV_PIX_FMT_YUV420P};
  else if (name == "av1" || name == "libaom-av1" || name == "libsvtav1")
    *out = {"libaom-av1", AV_CODEC_ID_AV1, AV_PIX_FMT_YUV420P};
  else if (name == "mpeg4")
    *out = {"mpeg4", AV_CODEC_ID_MPEG4, AV_PIX_FMT_YUV420P};
  else if (name == "mjpeg")
    *out = {"mjpeg", AV_CODEC_ID_MJPEG, AV_PIX_FMT_YUVJ420P};
  else
    return false;
  if (!avcodec_find_encoder_by_name(out->encoder)) {
    // h264rgb fallback: some builds ship libx264 without the rgb variant
    if (name == "h264rgb" && avcodec_find_encoder_by_name("libx264")) {
      *out = {"libx264", AV_CODEC_ID_H264, AV_PIX_FMT_YUV444P};
      return true;
    }
    return false;
  }
  return true;
}

}  // namespace

extern "C" {

const char* vsm_last_error() { return g_error.c_str(); }

// Probe: is this codec attack available? (1 = yes)
int vsm_codec_available(const char* codec_name) {
  EncoderChoice ch;
  return pick_codec(codec_name, &ch) ? 1 : 0;
}

// In-memory codec round trip: encode `nframes` RGB24 frames with the given
// codec/crf, decode them back into rgb_out. Mirrors the reference's
// VideoCompression attack (augmentation/video.py:20-119): pixel distortion of
// a real encode/decode, no container involved (codec-level, identical pixel
// math). Returns number of frames written to rgb_out, or -1 on error.
int vsm_video_roundtrip(const uint8_t* rgb_in, int nframes, int h, int w,
                        const char* codec_name, int crf, int fps,
                        uint8_t* rgb_out) {
  if (w % 2 || h % 2) { set_error("width/height must be even"); return -1; }
  EncoderChoice ch;
  if (!pick_codec(codec_name, &ch)) {
    set_error(std::string("codec unavailable: ") + codec_name);
    return -1;
  }
  const AVCodec* enc = avcodec_find_encoder_by_name(ch.encoder);
  AVCodecContext* ec = avcodec_alloc_context3(enc);
  ec->width = w;
  ec->height = h;
  ec->time_base = AVRational{1, fps > 0 ? fps : 24};
  ec->framerate = AVRational{fps > 0 ? fps : 24, 1};
  ec->pix_fmt = ch.pix_fmt;
  ec->gop_size = 12;
  ec->max_b_frames = 0;  // set per-codec below (mjpeg/mpeg4 reject B-frames)
  ec->thread_count = 1;  // bounded memory (cf. video.py:33)
  char crfs[16];
  snprintf(crfs, sizeof crfs, "%d", crf);
  // crf < 0 selects default-bitrate mode (the reference's strength "-1" for
  // VP9, augmentation/__init__.py:92): leave the encoder's rate control at
  // its defaults instead of constant-quality.
  if (!strcmp(ch.encoder, "libx264") || !strcmp(ch.encoder, "libx264rgb") ||
      !strcmp(ch.encoder, "libx265")) {
    ec->max_b_frames = 2;
    if (crf >= 0) av_opt_set(ec->priv_data, "crf", crfs, 0);
    av_opt_set(ec->priv_data, "preset", "medium", 0);
    if (!strcmp(ch.encoder, "libx265"))
      av_opt_set(ec->priv_data, "x265-params", "log-level=none", 0);
  } else if (!strcmp(ch.encoder, "libvpx-vp9")) {
    if (crf >= 0) {
      av_opt_set(ec->priv_data, "crf", crfs, 0);
      ec->bit_rate = 0;  // constant-quality mode
    }
    av_opt_set(ec->priv_data, "deadline", "realtime", 0);
    av_opt_set(ec->priv_data, "cpu-used", "8", 0);
  } else if (!strcmp(ch.encoder, "libaom-av1")) {
    if (crf >= 0) {
      av_opt_set(ec->priv_data, "crf", crfs, 0);
      ec->bit_rate = 0;
    }
    av_opt_set(ec->priv_data, "usage", "realtime", 0);
    av_opt_set(ec->priv_data, "cpu-used", "8", 0);
  } else {
    // mpeg4/mjpeg: map crf-ish value onto qscale 2..31
    ec->flags |= AV_CODEC_FLAG_QSCALE;
    int q = crf < 2 ? 2 : (crf > 31 ? 31 : crf);
    ec->global_quality = FF_QP2LAMBDA * q;
    if (!strcmp(ch.encoder, "mjpeg"))
      ec->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;  // yuvj420p
  }
  if (avcodec_open2(ec, enc, nullptr) < 0) {
    set_error("encoder open failed");
    avcodec_free_context(&ec);
    return -1;
  }

  AVFrame* frame = av_frame_alloc();
  frame->format = ec->pix_fmt;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();
  Scaler in_scaler, out_scaler;

  std::vector<AVPacket*> packets;
  auto drain = [&](AVCodecContext* ctx) {
    while (avcodec_receive_packet(ctx, pkt) == 0) {
      packets.push_back(av_packet_clone(pkt));
      av_packet_unref(pkt);
    }
  };
  for (int i = 0; i < nframes; i++) {
    av_frame_make_writable(frame);
    if (!rgb_to_frame(rgb_in + (size_t)i * h * w * 3, w, h, frame, ec->pix_fmt,
                      in_scaler)) {
      set_error("sws rgb->yuv failed");
      return -1;
    }
    frame->pts = i;
    if (ec->flags & AV_CODEC_FLAG_QSCALE) frame->quality = ec->global_quality;
    avcodec_send_frame(ec, frame);
    drain(ec);
  }
  avcodec_send_frame(ec, nullptr);
  drain(ec);

  // decode back
  const AVCodec* dec = avcodec_find_decoder(ch.decoder_id);
  AVCodecContext* dc = avcodec_alloc_context3(dec);
  dc->thread_count = 1;
  if (ec->extradata_size) {  // carry SPS/PPS if the encoder produced them
    dc->extradata = (uint8_t*)av_mallocz(ec->extradata_size +
                                         AV_INPUT_BUFFER_PADDING_SIZE);
    memcpy(dc->extradata, ec->extradata, ec->extradata_size);
    dc->extradata_size = ec->extradata_size;
  }
  if (avcodec_open2(dc, dec, nullptr) < 0) {
    set_error("decoder open failed");
    return -1;
  }
  AVFrame* dframe = av_frame_alloc();
  int out_i = 0;
  auto drain_frames = [&]() {
    while (out_i < nframes && avcodec_receive_frame(dc, dframe) == 0) {
      frame_to_rgb(dframe, rgb_out + (size_t)out_i * h * w * 3, w, h,
                   out_scaler);
      out_i++;
      av_frame_unref(dframe);
    }
  };
  for (AVPacket* p : packets) {
    avcodec_send_packet(dc, p);
    drain_frames();
  }
  avcodec_send_packet(dc, nullptr);
  drain_frames();
  // last-frame fill if the codec dropped trailing frames
  for (int i = out_i; i < nframes && i > 0; i++)
    memcpy(rgb_out + (size_t)i * h * w * 3,
           rgb_out + (size_t)(out_i - 1) * h * w * 3, (size_t)h * w * 3);

  for (AVPacket* p : packets) av_packet_free(&p);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  av_frame_free(&dframe);
  avcodec_free_context(&ec);
  avcodec_free_context(&dc);
  return out_i;
}

// ---------------------------------------------------------------------------
// File decode (decord / ffmpeg-pipe replacement, datasets.py:188-546).
// ---------------------------------------------------------------------------

struct VsmReader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream = -1;
  Scaler scaler;
  Scaler split_scaler;              // RGB24 -> planar de-interleave stage
  std::vector<uint8_t> rgb_scratch;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int width = 0, height = 0;
  double fps = 0.0;
  int64_t nframes = 0;
};

void* vsm_open(const char* path) {
  auto* r = new VsmReader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0 ||
      avformat_find_stream_info(r->fmt, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    delete r;
    return nullptr;
  }
  r->stream = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (r->stream < 0) { set_error("no video stream"); delete r; return nullptr; }
  AVStream* st = r->fmt->streams[r->stream];
  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  r->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(r->dec, st->codecpar);
  r->dec->thread_count = 2;
  if (avcodec_open2(r->dec, codec, nullptr) < 0) {
    set_error("decoder open failed");
    delete r;
    return nullptr;
  }
  r->width = r->dec->width;
  r->height = r->dec->height;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  r->fps = fr.den ? (double)fr.num / fr.den : 24.0;
  r->nframes = st->nb_frames;
  if (r->nframes <= 0 && st->duration > 0)
    r->nframes = (int64_t)(st->duration * av_q2d(st->time_base) * r->fps);
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();
  return r;
}

int vsm_info(void* h, int* w, int* ht, double* fps, int64_t* nframes) {
  auto* r = (VsmReader*)h;
  *w = r->width; *ht = r->height; *fps = r->fps; *nframes = r->nframes;
  return 0;
}

// Read up to n frames into rgb_out; returns frames read (0 at EOF).
int vsm_read(void* h, uint8_t* rgb_out, int n) {
  auto* r = (VsmReader*)h;
  int got = 0;
  while (got < n) {
    int rec = avcodec_receive_frame(r->dec, r->frame);
    if (rec == 0) {
      frame_to_rgb(r->frame, rgb_out + (size_t)got * r->height * r->width * 3,
                   r->width, r->height, r->scaler);
      av_frame_unref(r->frame);
      got++;
      continue;
    }
    int ret = av_read_frame(r->fmt, r->pkt);
    if (ret < 0) {
      avcodec_send_packet(r->dec, nullptr);
      if (avcodec_receive_frame(r->dec, r->frame) == 0) {
        frame_to_rgb(r->frame, rgb_out + (size_t)got * r->height * r->width * 3,
                     r->width, r->height, r->scaler);
        av_frame_unref(r->frame);
        got++;
        continue;
      }
      break;
    }
    if (r->pkt->stream_index == r->stream)
      avcodec_send_packet(r->dec, r->pkt);
    av_packet_unref(r->pkt);
  }
  return got;
}

// Read up to n frames into a padded planar RGB buffer (the TPU serving
// layout, kernels/fused_planar.planar_shape): out holds n consecutive
// (3, hp, wb) u8 frames, image at [r0, r0+height) x [c0, c0+width).
// Returns frames read (0 at EOF).
int vsm_read_planar(void* h, uint8_t* out, int n, int hp, int wb, int r0,
                    int c0) {
  auto* r = (VsmReader*)h;
  size_t fsz = (size_t)3 * hp * wb;
  int got = 0;
  while (got < n) {
    int rec = avcodec_receive_frame(r->dec, r->frame);
    if (rec == 0) {
      frame_to_planar(r->frame, out + (size_t)got * fsz, r->width, r->height,
                      hp, wb, r0, c0, r->scaler, r->split_scaler,
                      r->rgb_scratch);
      av_frame_unref(r->frame);
      got++;
      continue;
    }
    int ret = av_read_frame(r->fmt, r->pkt);
    if (ret < 0) {
      avcodec_send_packet(r->dec, nullptr);
      if (avcodec_receive_frame(r->dec, r->frame) == 0) {
        frame_to_planar(r->frame, out + (size_t)got * fsz, r->width,
                        r->height, hp, wb, r0, c0, r->scaler,
                        r->split_scaler, r->rgb_scratch);
        av_frame_unref(r->frame);
        got++;
        continue;
      }
      break;
    }
    if (r->pkt->stream_index == r->stream)
      avcodec_send_packet(r->dec, r->pkt);
    av_packet_unref(r->pkt);
  }
  return got;
}

int vsm_seek_frame(void* h, int64_t frame_idx) {
  auto* r = (VsmReader*)h;
  AVStream* st = r->fmt->streams[r->stream];
  int64_t ts = av_rescale_q((int64_t)(frame_idx / r->fps * AV_TIME_BASE),
                            AVRational{1, AV_TIME_BASE}, st->time_base);
  if (av_seek_frame(r->fmt, r->stream, ts, AVSEEK_FLAG_BACKWARD) < 0) return -1;
  avcodec_flush_buffers(r->dec);
  return 0;
}

void vsm_close(void* h) {
  auto* r = (VsmReader*)h;
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->frame) av_frame_free(&r->frame);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

// ---------------------------------------------------------------------------
// File encode (display.py save_vid / inference_streaming writer replacement).
// ---------------------------------------------------------------------------

int vsm_encode_file(const char* path, const uint8_t* rgb, int nframes, int h,
                    int w, const char* codec_name, int crf, int fps) {
  EncoderChoice ch;
  if (!pick_codec(codec_name, &ch)) { set_error("codec unavailable"); return -1; }
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) { set_error("cannot allocate output context"); return -1; }
  const AVCodec* enc = avcodec_find_encoder_by_name(ch.encoder);
  AVStream* st = avformat_new_stream(fmt, enc);
  AVCodecContext* ec = avcodec_alloc_context3(enc);
  ec->width = w; ec->height = h;
  ec->time_base = AVRational{1, fps};
  ec->framerate = AVRational{fps, 1};
  ec->pix_fmt = ch.pix_fmt;
  ec->gop_size = 12;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    ec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  char crfs[16];
  snprintf(crfs, sizeof crfs, "%d", crf);
  av_opt_set(ec->priv_data, "crf", crfs, 0);
  if (avcodec_open2(ec, enc, nullptr) < 0) { set_error("enc open"); return -1; }
  avcodec_parameters_from_context(st->codecpar, ec);
  st->time_base = ec->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
      set_error("cannot open file");
      return -1;
    }
  avformat_write_header(fmt, nullptr);
  AVFrame* frame = av_frame_alloc();
  frame->format = ec->pix_fmt; frame->width = w; frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();
  Scaler sc;
  auto drain = [&]() {
    while (avcodec_receive_packet(ec, pkt) == 0) {
      av_packet_rescale_ts(pkt, ec->time_base, st->time_base);
      if (pkt->duration == 0)  // mp4: duration must cover the last frame
        pkt->duration = av_rescale_q(1, ec->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };
  for (int i = 0; i < nframes; i++) {
    av_frame_make_writable(frame);
    rgb_to_frame(rgb + (size_t)i * h * w * 3, w, h, frame, ec->pix_fmt, sc);
    frame->pts = i;
    avcodec_send_frame(ec, frame);
    drain();
  }
  avcodec_send_frame(ec, nullptr);
  drain();
  av_write_trailer(fmt);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  avcodec_free_context(&ec);
  avformat_free_context(fmt);
  return nframes;
}

// ---------------------------------------------------------------------------
// Incremental encoder: open once, write frame batches as they are produced
// (streaming watermark embedding writes chunks while the device computes the
// next one — replaces inference_streaming.py's cv2.VideoWriter with libx264
// at a controlled crf, matching the reference's ffmpeg writer pipe).
// ---------------------------------------------------------------------------

namespace {

struct VsmEncoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ec = nullptr;
  AVStream* st = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  Scaler sc;
  int w = 0, h = 0;
  int64_t pts = 0;
};

void enc_drain(VsmEncoder* e) {
  while (avcodec_receive_packet(e->ec, e->pkt) == 0) {
    av_packet_rescale_ts(e->pkt, e->ec->time_base, e->st->time_base);
    if (e->pkt->duration == 0)  // else the mp4 duration stops at the last
      e->pkt->duration =        // frame's PTS and decoders drop that frame
          av_rescale_q(1, e->ec->time_base, e->st->time_base);
    e->pkt->stream_index = e->st->index;
    av_interleaved_write_frame(e->fmt, e->pkt);
    av_packet_unref(e->pkt);
  }
}

}  // namespace

void* vsm_enc_open(const char* path, int w, int h, const char* codec_name,
                   int crf, int fps) {
  EncoderChoice ch;
  if (!pick_codec(codec_name ? codec_name : "h264", &ch)) {
    set_error(std::string("codec unavailable: ") + codec_name);
    return nullptr;
  }
  auto* e = new VsmEncoder();
  avformat_alloc_output_context2(&e->fmt, nullptr, nullptr, path);
  if (!e->fmt) { set_error("cannot alloc output"); delete e; return nullptr; }
  const AVCodec* enc = avcodec_find_encoder_by_name(ch.encoder);
  e->st = avformat_new_stream(e->fmt, nullptr);
  e->ec = avcodec_alloc_context3(enc);
  e->w = w; e->h = h;
  e->ec->width = w;
  e->ec->height = h;
  e->ec->time_base = AVRational{1, fps > 0 ? fps : 24};
  e->ec->framerate = AVRational{fps > 0 ? fps : 24, 1};
  e->ec->pix_fmt = ch.pix_fmt;
  e->ec->gop_size = 12;
  e->ec->max_b_frames = 0;  // streaming writer: no reorder delay
  if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->ec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  char crfs[16];
  snprintf(crfs, sizeof crfs, "%d", crf);
  av_opt_set(e->ec->priv_data, "crf", crfs, 0);
  if (avcodec_open2(e->ec, enc, nullptr) < 0) {
    set_error("enc open failed");
    delete e;
    return nullptr;
  }
  avcodec_parameters_from_context(e->st->codecpar, e->ec);
  e->st->time_base = e->ec->time_base;
  if (!(e->fmt->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
      set_error("cannot open file");
      delete e;
      return nullptr;
    }
  if (avformat_write_header(e->fmt, nullptr) < 0) {
    set_error("write_header failed");
    delete e;
    return nullptr;
  }
  e->frame = av_frame_alloc();
  e->frame->format = e->ec->pix_fmt;
  e->frame->width = w;
  e->frame->height = h;
  av_frame_get_buffer(e->frame, 0);
  e->pkt = av_packet_alloc();
  return e;
}

int vsm_enc_write(void* h_, const uint8_t* rgb, int n) {
  auto* e = (VsmEncoder*)h_;
  for (int i = 0; i < n; i++) {
    av_frame_make_writable(e->frame);
    rgb_to_frame(rgb + (size_t)i * e->h * e->w * 3, e->w, e->h, e->frame,
                 e->ec->pix_fmt, e->sc);
    e->frame->pts = e->pts++;
    avcodec_send_frame(e->ec, e->frame);
    enc_drain(e);
  }
  return n;
}

// Write frames straight from the padded planar RGB layout (the embed
// kernel's output): one sws pass GBRP -> encoder pix_fmt, no interleave.
int vsm_enc_write_planar(void* h_, const uint8_t* buf, int n, int hp, int wb,
                         int r0, int c0) {
  auto* e = (VsmEncoder*)h_;
  size_t plane = (size_t)hp * wb;
  for (int i = 0; i < n; i++) {
    const uint8_t* base = buf + (size_t)3 * i * plane + (size_t)r0 * wb + c0;
    const uint8_t* src[3] = {base + plane, base + 2 * plane, base};  // G,B,R
    int stride[3] = {wb, wb, wb};
    e->sc.ctx = sws_getCachedContext(e->sc.ctx, e->w, e->h, AV_PIX_FMT_GBRP,
                                     e->w, e->h, e->ec->pix_fmt, SWS_BICUBIC,
                                     nullptr, nullptr, nullptr);
    if (!e->sc.ctx) { set_error("sws"); return -1; }
    av_frame_make_writable(e->frame);
    sws_scale(e->sc.ctx, src, stride, 0, e->h, e->frame->data,
              e->frame->linesize);
    e->frame->pts = e->pts++;
    avcodec_send_frame(e->ec, e->frame);
    enc_drain(e);
  }
  return n;
}

int vsm_enc_close(void* h_) {
  auto* e = (VsmEncoder*)h_;
  int n = (int)e->pts;
  avcodec_send_frame(e->ec, nullptr);
  enc_drain(e);
  av_write_trailer(e->fmt);
  if (!(e->fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&e->fmt->pb);
  av_packet_free(&e->pkt);
  av_frame_free(&e->frame);
  avcodec_free_context(&e->ec);
  avformat_free_context(e->fmt);
  delete e;
  return n;
}

// ---------------------------------------------------------------------------
// Audio remux: video stream from `video_path`, audio stream(s) copied from
// `audio_src_path` (parity: utils/display.py save_video_audio_to_mp4 /
// inference_av.py ffmpeg mux).
// ---------------------------------------------------------------------------

int vsm_mux_audio(const char* video_path, const char* audio_src_path,
                  const char* out_path) {
  AVFormatContext* vin = nullptr;
  AVFormatContext* ain = nullptr;
  AVFormatContext* out = nullptr;
  if (avformat_open_input(&vin, video_path, nullptr, nullptr) < 0 ||
      avformat_find_stream_info(vin, nullptr) < 0) {
    set_error("cannot open video input");
    return -1;
  }
  if (avformat_open_input(&ain, audio_src_path, nullptr, nullptr) < 0 ||
      avformat_find_stream_info(ain, nullptr) < 0) {
    set_error("cannot open audio source");
    avformat_close_input(&vin);
    return -1;
  }
  avformat_alloc_output_context2(&out, nullptr, nullptr, out_path);
  if (!out) { set_error("cannot alloc output"); return -1; }

  int vstream = av_find_best_stream(vin, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  int astream = av_find_best_stream(ain, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (vstream < 0) { set_error("no video stream"); return -1; }

  AVStream* ovs = avformat_new_stream(out, nullptr);
  avcodec_parameters_copy(ovs->codecpar, vin->streams[vstream]->codecpar);
  ovs->codecpar->codec_tag = 0;
  AVStream* oas = nullptr;
  if (astream >= 0) {
    oas = avformat_new_stream(out, nullptr);
    avcodec_parameters_copy(oas->codecpar, ain->streams[astream]->codecpar);
    oas->codecpar->codec_tag = 0;
  }
  if (!(out->oformat->flags & AVFMT_NOFILE))
    if (avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0) {
      set_error("cannot open output file");
      return -1;
    }
  if (avformat_write_header(out, nullptr) < 0) {
    set_error("write header failed");
    return -1;
  }

  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(vin, pkt) >= 0) {
    if (pkt->stream_index == vstream) {
      av_packet_rescale_ts(pkt, vin->streams[vstream]->time_base,
                           ovs->time_base);
      pkt->stream_index = ovs->index;
      av_interleaved_write_frame(out, pkt);
    }
    av_packet_unref(pkt);
  }
  if (oas) {
    while (av_read_frame(ain, pkt) >= 0) {
      if (pkt->stream_index == astream) {
        av_packet_rescale_ts(pkt, ain->streams[astream]->time_base,
                             oas->time_base);
        pkt->stream_index = oas->index;
        av_interleaved_write_frame(out, pkt);
      }
      av_packet_unref(pkt);
    }
  }
  av_write_trailer(out);
  av_packet_free(&pkt);
  if (!(out->oformat->flags & AVFMT_NOFILE)) avio_closep(&out->pb);
  avformat_free_context(out);
  avformat_close_input(&vin);
  avformat_close_input(&ain);
  return oas ? 1 : 0;  // 1 = audio stream copied, 0 = source had none
}

}  // extern "C"
