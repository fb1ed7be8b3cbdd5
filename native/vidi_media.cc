// vidi_media — first-party media decoder for the vidi-tpu data feed.
//
// TPU-native replacement for the reference's decord (C++) frame decode and
// ffmpeg/ffprobe subprocesses (reference: Vidi1.5_9B/vidi/dataset/
// vid_utils.py:10-79): probe duration/fps, decode selected RGB frames, and
// decode/resample audio to mono float PCM — all in-process over
// libavformat/libavcodec/libswscale/libswresample, exposed through a C ABI
// consumed via ctypes (vidi_tpu/media/video.py).
//
// Build: bash native/build.sh  ->  native/libvidi_media.so

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstring>
#include <vector>

namespace {

struct VideoCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream = -1;

  ~VideoCtx() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path, AVMediaType type) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream = av_find_best_stream(fmt, type, -1, -1, nullptr, 0);
    if (stream < 0) return -3;
    const AVCodec* codec =
        avcodec_find_decoder(fmt->streams[stream]->codecpar->codec_id);
    if (!codec) return -4;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -5;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream]->codecpar) < 0)
      return -6;
    dec->thread_count = 0;  // auto
    if (avcodec_open2(dec, codec, nullptr) < 0) return -7;
    return 0;
  }
};

}  // namespace

extern "C" {

// Probe container: duration (s), average fps, frame count, width, height.
int vm_probe(const char* path, double* duration, double* fps, long* nframes,
             int* width, int* height) {
  VideoCtx ctx;
  if (ctx.open(path, AVMEDIA_TYPE_VIDEO) != 0) return -1;
  AVStream* st = ctx.fmt->streams[ctx.stream];

  double r = st->avg_frame_rate.den
                 ? av_q2d(st->avg_frame_rate)
                 : (st->r_frame_rate.den ? av_q2d(st->r_frame_rate) : 0.0);
  double dur = 0.0;
  if (ctx.fmt->duration != AV_NOPTS_VALUE)
    dur = static_cast<double>(ctx.fmt->duration) / AV_TIME_BASE;
  else if (st->duration != AV_NOPTS_VALUE)
    dur = st->duration * av_q2d(st->time_base);

  long nf = st->nb_frames;
  if (nf <= 0 && r > 0.0) nf = static_cast<long>(dur * r + 0.5);

  *duration = dur;
  *fps = r;
  *nframes = nf;
  *width = ctx.dec->width;
  *height = ctx.dec->height;
  return 0;
}

// Decode the given (sorted ascending) frame indices into out
// [n_idx, out_h, out_w, 3] RGB24. Sequential single pass, like decord's
// uniform sampling path.
int vm_decode_frames(const char* path, const long* indices, int n_idx,
                     unsigned char* out, int out_w, int out_h) {
  if (n_idx <= 0) return 0;
  VideoCtx ctx;
  if (ctx.open(path, AVMEDIA_TYPE_VIDEO) != 0) return -1;

  SwsContext* sws =
      sws_getContext(ctx.dec->width, ctx.dec->height, ctx.dec->pix_fmt, out_w,
                     out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
                     nullptr);
  if (!sws) return -2;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  long frame_pos = 0;
  int want = 0;  // next index slot to fill
  const size_t frame_bytes = static_cast<size_t>(out_w) * out_h * 3;

  auto emit = [&](AVFrame* f) {
    while (want < n_idx && indices[want] == frame_pos) {
      uint8_t* dst[1] = {out + frame_bytes * want};
      int dst_stride[1] = {out_w * 3};
      sws_scale(sws, f->data, f->linesize, 0, ctx.dec->height, dst, dst_stride);
      ++want;
    }
    ++frame_pos;
  };

  int rc = 0;
  while (want < n_idx && av_read_frame(ctx.fmt, pkt) >= 0) {
    if (pkt->stream_index == ctx.stream) {
      if (avcodec_send_packet(ctx.dec, pkt) == 0) {
        while (avcodec_receive_frame(ctx.dec, frame) == 0) emit(frame);
      }
    }
    av_packet_unref(pkt);
  }
  // flush
  if (want < n_idx) {
    avcodec_send_packet(ctx.dec, nullptr);
    while (avcodec_receive_frame(ctx.dec, frame) == 0) emit(frame);
  }
  // If indices run past the decodable stream (header over-reported frames),
  // repeat the last decoded frame.
  if (want > 0) {
    while (want < n_idx) {
      std::memcpy(out + frame_bytes * want, out + frame_bytes * (want - 1),
                  frame_bytes);
      ++want;
    }
  } else {
    rc = -3;
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  return rc;
}

// ---------------------------------------------------------------------------
// Streaming frame decode: open once, pull sampled frames in chunks. Enables
// host-decode / device-encode overlap in the inference pipeline (the
// sequential vm_decode_frames would re-decode from the start per chunk).
// ---------------------------------------------------------------------------

struct VmStream {
  VideoCtx ctx;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  std::vector<long> indices;  // sorted ascending sample positions
  std::vector<unsigned char> last;  // last scaled frame (dup carry + pad)
  long last_idx = -1;         // global frame index held in `last`
  long frame_pos = 0;         // next decoder output's global frame index
  int want = 0;               // next indices[] slot to emit
  int out_w = 0, out_h = 0;
  bool flushed = false;       // send_packet(nullptr) issued
  bool eof = false;           // decoder fully drained

  ~VmStream() {
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (sws) sws_freeContext(sws);
  }
};

// -> opaque handle or nullptr. `indices` are the global frame numbers to
// sample (ascending), as produced by the fps sampling rule.
void* vm_stream_open(const char* path, const long* indices, int n_idx,
                     int out_w, int out_h) {
  VmStream* s = new VmStream();
  if (s->ctx.open(path, AVMEDIA_TYPE_VIDEO) != 0) {
    delete s;
    return nullptr;
  }
  s->sws = sws_getContext(s->ctx.dec->width, s->ctx.dec->height,
                          s->ctx.dec->pix_fmt, out_w, out_h, AV_PIX_FMT_RGB24,
                          SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!s->sws) {
    delete s;
    return nullptr;
  }
  s->pkt = av_packet_alloc();
  s->frame = av_frame_alloc();
  s->indices.assign(indices, indices + n_idx);
  s->out_w = out_w;
  s->out_h = out_h;
  return s;
}

// Decode forward until `cap` sampled frames are written to out
// [cap, out_h, out_w, 3] (or the stream ends). Returns frames written;
// 0 = end of stream. Short streams repeat the last decoded frame so the
// total across calls always reaches n_idx (vm_decode_frames semantics).
//
// Invariants kept across calls: a decoded frame is scaled into `last`
// BEFORE any copies to out, so a chunk boundary landing mid-way through
// duplicate sample indices (linspace time_range sampling) resumes from
// `last` on the next call; the decoder is drained with receive_frame
// before any new packet is sent, so no frame is ever popped-and-dropped
// when the cap fills inside a multi-frame drain (B-frame delay, flush).
int vm_stream_next(void* handle, unsigned char* out, int cap) {
  VmStream* s = static_cast<VmStream*>(handle);
  const int n = static_cast<int>(s->indices.size());
  const size_t frame_bytes = static_cast<size_t>(s->out_w) * s->out_h * 3;
  int written = 0;

  auto serve_from_last = [&]() {
    while (written < cap && s->want < n && s->indices[s->want] == s->last_idx) {
      std::memcpy(out + frame_bytes * written, s->last.data(), frame_bytes);
      ++written;
      ++s->want;
    }
  };

  // duplicates left over from the previous call's cap boundary
  if (!s->last.empty()) serve_from_last();

  while (written < cap && s->want < n && !s->eof) {
    // 1) drain whatever the decoder already holds
    int r = avcodec_receive_frame(s->ctx.dec, s->frame);
    if (r == 0) {
      if (s->want < n && s->indices[s->want] == s->frame_pos) {
        s->last.resize(frame_bytes);
        uint8_t* dst[1] = {s->last.data()};
        int dst_stride[1] = {s->out_w * 3};
        sws_scale(s->sws, s->frame->data, s->frame->linesize, 0,
                  s->ctx.dec->height, dst, dst_stride);
        s->last_idx = s->frame_pos;
        serve_from_last();
      }
      ++s->frame_pos;
      continue;
    }
    if (r == AVERROR_EOF || (s->flushed && r == AVERROR(EAGAIN))) {
      s->eof = true;
      break;
    }
    // 2) EAGAIN: feed the next packet (or start the flush)
    if (av_read_frame(s->ctx.fmt, s->pkt) >= 0) {
      if (s->pkt->stream_index == s->ctx.stream)
        avcodec_send_packet(s->ctx.dec, s->pkt);  // can't EAGAIN post-drain
      av_packet_unref(s->pkt);
    } else {
      avcodec_send_packet(s->ctx.dec, nullptr);
      s->flushed = true;
    }
  }

  // stream exhausted with indices left: repeat the last decoded frame
  if (s->eof && written < cap && s->want < n) {
    if (s->last.empty()) return -1;  // nothing ever decoded
    while (written < cap && s->want < n) {
      std::memcpy(out + frame_bytes * written, s->last.data(), frame_bytes);
      ++written;
      ++s->want;
    }
  }
  return written;
}

void vm_stream_close(void* handle) { delete static_cast<VmStream*>(handle); }

// Decode the audio stream, resampled to mono float32 at `sample_rate`.
// Returns 0 on success; *n_out = samples written (capped at max_samples).
int vm_decode_audio(const char* path, int sample_rate, float* out,
                    long max_samples, long* n_out) {
  *n_out = 0;
  VideoCtx ctx;
  if (ctx.open(path, AVMEDIA_TYPE_AUDIO) != 0) return -1;

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  if (ctx.dec->ch_layout.nb_channels > 0)
    av_channel_layout_copy(&in_layout, &ctx.dec->ch_layout);
  else
    av_channel_layout_default(&in_layout, 2);
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, sample_rate,
                          &in_layout, ctx.dec->sample_fmt,
                          ctx.dec->sample_rate, 0, nullptr) < 0)
    return -2;
  if (swr_init(swr) < 0) return -3;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  long written = 0;
  std::vector<float> tmp;

  auto drain = [&](AVFrame* f) {
    int out_cap = swr_get_out_samples(swr, f ? f->nb_samples : 0);
    if (out_cap <= 0) out_cap = 4096;
    tmp.resize(out_cap);
    uint8_t* dst[1] = {reinterpret_cast<uint8_t*>(tmp.data())};
    int got = swr_convert(swr, dst, out_cap,
                          f ? const_cast<const uint8_t**>(f->data) : nullptr,
                          f ? f->nb_samples : 0);
    if (got > 0) {
      long take = std::min<long>(got, max_samples - written);
      if (take > 0) {
        std::memcpy(out + written, tmp.data(), take * sizeof(float));
        written += take;
      }
    }
  };

  while (written < max_samples && av_read_frame(ctx.fmt, pkt) >= 0) {
    if (pkt->stream_index == ctx.stream) {
      if (avcodec_send_packet(ctx.dec, pkt) == 0) {
        while (avcodec_receive_frame(ctx.dec, frame) == 0) drain(frame);
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(ctx.dec, nullptr);
  while (avcodec_receive_frame(ctx.dec, frame) == 0) drain(frame);
  drain(nullptr);  // flush resampler

  av_frame_free(&frame);
  av_packet_free(&pkt);
  swr_free(&swr);
  av_channel_layout_uninit(&in_layout);
  *n_out = written;
  return 0;
}

}  // extern "C"
