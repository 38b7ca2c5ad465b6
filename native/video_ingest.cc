// vidtok_tpu native video ingest — the decord replacement.
//
// FFmpeg (libavformat/libavcodec/libswscale) demux + decode + RGB24 scale,
// exposed as a C ABI consumed from Python via ctypes
// (vidtok_tpu/data/native_reader.py). Replaces the reference's decord
// dependency (reference vidtok/data/video_read.py:3-9): open a container,
// report frame count / fps, and gather an arbitrary batch of frame indices
// into a caller-provided uint8 [T, H, W, 3] buffer in one sequential sweep.
//
// Design notes:
//  * single sequential decode sweep per gather (indices sorted internally)
//    — for the framework's access patterns (fps-strided windows) this beats
//    per-frame seeking and never produces seek-inaccuracy artifacts;
//  * optional target (height, width): swscale does the resize (bilinear)
//    during colorspace conversion, so Python never touches full-res frames;
//  * one decoder context per handle; handles are independent, so Python
//    worker threads decode in parallel while ffmpeg releases the GIL.
//
// Build: see native/build.sh (emits libvidtok_ingest.so next to this file).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct VideoHandle {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int64_t n_frames = 0;
  double fps = 0.0;
  int width = 0;
  int height = 0;
  int sws_w = 0, sws_h = 0;

  ~VideoHandle() {
    if (sws) sws_freeContext(sws);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }
};

int64_t count_frames_estimate(AVFormatContext* fmt, AVStream* st) {
  if (st->nb_frames > 0) return st->nb_frames;
  // fall back to duration * fps
  double fps = av_q2d(st->avg_frame_rate);
  if (st->duration > 0 && fps > 0) {
    return static_cast<int64_t>(st->duration * av_q2d(st->time_base) * fps + 0.5);
  }
  if (fmt->duration > 0 && fps > 0) {
    return static_cast<int64_t>(fmt->duration / (double)AV_TIME_BASE * fps + 0.5);
  }
  return 0;
}

}  // namespace

extern "C" {

// Opens a video; returns an opaque handle or nullptr.
void* vt_open(const char* path) {
  auto h = new VideoHandle();
  if (avformat_open_input(&h->fmt, path, nullptr, nullptr) < 0) {
    delete h;
    return nullptr;
  }
  if (avformat_find_stream_info(h->fmt, nullptr) < 0) {
    delete h;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  h->stream_index =
      av_find_best_stream(h->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (h->stream_index < 0 || !dec) {
    delete h;
    return nullptr;
  }
  AVStream* st = h->fmt->streams[h->stream_index];
  h->codec = avcodec_alloc_context3(dec);
  if (!h->codec ||
      avcodec_parameters_to_context(h->codec, st->codecpar) < 0 ||
      avcodec_open2(h->codec, dec, nullptr) < 0) {
    delete h;
    return nullptr;
  }
  h->width = h->codec->width;
  h->height = h->codec->height;
  h->fps = av_q2d(st->avg_frame_rate);
  h->n_frames = count_frames_estimate(h->fmt, st);
  return h;
}

void vt_close(void* handle) { delete static_cast<VideoHandle*>(handle); }

int64_t vt_num_frames(void* handle) {
  return static_cast<VideoHandle*>(handle)->n_frames;
}
double vt_fps(void* handle) { return static_cast<VideoHandle*>(handle)->fps; }
int vt_width(void* handle) { return static_cast<VideoHandle*>(handle)->width; }
int vt_height(void* handle) {
  return static_cast<VideoHandle*>(handle)->height;
}

// Decodes the frames at `indices` (any order, duplicates allowed) into
// `out` as uint8 RGB24 [n, out_h, out_w, 3]. out_h/out_w of 0 mean native
// size. Returns the number of positions filled (tail indices past EOF are
// filled with the last decoded frame, matching the Python fallback
// semantics), or -1 on error.
int64_t vt_gather(void* handle, const int64_t* indices, int64_t n,
                  uint8_t* out, int out_h, int out_w) {
  auto* h = static_cast<VideoHandle*>(handle);
  if (n <= 0) return 0;
  if (out_h <= 0) out_h = h->height;
  if (out_w <= 0) out_w = h->width;
  const int64_t frame_bytes = (int64_t)out_h * out_w * 3;

  // map frame index -> output positions
  std::vector<std::pair<int64_t, int64_t>> want(n);
  for (int64_t i = 0; i < n; ++i) want[i] = {indices[i], i};
  std::sort(want.begin(), want.end());
  const int64_t max_idx = want.back().first;

  // rewind to the start for a clean sweep
  AVStream* st = h->fmt->streams[h->stream_index];
  int64_t start_ts =
      st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
  av_seek_frame(h->fmt, h->stream_index, start_ts, AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(h->codec);

  if (!h->sws || h->sws_w != out_w || h->sws_h != out_h) {
    if (h->sws) sws_freeContext(h->sws);
    h->sws = sws_getContext(h->width, h->height, h->codec->pix_fmt, out_w,
                            out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                            nullptr, nullptr);
    h->sws_w = out_w;
    h->sws_h = out_h;
  }
  if (!h->sws) return -1;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t decoded = 0;     // index of the next frame to come out
  size_t cursor = 0;       // next wanted entry
  int64_t filled = 0;
  int64_t last_filled_pos = -1;

  auto emit = [&](AVFrame* f, int64_t frame_idx) {
    while (cursor < want.size() && want[cursor].first == frame_idx) {
      uint8_t* dst = out + want[cursor].second * frame_bytes;
      uint8_t* dst_planes[1] = {dst};
      int dst_stride[1] = {out_w * 3};
      sws_scale(h->sws, f->data, f->linesize, 0, h->height, dst_planes,
                dst_stride);
      last_filled_pos = want[cursor].second;
      ++filled;
      ++cursor;
    }
  };

  bool eof = false;
  while (!eof && cursor < want.size() && decoded <= max_idx) {
    int ret = av_read_frame(h->fmt, pkt);
    if (ret < 0) {
      avcodec_send_packet(h->codec, nullptr);  // flush
      eof = true;
    } else if (pkt->stream_index != h->stream_index) {
      av_packet_unref(pkt);
      continue;
    } else {
      avcodec_send_packet(h->codec, pkt);
      av_packet_unref(pkt);
    }
    while (true) {
      int r = avcodec_receive_frame(h->codec, frame);
      if (r < 0) break;
      emit(frame, decoded);
      ++decoded;
      av_frame_unref(frame);
      if (cursor >= want.size()) break;
    }
  }

  // tail indices past EOF: replicate the last filled frame
  if (filled > 0 && cursor < want.size() && last_filled_pos >= 0) {
    for (; cursor < want.size(); ++cursor) {
      std::memcpy(out + want[cursor].second * frame_bytes,
                  out + last_filled_pos * frame_bytes, frame_bytes);
      ++filled;
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  return filled;
}

}  // extern "C"
