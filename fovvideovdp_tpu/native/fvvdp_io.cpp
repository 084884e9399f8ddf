// Native host-side I/O runtime for fovvideovdp_tpu.
//
// The reference implementation's only native component is the external
// ffmpeg binary feeding a pipe (pyfvvdp/video_source_file.py:100-119); this
// library is the TPU build's equivalent host decode stage for raw video:
//
//  * yuv_reader: raw planar YUV file access with a background prefetch
//    thread and a ring of frame buffers, so disk/page-cache reads overlap
//    device compute (double-buffered, like the ffmpeg pipe overlap).
//  * frame block assembly: gathers arbitrary frame indices into one
//    contiguous buffer ready for a single host->device transfer.
//  * fixed-point unpack helpers (limited-range YUV -> float) for host-side
//    fallbacks.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 dependency).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct YuvFormat {
  int width = 0;
  int height = 0;
  int bit_depth = 8;
  int chroma_ss = 420;  // 420 or 444
  size_t bytes_per_sample() const { return bit_depth > 8 ? 2 : 1; }
  size_t y_samples() const { return (size_t)width * height; }
  size_t uv_samples() const {
    return chroma_ss == 420 ? y_samples() / 4 : y_samples();
  }
  size_t frame_samples() const { return y_samples() + 2 * uv_samples(); }
  size_t frame_bytes() const { return frame_samples() * bytes_per_sample(); }
};

struct Slot {
  std::vector<uint8_t> data;
  long frame = -1;
  bool ready = false;
};

struct YuvReader {
  FILE* f = nullptr;
  YuvFormat fmt;
  long n_frames = 0;

  // prefetch ring
  std::vector<Slot> ring;
  std::mutex mu;
  std::condition_variable cv;
  std::thread worker;
  std::atomic<bool> stop{false};
  long next_prefetch = 0;   // next frame the worker should read
  int ring_size = 4;

  ~YuvReader() {
    stop.store(true);
    cv.notify_all();
    if (worker.joinable()) worker.join();
    if (f) fclose(f);
  }

  bool read_frame_at(long idx, uint8_t* dst) {
    if (idx < 0 || idx >= n_frames) return false;
#if defined(_WIN32)
    _fseeki64(f, (long long)idx * fmt.frame_bytes(), SEEK_SET);
#else
    fseeko(f, (off_t)idx * fmt.frame_bytes(), SEEK_SET);
#endif
    return fread(dst, 1, fmt.frame_bytes(), f) == fmt.frame_bytes();
  }

  void worker_loop() {
    std::unique_lock<std::mutex> lk(mu);
    while (!stop.load()) {
      // find a free slot and the next frame to prefetch
      Slot* free_slot = nullptr;
      for (auto& s : ring) {
        if (!s.ready && s.frame < 0) { free_slot = &s; break; }
      }
      if (free_slot == nullptr || next_prefetch >= n_frames) {
        cv.wait(lk);
        continue;
      }
      long idx = next_prefetch++;
      free_slot->frame = idx;
      lk.unlock();
      bool ok = read_frame_at(idx, free_slot->data.data());
      lk.lock();
      free_slot->ready = ok;
      if (!ok) free_slot->frame = -1;
      cv.notify_all();
    }
  }

  // Sequential fetch with read-ahead; falls back to direct read for random
  // access (circular/pingpong padding).
  bool fetch(long idx, uint8_t* dst) {
    std::unique_lock<std::mutex> lk(mu);
    for (auto& s : ring) {
      if (s.frame == idx && s.ready) {
        memcpy(dst, s.data.data(), fmt.frame_bytes());
        s.frame = -1;
        s.ready = false;
        cv.notify_all();
        return true;
      }
    }
    // not prefetched (random access or first use): read directly and steer
    // the prefetcher to follow this position
    if (idx + 1 > next_prefetch || idx + (long)ring.size() < next_prefetch) {
      next_prefetch = idx + 1;
      for (auto& s : ring) {             // drop stale prefetches
        if (s.ready && (s.frame < idx || s.frame > idx + ring_size)) {
          s.frame = -1;
          s.ready = false;
        }
      }
      cv.notify_all();
    }
    lk.unlock();
    return read_frame_at(idx, dst);
  }
};

}  // namespace

extern "C" {

void* fvvdp_yuv_open(const char* path, int width, int height, int bit_depth,
                     int chroma_ss, int ring_size) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* r = new YuvReader();
  r->f = f;
  r->fmt = YuvFormat{width, height, bit_depth, chroma_ss};
#if defined(_WIN32)
  _fseeki64(f, 0, SEEK_END);
  long long sz = _ftelli64(f);
#else
  fseeko(f, 0, SEEK_END);
  off_t sz = ftello(f);
#endif
  r->n_frames = (long)(sz / r->fmt.frame_bytes());
  r->ring_size = ring_size > 0 ? ring_size : 4;
  r->ring.resize(r->ring_size);
  for (auto& s : r->ring) s.data.resize(r->fmt.frame_bytes());
  r->worker = std::thread([r] { r->worker_loop(); });
  return r;
}

long fvvdp_yuv_frame_count(void* handle) {
  return handle ? static_cast<YuvReader*>(handle)->n_frames : -1;
}

// Read `count` frames starting at `start` into a contiguous buffer of
// count * frame_bytes. Returns frames read.
long fvvdp_yuv_read_block(void* handle, long start, long count, uint8_t* dst) {
  if (!handle) return 0;
  auto* r = static_cast<YuvReader*>(handle);
  size_t fb = r->fmt.frame_bytes();
  long done = 0;
  for (long i = 0; i < count; ++i) {
    if (!r->fetch(start + i, dst + (size_t)i * fb)) break;
    ++done;
  }
  return done;
}

// Gather arbitrary frame indices into a contiguous buffer.
long fvvdp_yuv_read_indices(void* handle, const long* indices, long count,
                            uint8_t* dst) {
  if (!handle) return 0;
  auto* r = static_cast<YuvReader*>(handle);
  size_t fb = r->fmt.frame_bytes();
  long done = 0;
  for (long i = 0; i < count; ++i) {
    if (!r->fetch(indices[i], dst + (size_t)i * fb)) break;
    ++done;
  }
  return done;
}

void fvvdp_yuv_close(void* handle) {
  delete static_cast<YuvReader*>(handle);
}

// Limited-range fixed-point -> float unpack (video_source_yuv.py:205-218):
// luma:   clip(v / (2^(bd-8) * 219) - 16/219, 0, 1)
// chroma: clip(v / (2^(bd-8) * 224) - 128/224, -0.5, 0.5)
static inline void unpack_plane(const void* src, float* dst, size_t n,
                                int bit_depth, int is_chroma) {
  const float scale = 1.0f / ((float)(1 << (bit_depth - 8)) *
                              (is_chroma ? 224.0f : 219.0f));
  const float offset = is_chroma ? 128.0f / 224.0f : 16.0f / 219.0f;
  const float lo = is_chroma ? -0.5f : 0.0f;
  const float hi = is_chroma ? 0.5f : 1.0f;
  if (bit_depth > 8) {
    const uint16_t* s = static_cast<const uint16_t*>(src);
    for (size_t i = 0; i < n; ++i) {
      float v = (float)s[i] * scale - offset;
      dst[i] = v < lo ? lo : (v > hi ? hi : v);
    }
  } else {
    const uint8_t* s = static_cast<const uint8_t*>(src);
    for (size_t i = 0; i < n; ++i) {
      float v = (float)s[i] * scale - offset;
      dst[i] = v < lo ? lo : (v > hi ? hi : v);
    }
  }
}

void fvvdp_unpack_yuv_frame(const uint8_t* frame, float* y_out, float* u_out,
                            float* v_out, int width, int height, int bit_depth,
                            int chroma_ss) {
  YuvFormat fmt{width, height, bit_depth, chroma_ss};
  size_t bps = fmt.bytes_per_sample();
  const uint8_t* y = frame;
  const uint8_t* u = y + fmt.y_samples() * bps;
  const uint8_t* v = u + fmt.uv_samples() * bps;
  unpack_plane(y, y_out, fmt.y_samples(), bit_depth, 0);
  unpack_plane(u, u_out, fmt.uv_samples(), bit_depth, 1);
  unpack_plane(v, v_out, fmt.uv_samples(), bit_depth, 1);
}

}  // extern "C"
