// Native frame sink: the "present" path of the engine.
//
// Replaces the reference's D3D12 swap-chain/present machinery
// (main.cpp:194-217, CudaD3D12Texture.cu) with what a headless TPU renderer
// actually needs: a lock-free-ish ring buffer fed from the render loop
// (device->host RGBA frames) and a writer thread that encodes PNGs (or raw
// .rgba) to disk without blocking the frame loop.  Exposed as a C ABI for
// ctypes (no pybind11 in this image).
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// Minimal PNG encoder (RGB8) on top of zlib. Enough for frame dumps; no
// external image libraries.
// ---------------------------------------------------------------------------
void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 8) & 0xff); v.push_back(x & 0xff);
}

void write_chunk(FILE* f, const char type[4], const uint8_t* data, size_t n) {
  std::vector<uint8_t> hdr;
  put_be32(hdr, static_cast<uint32_t>(n));
  fwrite(hdr.data(), 1, 4, f);
  fwrite(type, 1, 4, f);
  if (n) fwrite(data, 1, n, f);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, reinterpret_cast<const Bytef*>(type), 4);
  if (n) crc = crc32(crc, data, static_cast<uInt>(n));
  std::vector<uint8_t> tail;
  put_be32(tail, crc);
  fwrite(tail.data(), 1, 4, f);
}

bool write_png(const std::string& path, const uint8_t* rgb, int w, int h) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) return false;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  fwrite(sig, 1, 8, f);

  std::vector<uint8_t> ihdr;
  put_be32(ihdr, static_cast<uint32_t>(w));
  put_be32(ihdr, static_cast<uint32_t>(h));
  ihdr.push_back(8);   // bit depth
  ihdr.push_back(2);   // color type: truecolor RGB
  ihdr.push_back(0); ihdr.push_back(0); ihdr.push_back(0);
  write_chunk(f, "IHDR", ihdr.data(), ihdr.size());

  // filter byte 0 per scanline, then zlib-compress
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (1 + 3 * w));
  for (int y = 0; y < h; ++y) {
    raw[static_cast<size_t>(y) * (1 + 3 * w)] = 0;
    memcpy(&raw[static_cast<size_t>(y) * (1 + 3 * w) + 1],
           rgb + static_cast<size_t>(y) * 3 * w, 3 * w);
  }
  uLongf bound = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> z(bound);
  if (compress2(z.data(), &bound, raw.data(),
                static_cast<uLong>(raw.size()), 6) != Z_OK) {
    fclose(f);
    return false;
  }
  write_chunk(f, "IDAT", z.data(), bound);
  write_chunk(f, "IEND", nullptr, 0);
  fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// Frame ring + writer thread.
// ---------------------------------------------------------------------------
struct Frame {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  uint64_t index = 0;
};

class FrameSink {
 public:
  FrameSink(const char* dir, const char* prefix, int capacity)
      : dir_(dir), prefix_(prefix), capacity_(capacity),
        writer_([this] { Run(); }) {}

  ~FrameSink() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_.notify_all();
    writer_.join();
  }

  // Returns 0 on accept, 1 if the ring is full (frame dropped).
  int Push(const uint8_t* rgb, int w, int h, uint64_t index) {
    std::lock_guard<std::mutex> lk(mu_);
    if (static_cast<int>(q_.size()) >= capacity_) {
      dropped_.fetch_add(1);
      return 1;
    }
    Frame fr;
    fr.rgb.assign(rgb, rgb + static_cast<size_t>(w) * h * 3);
    fr.w = w; fr.h = h; fr.index = index;
    q_.push(std::move(fr));
    cv_.notify_one();
    return 0;
  }

  void Flush() {
    std::unique_lock<std::mutex> lk(mu_);
    idle_cv_.wait(lk, [this] { return q_.empty() && !busy_; });
  }

  uint64_t written() const { return written_.load(); }
  uint64_t dropped() const { return dropped_.load(); }

 private:
  void Run() {
    for (;;) {
      Frame fr;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return done_ || !q_.empty(); });
        if (q_.empty()) {
          if (done_) return;
          continue;
        }
        fr = std::move(q_.front());
        q_.pop();
        busy_ = true;
      }
      char name[512];
      snprintf(name, sizeof(name), "%s/%s%06llu.png", dir_.c_str(),
               prefix_.c_str(), static_cast<unsigned long long>(fr.index));
      if (write_png(name, fr.rgb.data(), fr.w, fr.h)) {
        written_.fetch_add(1);
      }
      {
        std::lock_guard<std::mutex> lk(mu_);
        busy_ = false;
      }
      idle_cv_.notify_all();
    }
  }

  std::string dir_, prefix_;
  int capacity_;
  std::mutex mu_;
  std::condition_variable cv_, idle_cv_;
  std::queue<Frame> q_;
  bool done_ = false;
  bool busy_ = false;
  std::atomic<uint64_t> written_{0}, dropped_{0};
  std::thread writer_;
};

}  // namespace

extern "C" {

void* framesink_create(const char* dir, const char* prefix, int capacity) {
  return new FrameSink(dir, prefix, capacity);
}

int framesink_push(void* sink, const uint8_t* rgb, int w, int h,
                   uint64_t index) {
  return static_cast<FrameSink*>(sink)->Push(rgb, w, h, index);
}

void framesink_flush(void* sink) { static_cast<FrameSink*>(sink)->Flush(); }

uint64_t framesink_written(void* sink) {
  return static_cast<FrameSink*>(sink)->written();
}

uint64_t framesink_dropped(void* sink) {
  return static_cast<FrameSink*>(sink)->dropped();
}

void framesink_destroy(void* sink) { delete static_cast<FrameSink*>(sink); }

// Standalone PNG write (synchronous) - used by tests and one-off dumps.
int framesink_write_png(const char* path, const uint8_t* rgb, int w, int h) {
  return write_png(path, rgb, w, h) ? 0 : 1;
}

}  // extern "C"
