// Native video sink: MJPEG encoder + AVI / MP4 muxers.
//
// Completes the driver's presentation contract (SURVEY.md §7.7 "PNG/video";
// the reference presents through a D3D12 swap chain, main.cpp:194-217).
// The image has no ffmpeg, so the encoder is self-contained: baseline
// sequential JPEG (ITU T.81 Annex K tables, 4:4:4) muxed as Motion-JPEG
// into either an AVI ('MJPG') or an ISO-BMFF MP4 ('mp4v' with
// objectTypeIndication 0x6C = JPEG).  Frames are encoded on a writer
// thread so the render loop never blocks; exposed as a C ABI for ctypes.
//
// Build: see native/build.sh.
#include <atomic>
#include <condition_variable>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Baseline JPEG encoder (ITU T.81, Annex K tables), 4:4:4, quality-scaled.
// ---------------------------------------------------------------------------
const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

const uint8_t kLumaQ[64] = {
    16, 11, 10, 16, 24,  40,  51,  61,  12, 12, 14, 19, 26,  58,  60,  55,
    14, 13, 16, 24, 40,  57,  69,  56,  14, 17, 22, 29, 51,  87,  80,  62,
    18, 22, 37, 56, 68,  109, 103, 77,  24, 35, 55, 64, 81,  104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99};

const uint8_t kChromaQ[64] = {
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99};

// Annex K Huffman specs: (bits[1..16], values).
const uint8_t kDcLumaBits[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0,
                                 0, 0, 0, 0};
const uint8_t kDcLumaVals[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
const uint8_t kDcChromaBits[17] = {0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0,
                                   0, 0, 0, 0};
const uint8_t kDcChromaVals[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
const uint8_t kAcLumaBits[17] = {0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4,
                                 0, 0, 1, 0x7d};
const uint8_t kAcLumaVals[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};
const uint8_t kAcChromaBits[17] = {0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4,
                                   0, 1, 2, 0x77};
const uint8_t kAcChromaVals[162] = {
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

struct HuffTable {
  uint16_t code[256];
  uint8_t len[256];
  void Build(const uint8_t bits[17], const uint8_t* vals) {
    memset(len, 0, sizeof(len));
    uint16_t c = 0;
    int k = 0;
    for (int l = 1; l <= 16; ++l) {
      for (int i = 0; i < bits[l]; ++i) {
        code[vals[k]] = c++;
        len[vals[k]] = static_cast<uint8_t>(l);
        ++k;
      }
      c <<= 1;
    }
  }
};

struct BitWriter {
  std::vector<uint8_t>* out;
  uint32_t buf = 0;
  int nbits = 0;
  void Put(int code, int length) {
    buf = (buf << length) | (static_cast<uint32_t>(code) &
                             ((1u << length) - 1));
    nbits += length;
    while (nbits >= 8) {
      uint8_t b = static_cast<uint8_t>((buf >> (nbits - 8)) & 0xff);
      out->push_back(b);
      if (b == 0xff) out->push_back(0x00);  // byte stuffing
      nbits -= 8;
    }
  }
  void Flush() {
    if (nbits > 0) Put(0x7f, 8 - nbits > 7 ? 7 : 8 - nbits);
    if (nbits > 0) Put((1 << (8 - nbits)) - 1, 8 - nbits);
  }
};

void ScaleQuant(const uint8_t* base, int quality, uint8_t* out) {
  if (quality < 1) quality = 1;
  if (quality > 100) quality = 100;
  int scale = quality < 50 ? 5000 / quality : 200 - 2 * quality;
  for (int i = 0; i < 64; ++i) {
    int v = (base[i] * scale + 50) / 100;
    out[i] = static_cast<uint8_t>(v < 1 ? 1 : (v > 255 ? 255 : v));
  }
}

// 8x8 forward DCT (separable, float).
void Fdct(float blk[64]) {
  static float cs[8][8];
  static bool init = false;
  if (!init) {
    for (int u = 0; u < 8; ++u)
      for (int x = 0; x < 8; ++x)
        cs[u][x] = std::cos((2 * x + 1) * u * 3.14159265358979323846 / 16.0);
    init = true;
  }
  float tmp[64];
  for (int y = 0; y < 8; ++y) {       // rows
    for (int u = 0; u < 8; ++u) {
      float s = 0;
      for (int x = 0; x < 8; ++x) s += blk[y * 8 + x] * cs[u][x];
      tmp[y * 8 + u] = s * 0.5f * (u == 0 ? 0.70710678f : 1.0f);
    }
  }
  for (int u = 0; u < 8; ++u) {       // cols
    for (int v = 0; v < 8; ++v) {
      float s = 0;
      for (int y = 0; y < 8; ++y) s += tmp[y * 8 + u] * cs[v][y];
      blk[v * 8 + u] = s * 0.5f * (v == 0 ? 0.70710678f : 1.0f);
    }
  }
}

int Category(int v) {
  int a = v < 0 ? -v : v;
  int s = 0;
  while (a) { ++s; a >>= 1; }
  return s;
}

void EncodeBlock(BitWriter* bw, const float* plane, int w, int h, int bx,
                 int by, const uint8_t q[64], const HuffTable& dc,
                 const HuffTable& ac, int* pred) {
  float blk[64];
  for (int y = 0; y < 8; ++y) {
    int sy = by + y;
    if (sy >= h) sy = h - 1;
    for (int x = 0; x < 8; ++x) {
      int sx = bx + x;
      if (sx >= w) sx = w - 1;
      blk[y * 8 + x] = plane[sy * w + sx] - 128.0f;
    }
  }
  Fdct(blk);
  int coef[64];
  for (int i = 0; i < 64; ++i) {
    float v = blk[kZigzag[i]] / q[kZigzag[i]];
    coef[i] = static_cast<int>(v < 0 ? v - 0.5f : v + 0.5f);
  }
  int diff = coef[0] - *pred;
  *pred = coef[0];
  int s = Category(diff);
  bw->Put(dc.code[s], dc.len[s]);
  if (s) bw->Put(diff < 0 ? diff + (1 << s) - 1 : diff, s);
  int run = 0;
  for (int i = 1; i < 64; ++i) {
    if (coef[i] == 0) { ++run; continue; }
    while (run > 15) { bw->Put(ac.code[0xf0], ac.len[0xf0]); run -= 16; }
    int sz = Category(coef[i]);
    int sym = (run << 4) | sz;
    bw->Put(ac.code[sym], ac.len[sym]);
    bw->Put(coef[i] < 0 ? coef[i] + (1 << sz) - 1 : coef[i], sz);
    run = 0;
  }
  if (run) bw->Put(ac.code[0x00], ac.len[0x00]);
}

void PutMarker(std::vector<uint8_t>* o, uint8_t m) {
  o->push_back(0xff);
  o->push_back(m);
}

void PutSegment(std::vector<uint8_t>* o, uint8_t m,
                const std::vector<uint8_t>& body) {
  PutMarker(o, m);
  uint16_t n = static_cast<uint16_t>(body.size() + 2);
  o->push_back(n >> 8);
  o->push_back(n & 0xff);
  o->insert(o->end(), body.begin(), body.end());
}

void EncodeJpeg(const uint8_t* rgb, int w, int h, int quality,
                std::vector<uint8_t>* out) {
  uint8_t qy[64], qc[64];
  ScaleQuant(kLumaQ, quality, qy);
  ScaleQuant(kChromaQ, quality, qc);
  static HuffTable dcl, dcc, acl, acc;
  static bool built = false;
  if (!built) {
    dcl.Build(kDcLumaBits, kDcLumaVals);
    dcc.Build(kDcChromaBits, kDcChromaVals);
    acl.Build(kAcLumaBits, kAcLumaVals);
    acc.Build(kAcChromaBits, kAcChromaVals);
    built = true;
  }

  // RGB -> YCbCr planes (JFIF full range)
  std::vector<float> Y(static_cast<size_t>(w) * h);
  std::vector<float> Cb(Y.size()), Cr(Y.size());
  for (size_t i = 0; i < Y.size(); ++i) {
    float r = rgb[3 * i], g = rgb[3 * i + 1], b = rgb[3 * i + 2];
    Y[i] = 0.299f * r + 0.587f * g + 0.114f * b;
    Cb[i] = -0.168736f * r - 0.331264f * g + 0.5f * b + 128.0f;
    Cr[i] = 0.5f * r - 0.418688f * g - 0.081312f * b + 128.0f;
  }

  out->clear();
  PutMarker(out, 0xd8);  // SOI
  {  // APP0 JFIF
    std::vector<uint8_t> b = {'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1,
                              0, 0};
    PutSegment(out, 0xe0, b);
  }
  {  // DQT x2
    std::vector<uint8_t> b;
    b.push_back(0);
    for (int i = 0; i < 64; ++i) b.push_back(qy[kZigzag[i]]);
    b.push_back(1);
    for (int i = 0; i < 64; ++i) b.push_back(qc[kZigzag[i]]);
    PutSegment(out, 0xdb, b);
  }
  {  // SOF0: 8-bit, 3 components, 1x1 sampling (4:4:4)
    std::vector<uint8_t> b = {8,
                              static_cast<uint8_t>(h >> 8),
                              static_cast<uint8_t>(h & 0xff),
                              static_cast<uint8_t>(w >> 8),
                              static_cast<uint8_t>(w & 0xff),
                              3,
                              1, 0x11, 0,
                              2, 0x11, 1,
                              3, 0x11, 1};
    PutSegment(out, 0xc0, b);
  }
  {  // DHT x4
    std::vector<uint8_t> b;
    auto add = [&b](uint8_t cls_id, const uint8_t bits[17],
                    const uint8_t* vals) {
      b.push_back(cls_id);
      int n = 0;
      for (int l = 1; l <= 16; ++l) { b.push_back(bits[l]); n += bits[l]; }
      for (int i = 0; i < n; ++i) b.push_back(vals[i]);
    };
    add(0x00, kDcLumaBits, kDcLumaVals);
    add(0x10, kAcLumaBits, kAcLumaVals);
    add(0x01, kDcChromaBits, kDcChromaVals);
    add(0x11, kAcChromaBits, kAcChromaVals);
    PutSegment(out, 0xc4, b);
  }
  {  // SOS
    std::vector<uint8_t> b = {3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0};
    PutSegment(out, 0xda, b);
  }
  BitWriter bw;
  bw.out = out;
  int predY = 0, predCb = 0, predCr = 0;
  for (int by = 0; by < h; by += 8) {
    for (int bx = 0; bx < w; bx += 8) {
      EncodeBlock(&bw, Y.data(), w, h, bx, by, qy, dcl, acl, &predY);
      EncodeBlock(&bw, Cb.data(), w, h, bx, by, qc, dcc, acc, &predCb);
      EncodeBlock(&bw, Cr.data(), w, h, bx, by, qc, dcc, acc, &predCr);
    }
  }
  bw.Flush();
  PutMarker(out, 0xd9);  // EOI
}

// ---------------------------------------------------------------------------
// Little-endian / big-endian file helpers.
// ---------------------------------------------------------------------------
void W32le(FILE* f, uint32_t v) {
  uint8_t b[4] = {static_cast<uint8_t>(v), static_cast<uint8_t>(v >> 8),
                  static_cast<uint8_t>(v >> 16),
                  static_cast<uint8_t>(v >> 24)};
  fwrite(b, 1, 4, f);
}
void W16le(FILE* f, uint16_t v) {
  uint8_t b[2] = {static_cast<uint8_t>(v), static_cast<uint8_t>(v >> 8)};
  fwrite(b, 1, 2, f);
}
void W32be(FILE* f, uint32_t v) {
  uint8_t b[4] = {static_cast<uint8_t>(v >> 24),
                  static_cast<uint8_t>(v >> 16),
                  static_cast<uint8_t>(v >> 8), static_cast<uint8_t>(v)};
  fwrite(b, 1, 4, f);
}
void Wtag(FILE* f, const char t[4]) { fwrite(t, 1, 4, f); }

// ---------------------------------------------------------------------------
// AVI (MJPG) muxer: sizes patched on Close.
// ---------------------------------------------------------------------------
class AviMuxer {
 public:
  bool Open(const std::string& path, int w, int h, double fps) {
    f_ = fopen(path.c_str(), "wb");
    if (!f_) return false;
    w_ = w; h_ = h; fps_ = fps;
    Wtag(f_, "RIFF"); riff_size_pos_ = ftell(f_); W32le(f_, 0);
    Wtag(f_, "AVI ");
    Wtag(f_, "LIST"); W32le(f_, 4 + 64 + 8 + 4 + 64 + 48);
    Wtag(f_, "hdrl");
    Wtag(f_, "avih"); W32le(f_, 56);
    W32le(f_, static_cast<uint32_t>(1e6 / fps));  // usec/frame
    W32le(f_, 0); W32le(f_, 0);
    W32le(f_, 0x10);                              // AVIF_HASINDEX
    frames_pos_.push_back(ftell(f_)); W32le(f_, 0);  // dwTotalFrames
    W32le(f_, 0); W32le(f_, 1);                   // streams
    W32le(f_, static_cast<uint32_t>(w) * h * 3);
    W32le(f_, static_cast<uint32_t>(w)); W32le(f_, static_cast<uint32_t>(h));
    W32le(f_, 0); W32le(f_, 0); W32le(f_, 0); W32le(f_, 0);
    Wtag(f_, "LIST"); W32le(f_, 4 + 8 + 56 + 8 + 40);
    Wtag(f_, "strl");
    Wtag(f_, "strh"); W32le(f_, 56);
    Wtag(f_, "vids"); Wtag(f_, "MJPG");
    W32le(f_, 0); W16le(f_, 0); W16le(f_, 0);
    W32le(f_, 0);
    W32le(f_, 1000);                              // scale
    W32le(f_, static_cast<uint32_t>(fps * 1000 + 0.5));  // rate
    W32le(f_, 0);
    frames_pos_.push_back(ftell(f_)); W32le(f_, 0);  // dwLength
    W32le(f_, static_cast<uint32_t>(w) * h * 3);
    W32le(f_, 0xffffffff);                        // quality
    W32le(f_, 0);
    W16le(f_, 0); W16le(f_, 0);
    W16le(f_, static_cast<uint16_t>(w)); W16le(f_, static_cast<uint16_t>(h));
    Wtag(f_, "strf"); W32le(f_, 40);
    W32le(f_, 40);
    W32le(f_, static_cast<uint32_t>(w)); W32le(f_, static_cast<uint32_t>(h));
    W16le(f_, 1); W16le(f_, 24);
    Wtag(f_, "MJPG");
    W32le(f_, static_cast<uint32_t>(w) * h * 3);
    W32le(f_, 0); W32le(f_, 0); W32le(f_, 0); W32le(f_, 0);
    Wtag(f_, "LIST"); movi_size_pos_ = ftell(f_); W32le(f_, 0);
    movi_start_ = ftell(f_);
    Wtag(f_, "movi");
    return true;
  }

  void AddFrame(const std::vector<uint8_t>& jpeg) {
    uint32_t off = static_cast<uint32_t>(ftell(f_) - movi_start_);
    uint32_t n = static_cast<uint32_t>(jpeg.size());
    Wtag(f_, "00dc"); W32le(f_, n);
    fwrite(jpeg.data(), 1, n, f_);
    if (n & 1) fputc(0, f_);
    index_.push_back({off, n});
    ++nframes_;
  }

  void Close() {
    long movi_end = ftell(f_);
    Wtag(f_, "idx1"); W32le(f_, static_cast<uint32_t>(index_.size() * 16));
    for (auto& e : index_) {
      Wtag(f_, "00dc"); W32le(f_, 0x10);  // AVIIF_KEYFRAME
      W32le(f_, e.first); W32le(f_, e.second);
    }
    long end = ftell(f_);
    fseek(f_, riff_size_pos_, SEEK_SET); W32le(f_, end - 8);
    fseek(f_, movi_size_pos_, SEEK_SET);
    W32le(f_, static_cast<uint32_t>(movi_end - movi_start_));
    for (long p : frames_pos_) {
      fseek(f_, p, SEEK_SET); W32le(f_, nframes_);
    }
    fclose(f_);
    f_ = nullptr;
  }

 private:
  FILE* f_ = nullptr;
  int w_ = 0, h_ = 0;
  double fps_ = 30;
  long riff_size_pos_ = 0, movi_size_pos_ = 0, movi_start_ = 0;
  std::vector<long> frames_pos_;
  std::vector<std::pair<uint32_t, uint32_t>> index_;
  uint32_t nframes_ = 0;
};

// ---------------------------------------------------------------------------
// Minimal ISO-BMFF MP4 muxer: Motion-JPEG as 'mp4v' with OTI 0x6C (JPEG).
// Layout: ftyp, mdat (all samples), moov at the end.
// ---------------------------------------------------------------------------
class Mp4Muxer {
 public:
  bool Open(const std::string& path, int w, int h, double fps) {
    f_ = fopen(path.c_str(), "wb");
    if (!f_) return false;
    w_ = w; h_ = h; fps_ = fps;
    // ftyp
    W32be(f_, 20); Wtag(f_, "ftyp"); Wtag(f_, "isom"); W32be(f_, 512);
    Wtag(f_, "isom");
    mdat_size_pos_ = ftell(f_);
    W32be(f_, 8); Wtag(f_, "mdat");
    return true;
  }

  void AddFrame(const std::vector<uint8_t>& jpeg) {
    offsets_.push_back(static_cast<uint32_t>(ftell(f_)));
    sizes_.push_back(static_cast<uint32_t>(jpeg.size()));
    fwrite(jpeg.data(), 1, jpeg.size(), f_);
  }

  void Close() {
    long mdat_end = ftell(f_);
    uint32_t n = static_cast<uint32_t>(sizes_.size());
    uint32_t timescale = 90000;
    uint32_t delta = static_cast<uint32_t>(timescale / fps_ + 0.5);
    uint32_t dur = n * delta;

    auto box = [this](const char t[4], const std::vector<uint8_t>& body) {
      W32be(f_, static_cast<uint32_t>(body.size() + 8));
      Wtag(f_, t);
      fwrite(body.data(), 1, body.size(), f_);
    };
    auto be32 = [](std::vector<uint8_t>* v, uint32_t x) {
      v->push_back(x >> 24); v->push_back((x >> 16) & 0xff);
      v->push_back((x >> 8) & 0xff); v->push_back(x & 0xff);
    };
    auto be16 = [](std::vector<uint8_t>* v, uint16_t x) {
      v->push_back(x >> 8); v->push_back(x & 0xff);
    };
    auto tag = [](std::vector<uint8_t>* v, const char t[4]) {
      v->insert(v->end(), t, t + 4);
    };
    auto sub = [&be32, &tag](std::vector<uint8_t>* v, const char t[4],
                             const std::vector<uint8_t>& body) {
      be32(v, static_cast<uint32_t>(body.size() + 8));
      tag(v, t);
      v->insert(v->end(), body.begin(), body.end());
    };

    // ---- stsd: mp4v sample entry + esds (OTI 0x6C = JPEG) ----
    std::vector<uint8_t> esds = {0, 0, 0, 0};  // version/flags
    {
      // ES_Descriptor(3){ES_ID, flags, DecoderConfig(4){OTI 0x6C,
      // streamType video, bufsize, bitrates}, SLConfig(6){2}}
      std::vector<uint8_t> dcd = {0x6c, 0x11};  // OTI, streamType=4<<2|1
      for (int i = 0; i < 3; ++i) dcd.push_back(0);       // bufferSizeDB
      for (int i = 0; i < 8; ++i) dcd.push_back(0);       // bitrates
      std::vector<uint8_t> esd = {0, 0, 0};  // ES_ID=0, flags
      esd.push_back(0x04);
      esd.push_back(static_cast<uint8_t>(dcd.size()));
      esd.insert(esd.end(), dcd.begin(), dcd.end());
      esd.push_back(0x06); esd.push_back(1); esd.push_back(0x02);
      esds.push_back(0x03);
      esds.push_back(static_cast<uint8_t>(esd.size()));
      esds.insert(esds.end(), esd.begin(), esd.end());
    }
    std::vector<uint8_t> mp4v;
    for (int i = 0; i < 6; ++i) mp4v.push_back(0);  // reserved
    be16(&mp4v, 1);                                  // data_reference_index
    for (int i = 0; i < 16; ++i) mp4v.push_back(0);  // predefined/reserved
    be16(&mp4v, static_cast<uint16_t>(w_));
    be16(&mp4v, static_cast<uint16_t>(h_));
    be32(&mp4v, 0x00480000); be32(&mp4v, 0x00480000);  // 72 dpi
    be32(&mp4v, 0);
    be16(&mp4v, 1);                                  // frame count
    for (int i = 0; i < 32; ++i) mp4v.push_back(0);  // compressor name
    be16(&mp4v, 24);                                 // depth
    be16(&mp4v, 0xffff);                             // predefined
    sub(&mp4v, "esds", esds);
    std::vector<uint8_t> stsd = {0, 0, 0, 0};
    be32(&stsd, 1);
    sub(&stsd, "mp4v", mp4v);

    std::vector<uint8_t> stts = {0, 0, 0, 0};
    be32(&stts, 1); be32(&stts, n); be32(&stts, delta);
    std::vector<uint8_t> stsc = {0, 0, 0, 0};
    be32(&stsc, 1); be32(&stsc, 1); be32(&stsc, 1); be32(&stsc, 1);
    std::vector<uint8_t> stsz = {0, 0, 0, 0};
    be32(&stsz, 0); be32(&stsz, n);
    for (uint32_t s : sizes_) be32(&stsz, s);
    std::vector<uint8_t> stco = {0, 0, 0, 0};
    be32(&stco, n);
    for (uint32_t o : offsets_) be32(&stco, o);

    std::vector<uint8_t> stbl;
    sub(&stbl, "stsd", stsd);
    sub(&stbl, "stts", stts);
    sub(&stbl, "stsc", stsc);
    sub(&stbl, "stsz", stsz);
    sub(&stbl, "stco", stco);

    std::vector<uint8_t> url = {0, 0, 0, 1};  // self-contained flag
    std::vector<uint8_t> dref = {0, 0, 0, 0};
    be32(&dref, 1);
    sub(&dref, "url ", url);
    std::vector<uint8_t> dinf;
    sub(&dinf, "dref", dref);
    std::vector<uint8_t> vmhd = {0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0};
    std::vector<uint8_t> minf;
    sub(&minf, "vmhd", vmhd);
    sub(&minf, "dinf", dinf);
    sub(&minf, "stbl", stbl);

    std::vector<uint8_t> mdhd = {0, 0, 0, 0};
    be32(&mdhd, 0); be32(&mdhd, 0);
    be32(&mdhd, timescale); be32(&mdhd, dur);
    be16(&mdhd, 0x55c4);  // language "und"
    be16(&mdhd, 0);
    std::vector<uint8_t> hdlr = {0, 0, 0, 0, 0, 0, 0, 0};
    tag(&hdlr, "vide");
    for (int i = 0; i < 12; ++i) hdlr.push_back(0);
    const char* name = "VideoHandler";
    hdlr.insert(hdlr.end(), name, name + strlen(name) + 1);
    std::vector<uint8_t> mdia;
    sub(&mdia, "mdhd", mdhd);
    sub(&mdia, "hdlr", hdlr);
    sub(&mdia, "minf", minf);

    std::vector<uint8_t> tkhd = {0, 0, 0, 7};  // enabled|in movie|in preview
    be32(&tkhd, 0); be32(&tkhd, 0);
    be32(&tkhd, 1);  // track id
    be32(&tkhd, 0); be32(&tkhd, dur);
    for (int i = 0; i < 8; ++i) tkhd.push_back(0);
    be16(&tkhd, 0); be16(&tkhd, 0); be16(&tkhd, 0); be16(&tkhd, 0);
    // identity matrix
    be32(&tkhd, 0x00010000); be32(&tkhd, 0); be32(&tkhd, 0);
    be32(&tkhd, 0); be32(&tkhd, 0x00010000); be32(&tkhd, 0);
    be32(&tkhd, 0); be32(&tkhd, 0); be32(&tkhd, 0x40000000);
    be32(&tkhd, static_cast<uint32_t>(w_) << 16);
    be32(&tkhd, static_cast<uint32_t>(h_) << 16);
    std::vector<uint8_t> trak;
    sub(&trak, "tkhd", tkhd);
    sub(&trak, "mdia", mdia);

    std::vector<uint8_t> mvhd = {0, 0, 0, 0};
    be32(&mvhd, 0); be32(&mvhd, 0);
    be32(&mvhd, timescale); be32(&mvhd, dur);
    be32(&mvhd, 0x00010000);  // rate
    be16(&mvhd, 0x0100);      // volume
    be16(&mvhd, 0);
    be32(&mvhd, 0); be32(&mvhd, 0);
    be32(&mvhd, 0x00010000); be32(&mvhd, 0); be32(&mvhd, 0);
    be32(&mvhd, 0); be32(&mvhd, 0x00010000); be32(&mvhd, 0);
    be32(&mvhd, 0); be32(&mvhd, 0); be32(&mvhd, 0x40000000);
    for (int i = 0; i < 6; ++i) be32(&mvhd, 0);
    be32(&mvhd, 2);  // next track id

    std::vector<uint8_t> moov;
    sub(&moov, "mvhd", mvhd);
    sub(&moov, "trak", trak);
    box("moov", moov);

    fseek(f_, mdat_size_pos_, SEEK_SET);
    W32be(f_, static_cast<uint32_t>(mdat_end - mdat_size_pos_));
    fclose(f_);
    f_ = nullptr;
  }

 private:
  FILE* f_ = nullptr;
  int w_ = 0, h_ = 0;
  double fps_ = 30;
  long mdat_size_pos_ = 0;
  std::vector<uint32_t> offsets_, sizes_;
};

// ---------------------------------------------------------------------------
// VideoSink: queue + encoder/writer thread.
// ---------------------------------------------------------------------------
struct VFrame {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
};

class VideoSink {
 public:
  VideoSink(const char* path, int w, int h, double fps, int quality,
            int container)
      : w_(w), h_(h), quality_(quality), is_mp4_(container == 1) {
    ok_ = is_mp4_ ? mp4_.Open(path, w, h, fps) : avi_.Open(path, w, h, fps);
    if (ok_) writer_ = std::thread([this] { Run(); });
  }

  ~VideoSink() { Close(); }

  bool ok() const { return ok_; }

  int Push(const uint8_t* rgb, int w, int h) {
    if (!ok_ || w != w_ || h != h_) return 1;
    std::lock_guard<std::mutex> lk(mu_);
    if (q_.size() >= 8) { ++dropped_; return 1; }
    VFrame fr;
    fr.rgb.assign(rgb, rgb + static_cast<size_t>(w) * h * 3);
    fr.w = w; fr.h = h;
    q_.push(std::move(fr));
    cv_.notify_one();
    return 0;
  }

  void Close() {
    if (closed_) return;
    {
      std::lock_guard<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_.notify_all();
    if (writer_.joinable()) writer_.join();
    if (ok_) {
      if (is_mp4_) mp4_.Close(); else avi_.Close();
    }
    closed_ = true;
  }

  uint64_t frames() const { return frames_; }
  uint64_t dropped() const { return dropped_; }

 private:
  void Run() {
    std::vector<uint8_t> jpeg;
    for (;;) {
      VFrame fr;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return done_ || !q_.empty(); });
        if (q_.empty()) {
          if (done_) return;
          continue;
        }
        fr = std::move(q_.front());
        q_.pop();
      }
      EncodeJpeg(fr.rgb.data(), fr.w, fr.h, quality_, &jpeg);
      if (is_mp4_) mp4_.AddFrame(jpeg); else avi_.AddFrame(jpeg);
      ++frames_;
    }
  }

  int w_, h_, quality_;
  bool is_mp4_, ok_ = false, closed_ = false;
  AviMuxer avi_;
  Mp4Muxer mp4_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<VFrame> q_;
  bool done_ = false;
  std::thread writer_;
  std::atomic<uint64_t> frames_{0}, dropped_{0};
};

}  // namespace

extern "C" {

void* videosink_create(const char* path, int w, int h, double fps,
                       int quality, int container) {
  auto* s = new VideoSink(path, w, h, fps, quality, container);
  if (!s->ok()) { delete s; return nullptr; }
  return s;
}

int videosink_push(void* sink, const uint8_t* rgb, int w, int h) {
  return static_cast<VideoSink*>(sink)->Push(rgb, w, h);
}

void videosink_close(void* sink) {
  auto* s = static_cast<VideoSink*>(sink);
  s->Close();
  delete s;
}

uint64_t videosink_frames(void* sink) {
  return static_cast<VideoSink*>(sink)->frames();
}

uint64_t videosink_dropped(void* sink) {
  return static_cast<VideoSink*>(sink)->dropped();
}

// Synchronous JPEG encode to a file - used by tests.
int videosink_write_jpeg(const char* path, const uint8_t* rgb, int w, int h,
                         int quality) {
  std::vector<uint8_t> jpeg;
  EncodeJpeg(rgb, w, h, quality, &jpeg);
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  fwrite(jpeg.data(), 1, jpeg.size(), f);
  fclose(f);
  return 0;
}

}  // extern "C"
