// dove_host: native host-side runtime for the DOVE-TPU pipeline.
//
// The reference delegates its host hot loops to native pip dependencies
// (ffmpeg/decord decode, OpenCV resize, torch's C++ DataLoader core —
// SURVEY.md §2 notes the repo itself is pure Python). This library provides
// the framework's own native equivalents for the per-clip host work that
// brackets every TPU dispatch:
//
//   * bilinear x-scale pre-upscale (align_corners=false, half-pixel centers,
//     identical to torch F.interpolate / cv2 INTER_LINEAR), multithreaded
//     over frames;
//   * normalize [0,1] -> [-1,1] fused into the upscale write;
//   * exact-coverage tile stitching: trimmed valid-region writes plus the
//     write-count audit (reference invariant: inference_script.py:724-729).
//
// Built with plain g++ (see build.py); bound via ctypes with a NumPy
// fallback when the shared object is absent.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 1;
}

// Bilinear sample row/col weights for one output axis (half-pixel rule).
struct AxisMap {
  std::vector<int> lo, hi;
  std::vector<float> w_hi;
  AxisMap(int in, int out, float scale) {
    lo.resize(out);
    hi.resize(out);
    w_hi.resize(out);
    for (int o = 0; o < out; ++o) {
      float src = (o + 0.5f) / scale - 0.5f;
      if (src < 0) src = 0;
      if (src > in - 1) src = static_cast<float>(in - 1);
      int l = static_cast<int>(src);
      int h = l + 1 < in ? l + 1 : in - 1;
      lo[o] = l;
      hi[o] = h;
      w_hi[o] = src - static_cast<float>(l);
    }
  }
};

}  // namespace

extern "C" {

// in:  [F, H, W, C] float32 in [0, 1]
// out: [F, H*scale, W*scale, C] float32; when normalize != 0 the output is
//      mapped to [-1, 1] during the write (fused pre-processing).
void dove_upscale_bilinear_f32(const float* in, float* out, int64_t F,
                               int64_t H, int64_t W, int64_t C, int scale,
                               int normalize, int n_threads) {
  const int64_t OH = H * scale, OW = W * scale;
  AxisMap ym(static_cast<int>(H), static_cast<int>(OH),
             static_cast<float>(scale));
  AxisMap xm(static_cast<int>(W), static_cast<int>(OW),
             static_cast<float>(scale));
  if (n_threads <= 0) n_threads = hw_threads();

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t f = next.fetch_add(1);
      if (f >= F) return;
      const float* src = in + f * H * W * C;
      float* dst = out + f * OH * OW * C;
      for (int64_t oy = 0; oy < OH; ++oy) {
        const float wy = ym.w_hi[oy];
        const float* row_lo = src + static_cast<int64_t>(ym.lo[oy]) * W * C;
        const float* row_hi = src + static_cast<int64_t>(ym.hi[oy]) * W * C;
        float* orow = dst + oy * OW * C;
        for (int64_t ox = 0; ox < OW; ++ox) {
          const float wx = xm.w_hi[ox];
          const float* p00 = row_lo + static_cast<int64_t>(xm.lo[ox]) * C;
          const float* p01 = row_lo + static_cast<int64_t>(xm.hi[ox]) * C;
          const float* p10 = row_hi + static_cast<int64_t>(xm.lo[ox]) * C;
          const float* p11 = row_hi + static_cast<int64_t>(xm.hi[ox]) * C;
          float* op = orow + ox * C;
          for (int64_t c = 0; c < C; ++c) {
            float top = p00[c] + (p01[c] - p00[c]) * wx;
            float bot = p10[c] + (p11[c] - p10[c]) * wx;
            float v = top + (bot - top) * wy;
            op[c] = normalize ? v * 2.0f - 1.0f : v;
          }
        }
      }
    }
  };
  std::vector<std::thread> pool;
  int n = n_threads < static_cast<int>(F) ? n_threads : static_cast<int>(F);
  for (int t = 0; t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// Write a tile's trimmed valid region into the output volume and bump the
// coverage counter. Layout: out [C, F, H, W]; tile [f, h, w, C] (the device
// result layout, transposed during the copy). Returns 0 on success.
int dove_stitch_add_f32(float* out, uint8_t* count, const float* tile,
                        int64_t C, int64_t F, int64_t H, int64_t W,
                        int64_t tf, int64_t th, int64_t tw,
                        // valid region in tile coords [src0, src1) per axis
                        int64_t sf0, int64_t sf1, int64_t sh0, int64_t sh1,
                        int64_t sw0, int64_t sw1,
                        // destination offset in output coords
                        int64_t df, int64_t dh, int64_t dw) {
  if (sf1 > tf || sh1 > th || sw1 > tw) return 1;
  if (df + (sf1 - sf0) > F || dh + (sh1 - sh0) > H || dw + (sw1 - sw0) > W)
    return 2;
  for (int64_t f = sf0; f < sf1; ++f) {
    const int64_t of = df + (f - sf0);
    for (int64_t y = sh0; y < sh1; ++y) {
      const int64_t oy = dh + (y - sh0);
      const float* trow = tile + ((f * th + y) * tw + sw0) * C;
      uint8_t* crow = count + (of * H + oy) * W + dw;
      for (int64_t x = 0; x < sw1 - sw0; ++x) {
        const float* tp = trow + x * C;
        for (int64_t c = 0; c < C; ++c) {
          out[((c * F + of) * H + oy) * W + dw + x] = tp[c];
        }
        crow[x] += 1;
      }
    }
  }
  return 0;
}

// Coverage audit: returns 0 iff every cell was written exactly once.
int dove_stitch_check(const uint8_t* count, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    if (count[i] != 1) return count[i] == 0 ? 1 : 2;
  }
  return 0;
}

}  // extern "C"
