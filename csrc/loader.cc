// cnsn_tpu native data loader: threaded JPEG decode + resize + crop +
// normalize, producing float32 NHWC batches for the TPU host pipeline.
//
// The reference relies on torchvision/PIL python workers
// (imagenet.py:482-505); this is the framework's native-runtime
// equivalent: libjpeg decode and bilinear resampling in C++ with a
// std::thread fan-out, exposed through a C ABI consumed via ctypes
// (cnsn_tpu/data/native.py).
//
// Eval path:  shorter-side resize to `resize_to`, center crop `crop`.
// Train path: torchvision-style RandomResizedCrop(scale 0.08-1.0,
//             ratio 3/4-4/3, 10 attempts) + horizontal flip, driven by
//             a per-image xorshift64 seed for reproducibility.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC RGB
  int h = 0, w = 0;
};

bool decode_jpeg(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr c) { longjmp(*(jmp_buf*)c->client_data, 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Separable triangle-filter (bilinear) resampling with antialiasing on
// downsample — PIL Image.resize(BILINEAR) semantics: filter support is
// scaled by the shrink factor, weights normalized per output pixel.
struct Taps {
  std::vector<int> start;     // first source index per output index
  std::vector<int> count;     // taps per output index
  std::vector<float> weight;  // flattened [out][tap]
  int max_taps = 0;
};

Taps make_taps(int in0, int in_size, int out_size) {
  Taps t;
  const double scale = (double)in_size / out_size;
  const double ss = std::max(scale, 1.0);
  const double support = 1.0 * ss;  // triangle filter radius * shrink
  t.max_taps = (int)ceil(support) * 2 + 1;
  t.start.resize(out_size);
  t.count.resize(out_size);
  t.weight.resize((size_t)out_size * t.max_taps, 0.0f);
  for (int o = 0; o < out_size; ++o) {
    double center = (o + 0.5) * scale;
    int xmin = std::max(0, (int)(center - support + 0.5));
    int xmax = std::min(in_size, (int)(center + support + 0.5));
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double d = (x + 0.5 - center) / ss;
      double w = d < 0 ? (d > -1 ? 1 + d : 0) : (d < 1 ? 1 - d : 0);
      t.weight[(size_t)o * t.max_taps + (x - xmin)] = (float)w;
      total += w;
    }
    if (total > 0) {
      for (int k = 0; k < xmax - xmin; ++k)
        t.weight[(size_t)o * t.max_taps + k] /= (float)total;
    }
    t.start[o] = xmin + in0;
    t.count[o] = xmax - xmin;
  }
  return t;
}

// Resample subrect [y0, y0+sh) x [x0, x0+sw) of src into dst (dh x dw).
void resize_bilinear(const Image& src, int y0, int x0, int sh, int sw,
                     int dh, int dw, bool hflip, uint8_t* dst) {
  Taps tx = make_taps(x0, sw, dw);
  Taps ty = make_taps(y0, sh, dh);
  // horizontal pass: (sh, dw, 3) float
  std::vector<float> tmp((size_t)sh * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src.data.data() + ((size_t)(y + y0) * src.w) * 3;
    for (int o = 0; o < dw; ++o) {
      float acc[3] = {0, 0, 0};
      const float* w = tx.weight.data() + (size_t)o * tx.max_taps;
      for (int k = 0; k < tx.count[o]; ++k) {
        const uint8_t* p = row + (size_t)(tx.start[o] + k) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      float* q = tmp.data() + ((size_t)y * dw + o) * 3;
      q[0] = acc[0]; q[1] = acc[1]; q[2] = acc[2];
    }
  }
  // vertical pass
  for (int o = 0; o < dh; ++o) {
    const float* w = ty.weight.data() + (size_t)o * ty.max_taps;
    for (int x = 0; x < dw; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ty.count[o]; ++k) {
        const float* p = tmp.data()
            + ((size_t)(ty.start[o] + k - y0) * dw + x) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      int ox = hflip ? (dw - 1 - x) : x;
      uint8_t* q = dst + ((size_t)o * dw + ox) * 3;
      for (int c = 0; c < 3; ++c)
        q[c] = (uint8_t)std::clamp((int)lrintf(acc[c]), 0, 255);
    }
  }
}

void normalize_into(const uint8_t* rgb, int n, const float* mean,
                    const float* stdv, float* out) {
  for (int i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      out[i * 3 + c] = ((float)rgb[i * 3 + c] / 255.0f - mean[c]) / stdv[c];
    }
  }
}

struct XorShift64 {
  uint64_t s;
  explicit XorShift64(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  float uniform() { return (float)(next() >> 11) * (1.0f / 9007199254740992.0f); }
};

int eval_one(const char* path, int resize_to, int crop, const float* mean,
             const float* stdv, float* out) {
  Image img;
  if (!decode_jpeg(path, &img)) return 1;
  int nh, nw;
  if (img.w < img.h) {
    nw = resize_to;
    nh = (int)((int64_t)resize_to * img.h / img.w);
  } else {
    nh = resize_to;
    nw = (int)((int64_t)resize_to * img.w / img.h);
  }
  std::vector<uint8_t> resized((size_t)nh * nw * 3);
  resize_bilinear(img, 0, 0, img.h, img.w, nh, nw, false, resized.data());
  int top = (nh - crop) / 2, left = (nw - crop) / 2;
  std::vector<uint8_t> cropped((size_t)crop * crop * 3);
  for (int y = 0; y < crop; ++y) {
    memcpy(cropped.data() + (size_t)y * crop * 3,
           resized.data() + ((size_t)(y + top) * nw + left) * 3,
           (size_t)crop * 3);
  }
  normalize_into(cropped.data(), crop * crop, mean, stdv, out);
  return 0;
}

// geometry stage only (RandomResizedCrop + flip), raw uint8 pixels —
// feeds the on-device AugMix chain (cnsn_tpu/data/augmix_jax.py): the
// host stays a pure decode/resample worker and the host->device copy
// is 4x smaller than the normalized float path.
int train_geom_one(const char* path, int size, uint64_t seed,
                   uint8_t* out) {
  Image img;
  if (!decode_jpeg(path, &img)) return 1;
  XorShift64 rng(seed);
  const float area = (float)img.w * img.h;
  int y0 = 0, x0 = 0, ch = std::min(img.h, img.w), cw = ch;
  for (int attempt = 0; attempt < 10; ++attempt) {
    float target = area * (0.08f + rng.uniform() * 0.92f);
    float log_r = logf(3.0f / 4.0f) +
                  rng.uniform() * (logf(4.0f / 3.0f) - logf(3.0f / 4.0f));
    float aspect = expf(log_r);
    int w = (int)lrintf(sqrtf(target * aspect));
    int h = (int)lrintf(sqrtf(target / aspect));
    if (w > 0 && w <= img.w && h > 0 && h <= img.h) {
      y0 = (int)(rng.uniform() * (img.h - h + 1));
      x0 = (int)(rng.uniform() * (img.w - w + 1));
      y0 = std::min(y0, img.h - h);
      x0 = std::min(x0, img.w - w);
      ch = h;
      cw = w;
      break;
    }
    if (attempt == 9) {  // center-crop fallback
      ch = cw = std::min(img.h, img.w);
      y0 = (img.h - ch) / 2;
      x0 = (img.w - cw) / 2;
    }
  }
  bool hflip = rng.uniform() < 0.5f;
  resize_bilinear(img, y0, x0, ch, cw, size, size, hflip, out);
  return 0;
}

int train_one(const char* path, int size, const float* mean,
              const float* stdv, uint64_t seed, float* out) {
  std::vector<uint8_t> resized((size_t)size * size * 3);
  if (train_geom_one(path, size, seed, resized.data())) return 1;
  normalize_into(resized.data(), size * size, mean, stdv, out);
  return 0;
}

void parallel_for(int n, int threads, const std::function<void(int)>& fn) {
  threads = std::max(1, std::min(threads, n));
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

int cnsn_decode_eval_batch(const char** paths, int n, int resize_to,
                           int crop, const float* mean, const float* stdv,
                           float* out, int threads) {
  std::atomic<int> failures(0);
  parallel_for(n, threads, [&](int i) {
    if (eval_one(paths[i], resize_to, crop, mean, stdv,
                 out + (size_t)i * crop * crop * 3)) {
      failures.fetch_add(1);
    }
  });
  return failures.load();
}

int cnsn_decode_geom_batch(const char** paths, int n, int size,
                           const uint64_t* seeds, uint8_t* out,
                           int threads) {
  std::atomic<int> failures(0);
  parallel_for(n, threads, [&](int i) {
    if (train_geom_one(paths[i], size, seeds[i],
                       out + (size_t)i * size * size * 3)) {
      failures.fetch_add(1);
    }
  });
  return failures.load();
}

int cnsn_decode_train_batch(const char** paths, int n, int size,
                            const float* mean, const float* stdv,
                            const uint64_t* seeds, float* out, int threads) {
  std::atomic<int> failures(0);
  parallel_for(n, threads, [&](int i) {
    if (train_one(paths[i], size, mean, stdv, seeds[i],
                  out + (size_t)i * size * size * 3)) {
      failures.fetch_add(1);
    }
  });
  return failures.load();
}

}  // extern "C"
