// tsnative — native data-path kernels for temporalstereo_tpu.
//
// TPU-native counterpart of the runtime-side native code the reference keeps
// in CUDA/CuPy (SURVEY §2.9): here the host-side hot path is the *input
// pipeline* (the TPU owns all model math), so the native layer accelerates
// image decode/resize/normalize work that would otherwise bottleneck
// Python/PIL during multi-host training.
//
// Exposed C ABI (loaded from Python via ctypes, see
// temporalstereo_tpu/data/native.py):
//   ts_decode_pfm      — PFM header parse + endian fix + vertical flip
//   ts_resize_bilinear — align-corners bilinear resize, HWC float32
//   ts_normalize       — (x - mean) / std, in place, channels-last
//   ts_crop            — HWC crop
//   ts_color_jitter    — brightness/contrast/saturation/gamma photometric aug
//
// Build: make -C native   (produces libtsnative.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- PFM ----

// Parse a PFM buffer. Returns 0 on success. Writes H, W, C and fills `out`
// (size h*w*c floats, row 0 = top). `out` may be null to query dims only.
int ts_decode_pfm(const uint8_t* buf, int64_t len, int* out_h, int* out_w,
                  int* out_c, float* out) {
  if (len < 3) return -1;
  int color;
  if (buf[0] == 'P' && buf[1] == 'F') color = 1;
  else if (buf[0] == 'P' && buf[1] == 'f') color = 0;
  else return -2;

  // read three whitespace-separated tokens: width, height, scale
  int64_t pos = 2;
  auto skip_ws = [&]() {
    while (pos < len && (buf[pos] == ' ' || buf[pos] == '\n' ||
                         buf[pos] == '\r' || buf[pos] == '\t'))
      pos++;
  };
  auto read_token = [&](char* tok, int cap) -> bool {
    skip_ws();
    int i = 0;
    while (pos < len && i < cap - 1 && buf[pos] != ' ' && buf[pos] != '\n' &&
           buf[pos] != '\r' && buf[pos] != '\t')
      tok[i++] = (char)buf[pos++];
    tok[i] = 0;
    return i > 0;
  };
  char t1[64], t2[64], t3[64];
  if (!read_token(t1, 64) || !read_token(t2, 64) || !read_token(t3, 64))
    return -3;
  int w = atoi(t1), h = atoi(t2);
  double scale = atof(t3);
  if (w <= 0 || h <= 0) return -4;
  // exactly one whitespace char after the scale line
  pos++;

  int c = color ? 3 : 1;
  *out_h = h;
  *out_w = w;
  *out_c = c;
  if (!out) return 0;

  int64_t n = (int64_t)h * w * c;
  if (pos + n * 4 > len) return -5;
  const uint8_t* data = buf + pos;
  bool little = scale < 0;
  // PFM rows are bottom-up: flip vertically while copying
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = data + (int64_t)(h - 1 - y) * w * c * 4;
    float* dst = out + (int64_t)y * w * c;
    if (little) {
      memcpy(dst, src, (size_t)w * c * 4);
    } else {
      for (int i = 0; i < w * c; ++i) {
        uint8_t b0 = src[i * 4], b1 = src[i * 4 + 1], b2 = src[i * 4 + 2],
                b3 = src[i * 4 + 3];
        uint8_t swapped[4] = {b3, b2, b1, b0};
        memcpy(dst + i, swapped, 4);
      }
    }
  }
  return 0;
}

// ------------------------------------------------------------- resize ----

// Align-corners bilinear resize of [H, W, C] float32 -> [OH, OW, C].
void ts_resize_bilinear(const float* in, int h, int w, int c, float* out,
                        int oh, int ow) {
  const double sy = oh > 1 ? (double)(h - 1) / (oh - 1) : 0.0;
  const double sx = ow > 1 ? (double)(w - 1) / (ow - 1) : 0.0;

  std::vector<int> x0(ow);
  std::vector<float> fx(ow);
  for (int x = 0; x < ow; ++x) {
    double src = x * sx;
    int lo = (int)src;
    if (lo > w - 2) lo = w - 2 < 0 ? 0 : w - 2;
    x0[x] = lo;
    fx[x] = (float)(src - lo);
  }

  int nthreads = (int)std::min<int64_t>(std::thread::hardware_concurrency(),
                                        (int64_t)oh);
  if (nthreads < 1) nthreads = 1;
  auto work = [&](int y_begin, int y_end) {
    for (int y = y_begin; y < y_end; ++y) {
      double src = y * sy;
      int y0 = (int)src;
      if (y0 > h - 2) y0 = h - 2 < 0 ? 0 : h - 2;
      float wy = (float)(src - y0);
      const float* r0 = in + (int64_t)y0 * w * c;
      const float* r1 = in + (int64_t)std::min(y0 + 1, h - 1) * w * c;
      float* dst = out + (int64_t)y * ow * c;
      for (int x = 0; x < ow; ++x) {
        const float* a = r0 + (int64_t)x0[x] * c;
        const float* b = r0 + (int64_t)std::min(x0[x] + 1, w - 1) * c;
        const float* d = r1 + (int64_t)x0[x] * c;
        const float* e = r1 + (int64_t)std::min(x0[x] + 1, w - 1) * c;
        float wx = fx[x];
        for (int ch = 0; ch < c; ++ch) {
          float top = a[ch] * (1 - wx) + b[ch] * wx;
          float bot = d[ch] * (1 - wx) + e[ch] * wx;
          dst[(int64_t)x * c + ch] = top * (1 - wy) + bot * wy;
        }
      }
    }
  };
  if (nthreads == 1) {
    work(0, oh);
  } else {
    std::vector<std::thread> threads;
    int chunk = (oh + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
      int b = t * chunk, e = std::min(oh, b + chunk);
      if (b < e) threads.emplace_back(work, b, e);
    }
    for (auto& th : threads) th.join();
  }
}

// ---------------------------------------------------------- normalize ----

void ts_normalize(float* data, int64_t n_pixels, int c, const float* mean,
                  const float* std_) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    float* p = data + i * c;
    for (int ch = 0; ch < c; ++ch) p[ch] = (p[ch] - mean[ch]) / std_[ch];
  }
}

// --------------------------------------------------------------- crop ----

void ts_crop(const float* in, int h, int w, int c, int y, int x, int ch_,
             int cw, float* out) {
  (void)h;
  for (int row = 0; row < ch_; ++row) {
    memcpy(out + (int64_t)row * cw * c,
           in + ((int64_t)(y + row) * w + x) * c, (size_t)cw * c * 4);
  }
}

// ------------------------------------------------------- color jitter ----

// Photometric aug matching transforms.color_jitter: brightness, contrast,
// saturation (channel mix towards gray), gamma. All factors precomputed by
// the caller so Python keeps RNG control.
void ts_color_jitter(float* img, int64_t n_pixels, int c, float brightness,
                     float contrast, float saturation, float gamma) {
  // pass 1: mean for contrast
  double sum = 0.0;
  int64_t n = n_pixels * c;
  for (int64_t i = 0; i < n; ++i) sum += img[i] * brightness;
  float mean = (float)(sum / n);
  for (int64_t i = 0; i < n_pixels; ++i) {
    float* p = img + i * c;
    float gray = 0.f;
    for (int ch = 0; ch < c; ++ch) {
      p[ch] = (p[ch] * brightness - mean) * contrast + mean;
      gray += p[ch];
    }
    gray /= c;
    for (int ch = 0; ch < c; ++ch) {
      float v = gray + (p[ch] - gray) * saturation;
      v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
      p[ch] = powf(v, gamma);
    }
  }
}

}  // extern "C"
