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
//   ts_color_jitter    — torchvision-exact photometric aug (random-order
//                        brightness/contrast/saturation/HSV-hue + gamma)
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

#include <zlib.h>

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

static inline float ts_clip01(float v) {
  return v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
}

// torchvision-exact photometric aug on [n_pixels, 3] RGB float32 in [0,1],
// IN PLACE — the native mirror of data/transforms.py color_jitter
// (reference base.py:73-97 semantics):
//   * the four adjustments run in the CALLER-SUPPLIED order (Python keeps
//     RNG control: factors + torch-style random op permutation drawn there)
//   * op 0 brightness   clip(x * fb)
//   * op 1 contrast     blend with the scalar mean of the ITU-R 601-2
//                       grayscale: clip(fc*x + (1-fc)*mean(gray))
//   * op 2 saturation   blend with per-pixel grayscale
//   * op 3 hue          true HSV rotation by fh (branch structure mirrors
//                       the numpy _rgb_to_hsv/_hsv_to_rgb pair exactly,
//                       including tie-breaks and the floored mod)
//   * then gamma        clip(clip(x)^fgamma)
void ts_color_jitter(float* img, int64_t n_pixels, const int32_t* order,
                     int n_ops, float fb, float fc, float fs, float fh,
                     float fgamma) {
  const int64_t n = n_pixels * 3;
  for (int oi = 0; oi < n_ops; ++oi) {
    switch (order[oi]) {
      case 0: {  // brightness
        for (int64_t i = 0; i < n; ++i) img[i] = ts_clip01(img[i] * fb);
        break;
      }
      case 1: {  // contrast: blend with mean grayscale
        double sum = 0.0;
        for (int64_t i = 0; i < n_pixels; ++i) {
          const float* p = img + i * 3;
          sum += 0.2989f * p[0] + 0.587f * p[1] + 0.114f * p[2];
        }
        const float bg = (1.f - fc) * (float)(sum / (double)n_pixels);
        for (int64_t i = 0; i < n; ++i) img[i] = ts_clip01(fc * img[i] + bg);
        break;
      }
      case 2: {  // saturation: blend with per-pixel grayscale
        for (int64_t i = 0; i < n_pixels; ++i) {
          float* p = img + i * 3;
          const float bg =
              (1.f - fs) * (0.2989f * p[0] + 0.587f * p[1] + 0.114f * p[2]);
          p[0] = ts_clip01(fs * p[0] + bg);
          p[1] = ts_clip01(fs * p[1] + bg);
          p[2] = ts_clip01(fs * p[2] + bg);
        }
        break;
      }
      default: {  // hue rotation in HSV
        for (int64_t i = 0; i < n_pixels; ++i) {
          float* p = img + i * 3;
          const float r = p[0], g = p[1], b = p[2];
          const float maxc = std::max(r, std::max(g, b));
          const float minc = std::min(r, std::min(g, b));
          const float v = maxc, delta = maxc - minc;
          const float s = maxc > 0.f ? delta / std::max(maxc, 1e-12f) : 0.f;
          const float safe = std::max(delta, 1e-12f);
          float h;
          if (maxc == r) h = (g - b) / safe;          // first-match order =
          else if (maxc == g) h = 2.f + (b - r) / safe;  // numpy np.where
          else h = 4.f + (r - g) / safe;
          if (delta > 0.f) {
            h = fmodf(h / 6.f, 1.f);
            if (h < 0.f) h += 1.f;                    // floored mod
          } else {
            h = 0.f;
          }
          h = fmodf(h + fh, 1.f);
          if (h < 0.f) h += 1.f;
          const float h6 = h * 6.f;
          const float ns[3] = {5.f, 3.f, 1.f};
          for (int ch = 0; ch < 3; ++ch) {
            float k = fmodf(ns[ch] + h6, 6.f);
            float t = std::min(k, 4.f - k);
            t = t < 0.f ? 0.f : (t > 1.f ? 1.f : t);
            p[ch] = v * (1.f - s * t);
          }
        }
        break;
      }
    }
  }
  for (int64_t i = 0; i < n; ++i)
    img[i] = ts_clip01(powf(ts_clip01(img[i]), fgamma));
}

// ---------------------------------------------------------------- PNG ----

static inline uint32_t ts_be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

static inline int ts_paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a non-interlaced 8/16-bit gray / gray+alpha / RGB / RGBA PNG
// (color types 0, 2, 4, 6 — covers KITTI uint16 disparity/depth and RGB
// images; palette/interlaced fall back to PIL on the Python side).
// Two-call protocol like ts_decode_pfm: out==null queries dims.
// Output: h*w*c native-endian samples, uint8 (bitdepth 8) or uint16 (16).
// Returns 0 on success, negative codes on unsupported/corrupt input.
int ts_decode_png(const uint8_t* buf, int64_t len, int* out_h, int* out_w,
                  int* out_c, int* out_bitdepth, void* out) {
  static const uint8_t SIG[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 + 25 || memcmp(buf, SIG, 8) != 0) return -1;
  int64_t pos = 8;

  // IHDR must be first
  if (ts_be32(buf + pos) != 13 || memcmp(buf + pos + 4, "IHDR", 4) != 0)
    return -2;
  const uint8_t* ih = buf + pos + 8;
  uint32_t w = ts_be32(ih), h = ts_be32(ih + 4);
  int bitdepth = ih[8], color = ih[9];
  int compression = ih[10], filter = ih[11], interlace = ih[12];
  if (w == 0 || h == 0 || compression != 0 || filter != 0 || interlace != 0)
    return -3;
  int c;
  switch (color) {
    case 0: c = 1; break;   // gray
    case 2: c = 3; break;   // rgb
    case 4: c = 2; break;   // gray+alpha
    case 6: c = 4; break;   // rgba
    default: return -4;     // palette (3) unsupported
  }
  if (bitdepth != 8 && bitdepth != 16) return -4;
  *out_h = (int)h;
  *out_w = (int)w;
  *out_c = c;
  *out_bitdepth = bitdepth;
  if (!out) return 0;

  // concatenate IDAT payloads
  std::vector<const uint8_t*> spans;
  std::vector<uint32_t> span_lens;
  int64_t idat_total = 0;
  pos += 8 + 13 + 4;
  while (pos + 12 <= len) {
    uint32_t clen = ts_be32(buf + pos);
    const uint8_t* ctype = buf + pos + 4;
    if ((int64_t)clen > len - pos - 12) return -5;
    if (memcmp(ctype, "IDAT", 4) == 0) {
      spans.push_back(buf + pos + 8);
      span_lens.push_back(clen);
      idat_total += clen;
    } else if (memcmp(ctype, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  if (idat_total == 0) return -5;

  const int bpp = c * (bitdepth / 8);           // filter unit, bytes
  const int64_t stride = (int64_t)w * bpp;      // raw row bytes
  std::vector<uint8_t> raw((stride + 1) * h);

  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -6;
  zs.next_out = raw.data();
  zs.avail_out = (uInt)raw.size();
  int zrc = Z_OK;
  for (size_t i = 0; i < spans.size() && zrc != Z_STREAM_END; ++i) {
    zs.next_in = const_cast<uint8_t*>(spans[i]);
    zs.avail_in = span_lens[i];
    zrc = inflate(&zs, Z_NO_FLUSH);
    if (zrc != Z_OK && zrc != Z_STREAM_END) {
      inflateEnd(&zs);
      return -6;
    }
  }
  bool complete = zs.total_out == raw.size();
  inflateEnd(&zs);
  if (!complete) return -7;

  // unfilter in place; prev = reconstructed previous row
  uint8_t* dst8 = (uint8_t*)out;
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + (int64_t)y * (stride + 1);
    uint8_t ft = src[0];
    const uint8_t* in = src + 1;
    uint8_t* row = dst8 + (int64_t)y * stride;   // reconstruct into output
    switch (ft) {
      case 0:
        memcpy(row, in, stride);
        break;
      case 1:  // sub
        for (int64_t i = 0; i < stride; ++i)
          row[i] = (uint8_t)(in[i] + (i >= bpp ? row[i - bpp] : 0));
        break;
      case 2:  // up
        for (int64_t i = 0; i < stride; ++i)
          row[i] = (uint8_t)(in[i] + prev[i]);
        break;
      case 3:  // average
        for (int64_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? row[i - bpp] : 0;
          row[i] = (uint8_t)(in[i] + ((a + prev[i]) >> 1));
        }
        break;
      case 4:  // paeth
        for (int64_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? row[i - bpp] : 0;
          int cc = i >= bpp ? prev[i - bpp] : 0;
          row[i] = (uint8_t)(in[i] + ts_paeth(a, prev[i], cc));
        }
        break;
      default:
        return -8;
    }
    memcpy(prev.data(), row, stride);
  }

  // 16-bit samples are big-endian on the wire -> native uint16
  if (bitdepth == 16) {
    int64_t n = (int64_t)h * w * c;
    uint16_t* p16 = (uint16_t*)out;
    for (int64_t i = 0; i < n; ++i) {
      uint8_t hi = dst8[i * 2], lo = dst8[i * 2 + 1];
      p16[i] = (uint16_t)((hi << 8) | lo);
    }
  }
  return 0;
}

}  // extern "C"
