// Native dataset loader: PNG decode + Lanczos-3 downscale to fp32 RGBA.
//
// The reference's data layer decodes RGBA PNGs with PIL and LANCZOS-resizes
// them at startup (reference: src/dataset.py:54-63). This module is the
// framework's native-runtime equivalent: a self-contained PNG reader
// (8-bit gray/RGB/palette/alpha, non-interlaced — the NeRF-Synthetic and
// D-NeRF formats) on top of system zlib, plus a separable Lanczos-3
// resampler matching PIL's filter, exposed through a C ABI consumed via
// ctypes (no pybind11 in this environment).
//
// Build: g++ -O2 -fPIC -shared -o libnerf_loader.so loader.cpp -lz

#include <zlib.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Image {
  uint32_t w = 0, h = 0;
  std::vector<uint8_t> rgba;  // w*h*4
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode a PNG byte buffer into RGBA8. Returns false on unsupported input.
bool decode_png(const uint8_t* data, size_t len, Image* out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || std::memcmp(data, kSig, 8) != 0) return false;

  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;      // 3 * n
  std::vector<uint8_t> trans;        // palette alpha

  size_t pos = 8;
  while (pos + 8 <= len) {
    uint32_t clen = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + clen > len) return false;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (clen < 13) return false;
      w = be32(body);
      h = be32(body + 4);
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(body, body + clen);
    } else if (!std::memcmp(type, "tRNS", 4)) {
      trans.assign(body, body + clen);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), body, body + clen);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (!w || !h || bit_depth != 8 || interlace != 0) return false;

  int ch;  // source channels
  switch (color_type) {
    case 0: ch = 1; break;  // gray
    case 2: ch = 3; break;  // rgb
    case 3: ch = 1; break;  // palette
    case 4: ch = 2; break;  // gray+alpha
    case 6: ch = 4; break;  // rgba
    default: return false;
  }

  const size_t stride = size_t(w) * ch;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return false;
  }

  // Undo per-scanline filters in place.
  std::vector<uint8_t> img(stride * h);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    uint8_t* dst = img.data() + y * stride;
    const uint8_t* up = y ? img.data() + (y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(ch) ? dst[x - ch] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(ch)) ? up[x - ch] : 0;
      int v = src[1 + x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
  }

  out->w = w;
  out->h = h;
  out->rgba.resize(size_t(w) * h * 4);
  for (size_t i = 0; i < size_t(w) * h; ++i) {
    const uint8_t* s = img.data() + i * ch;
    uint8_t* d = out->rgba.data() + i * 4;
    switch (color_type) {
      case 0: d[0] = d[1] = d[2] = s[0]; d[3] = 255; break;
      case 2: d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; d[3] = 255; break;
      case 3: {
        size_t pi = size_t(s[0]) * 3;
        if (pi + 2 >= palette.size()) return false;
        d[0] = palette[pi]; d[1] = palette[pi + 1]; d[2] = palette[pi + 2];
        d[3] = s[0] < trans.size() ? trans[s[0]] : 255;
        break;
      }
      case 4: d[0] = d[1] = d[2] = s[0]; d[3] = s[1]; break;
      case 6: d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; d[3] = s[3]; break;
    }
  }
  return true;
}

double lanczos3(double x) {
  x = std::fabs(x);
  if (x >= 3.0) return 0.0;
  if (x < 1e-12) return 1.0;
  double pix = M_PI * x;
  return 3.0 * std::sin(pix) * std::sin(pix / 3.0) / (pix * pix);
}

// Separable Lanczos-3 resample of interleaved fp32 data (PIL-compatible
// support scaling for downscales).
void resample_axis(const float* src, int n_src, int n_other, int channels,
                   int src_stride, int other_stride, float* dst, int n_dst) {
  double scale = double(n_src) / n_dst;
  double support = scale > 1.0 ? 3.0 * scale : 3.0;
  std::vector<double> weights;
  for (int o = 0; o < n_other; ++o) {
    for (int d = 0; d < n_dst; ++d) {
      double center = (d + 0.5) * scale;
      int lo = std::max(0, int(std::floor(center - support)));
      int hi = std::min(n_src - 1, int(std::ceil(center + support)));
      double acc[4] = {0, 0, 0, 0}, wsum = 0.0;
      for (int s = lo; s <= hi; ++s) {
        double wgt = lanczos3((s + 0.5 - center) / (scale > 1.0 ? scale : 1.0));
        if (wgt == 0.0) continue;
        wsum += wgt;
        const float* sp = src + size_t(s) * src_stride +
                          size_t(o) * other_stride;
        for (int c = 0; c < channels; ++c) acc[c] += wgt * sp[c];
      }
      float* outp = dst + (size_t(d) * n_other + o) * channels;
      for (int c = 0; c < channels; ++c)
        outp[c] = float(wsum != 0.0 ? acc[c] / wsum : 0.0);
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success. Decodes `path`, optionally integer-downscales by
// `downscale` (Lanczos-3, matching the reference's PIL LANCZOS), and writes
// fp32 RGBA in [0,1] to `out` (size out_w*out_h*4). Query dims first with
// nerf_png_dims.
int nerf_png_dims(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, f) != size_t(len)) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);
  if (len < 33) return 1;
  // Validate the 8-byte PNG signature and that the first chunk is IHDR
  // before trusting the fixed-offset width/height fields: garbage dims from
  // a corrupt file would otherwise propagate into a huge host allocation.
  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A,
                                  '\n'};
  if (std::memcmp(buf.data(), kSig, 8) != 0) return 1;
  if (std::memcmp(buf.data() + 12, "IHDR", 4) != 0) return 1;
  uint32_t w32 = be32(buf.data() + 16), h32 = be32(buf.data() + 20);
  // PNG spec caps dims at 2^31-1; anything above 1<<24 is not a real image.
  if (w32 == 0 || h32 == 0 || w32 > (1u << 24) || h32 > (1u << 24)) return 1;
  *w = int(w32);
  *h = int(h32);
  return 0;
}

int nerf_load_png_rgba_f32(const char* path, int downscale, float* out,
                           int out_capacity_floats) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (std::fread(buf.data(), 1, len, f) != size_t(len)) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);

  Image img;
  if (!decode_png(buf.data(), buf.size(), &img)) return 2;

  if (downscale < 1) downscale = 1;
  int ow = img.w / downscale, oh = img.h / downscale;
  if (out_capacity_floats < ow * oh * 4) return 3;

  std::vector<float> full(size_t(img.w) * img.h * 4);
  for (size_t i = 0; i < full.size(); ++i)
    full[i] = img.rgba[i] / 255.0f;

  if (downscale == 1) {
    std::memcpy(out, full.data(), full.size() * sizeof(float));
    return 0;
  }

  // Horizontal pass: [h, w, 4] -> transposed-out [ow, h, 4].
  std::vector<float> tmp(size_t(ow) * img.h * 4);
  resample_axis(full.data(), img.w, img.h, 4, 4, size_t(img.w) * 4,
                tmp.data(), ow);
  // Vertical pass on the transposed buffer: [ow, h, 4] -> [oh, ow, 4].
  std::vector<float> tmp2(size_t(oh) * ow * 4);
  resample_axis(tmp.data(), img.h, ow, 4, 4, size_t(img.h) * 4,
                tmp2.data(), oh);
  // tmp2 layout from the second pass is [oh, ow, 4] already.
  std::memcpy(out, tmp2.data(), tmp2.size() * sizeof(float));
  return 0;
}

}  // extern "C"
