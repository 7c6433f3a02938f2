// Native image-decode + resample runtime for the data pipeline.
//
// Replaces the hot part of the host input pipeline (JPEG decode + crop +
// resize; reference data/build.py:86-95 does this via PIL inside 32 torch
// worker processes). TPU-side reasoning: a v5e chip eats >1.5k images/sec
// from one host, so the host decode path must be native. Three tricks keep
// it fast:
//   1. libjpeg-turbo scaled decode (scale_num/8): DCT-domain downscale to
//      the smallest resolution that still covers the requested output, so
//      a 500x375 source for a 224 crop is decoded at ~1/2 scale.
//   2. jpeg_crop_scanline + jpeg_skip_scanlines: only the crop region's
//      scanlines are decoded (RandomResizedCrop averages ~55% of the area).
//   3. A PIL-equivalent separable resampler (Keys bicubic a=-0.5 /
//      triangle bilinear, antialias taps widened by the scale factor) so
//      train/eval numerics match the PIL fallback path to ~1 LSB.
//
// Pure C ABI (no pybind11 in this image); consumed via ctypes from
// ml_autofocusformermod_tpu/data/native_jpeg.py.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

void output_message(j_common_ptr) {}  // silence libjpeg warnings

// --- PIL-equivalent separable resampling -------------------------------
// Matches PIL's ImagingResample: tap centers at (i + 0.5) * scale + box0,
// kernel support widened by the scale factor when downscaling, weights
// normalized per output pixel.

double filter_bilinear(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

double filter_bicubic(double x) {  // Keys kernel, a = -0.5 (PIL BICUBIC)
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Taps {
  std::vector<int> bounds;     // (first, count) per output pixel
  std::vector<double> coeffs;  // ksize weights per output pixel
  int ksize = 0;
};

Taps precompute_taps(double box0, double box1, int out_size, int in_size,
                     int filter) {
  double support = filter == 1 ? 2.0 : 1.0;
  double (*kernel)(double) = filter == 1 ? filter_bicubic : filter_bilinear;
  double scale = (box1 - box0) / out_size;
  double filterscale = std::max(scale, 1.0);
  support *= filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  Taps t;
  t.ksize = ksize;
  t.bounds.resize(out_size * 2);
  t.coeffs.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int i = 0; i < out_size; i++) {
    double center = box0 + (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    xmin = std::max(xmin, 0);
    int xmax = static_cast<int>(center + support + 0.5);
    xmax = std::min(xmax, in_size);
    double* k = &t.coeffs[static_cast<size_t>(i) * ksize];
    double ww = 0.0;
    for (int x = xmin; x < xmax; x++) {
      double w = kernel((x + 0.5 - center) / filterscale);
      k[x - xmin] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax - xmin; x++) k[x] /= ww;
    t.bounds[i * 2] = xmin;
    t.bounds[i * 2 + 1] = std::max(xmax - xmin, 0);
  }
  return t;
}

inline uint8_t clip8(double v) {
  return static_cast<uint8_t>(std::min(std::max(v + 0.5, 0.0), 255.0));
}

// Resample (in_h, in_w, 3) uint8 -> (out_h, out_w, 3) uint8 over float box.
void resample(const uint8_t* in, int in_w, int in_h, double bx, double by,
              double bw, double bh, uint8_t* out, int out_w, int out_h,
              int filter, int flip) {
  Taps tx = precompute_taps(bx, bx + bw, out_w, in_w, filter);
  Taps ty = precompute_taps(by, by + bh, out_h, in_h, filter);

  // horizontal pass (full input height band is needed by the vertical pass)
  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int y = 0; y < in_h; y++) {
    const uint8_t* row = in + static_cast<size_t>(y) * in_w * 3;
    float* trow = &tmp[static_cast<size_t>(y) * out_w * 3];
    for (int i = 0; i < out_w; i++) {
      int x0 = tx.bounds[i * 2], cnt = tx.bounds[i * 2 + 1];
      const double* k = &tx.coeffs[static_cast<size_t>(i) * tx.ksize];
      double r = 0, g = 0, b = 0;
      for (int x = 0; x < cnt; x++) {
        const uint8_t* p = row + static_cast<size_t>(x0 + x) * 3;
        r += p[0] * k[x];
        g += p[1] * k[x];
        b += p[2] * k[x];
      }
      trow[i * 3] = static_cast<float>(r);
      trow[i * 3 + 1] = static_cast<float>(g);
      trow[i * 3 + 2] = static_cast<float>(b);
    }
  }
  // vertical pass + optional horizontal flip
  for (int j = 0; j < out_h; j++) {
    int y0 = ty.bounds[j * 2], cnt = ty.bounds[j * 2 + 1];
    const double* k = &ty.coeffs[static_cast<size_t>(j) * ty.ksize];
    uint8_t* orow = out + static_cast<size_t>(j) * out_w * 3;
    for (int i = 0; i < out_w; i++) {
      double r = 0, g = 0, b = 0;
      for (int y = 0; y < cnt; y++) {
        const float* p = &tmp[(static_cast<size_t>(y0 + y) * out_w + i) * 3];
        r += p[0] * k[y];
        g += p[1] * k[y];
        b += p[2] * k[y];
      }
      int oi = flip ? out_w - 1 - i : i;
      orow[oi * 3] = clip8(r);
      orow[oi * 3 + 1] = clip8(g);
      orow[oi * 3 + 2] = clip8(b);
    }
  }
}

}  // namespace

extern "C" {

int aff_version() { return 1; }

// Parse header only; returns 0 on success.
int aff_jpeg_dims(const uint8_t* buf, long n, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = output_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(n));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode `buf`, crop float box (bx, by, bw, bh) in ORIGINAL image coords,
// resample to (out_w, out_h) RGB uint8 into `out`. filter: 0 bilinear,
// 1 bicubic. flip: mirror horizontally. fast_scale enables DCT-domain
// downscale (training; ~1 LSB different from full decode on photos) —
// eval passes 0 for exact-parity full-resolution decode.
// Returns 0 on success.
int aff_jpeg_decode_resample(const uint8_t* buf, long n, double bx, double by,
                             double bw, double bh, int out_w, int out_h,
                             int flip, int filter, int fast_scale,
                             uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.output_message = output_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(n));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain downscale: smallest num/8 whose scaled crop still covers
  // the output (never decode-upscale; resampler handles the rest)
  double need = std::max(out_w / std::max(bw, 1.0),
                         out_h / std::max(bh, 1.0));
  int num = 8;
  if (fast_scale && need < 1.0)
    num = std::min(8, std::max(1, static_cast<int>(std::ceil(8.0 * need))));
  cinfo.scale_num = static_cast<unsigned int>(num);
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);

  const double sx = static_cast<double>(cinfo.output_width) /
                    static_cast<double>(cinfo.image_width);
  const double sy = static_cast<double>(cinfo.output_height) /
                    static_cast<double>(cinfo.image_height);
  const int sw = static_cast<int>(cinfo.output_width);
  const int sh = static_cast<int>(cinfo.output_height);
  // crop box in scaled coords, clamped
  double cbx = std::min(std::max(bx * sx, 0.0), static_cast<double>(sw));
  double cby = std::min(std::max(by * sy, 0.0), static_cast<double>(sh));
  double cbw = std::min(bw * sx, sw - cbx);
  double cbh = std::min(bh * sy, sh - cby);
  if (cbw <= 0 || cbh <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }

  // decode only the needed scanline band and horizontal strip, widened by
  // the resampler's tap support so border taps read the same pixels PIL's
  // whole-image resize would (taps extend beyond the crop box)
  const int mgx = static_cast<int>(
      std::ceil(2.0 * std::max(cbw / out_w, 1.0))) + 1;
  const int mgy = static_cast<int>(
      std::ceil(2.0 * std::max(cbh / out_h, 1.0))) + 1;
  JDIMENSION xoff = static_cast<JDIMENSION>(
      std::max(static_cast<int>(std::floor(cbx)) - mgx, 0));
  JDIMENSION xw = std::min<JDIMENSION>(
      static_cast<JDIMENSION>(std::ceil(cbx + cbw)) + mgx, sw) - xoff;
  xw = std::min<JDIMENSION>(std::max<JDIMENSION>(xw, 1), sw - xoff);
  jpeg_crop_scanline(&cinfo, &xoff, &xw);  // may widen to iMCU bounds
  int y0 = std::max(static_cast<int>(std::floor(cby)) - mgy, 0);
  int y1 = std::min(static_cast<int>(std::ceil(cby + cbh)) + mgy, sh);
  if (y0 > 0) jpeg_skip_scanlines(&cinfo, static_cast<JDIMENSION>(y0));

  const int band_h = y1 - y0;
  std::vector<uint8_t> band(static_cast<size_t>(band_h) * xw * 3);
  while (static_cast<int>(cinfo.output_scanline) < y1) {
    int row = static_cast<int>(cinfo.output_scanline) - y0;
    JSAMPROW rp = band.data() + static_cast<size_t>(row) * xw * 3;
    if (jpeg_read_scanlines(&cinfo, &rp, 1) != 1) break;
  }
  jpeg_abort_decompress(&cinfo);  // skip remaining scanlines cleanly
  jpeg_destroy_decompress(&cinfo);

  resample(band.data(), static_cast<int>(xw), band_h, cbx - xoff, cby - y0,
           cbw, cbh, out, out_w, out_h, filter, flip);
  return 0;
}

// Plain RGB-buffer resample (used for parity tests and non-JPEG sources).
int aff_resample_rgb(const uint8_t* in, int in_w, int in_h, double bx,
                     double by, double bw, double bh, int out_w, int out_h,
                     int flip, int filter, uint8_t* out) {
  if (bw <= 0 || bh <= 0 || in_w <= 0 || in_h <= 0) return 1;
  resample(in, in_w, in_h, bx, by, bw, bh, out, out_w, out_h, filter, flip);
  return 0;
}

}  // extern "C"
