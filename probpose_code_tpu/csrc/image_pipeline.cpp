// Native host input-pipeline kernel: fused JPEG region decode + affine warp.
//
// Replaces the hottest host-side stages of the top-down training/serving
// input pipeline (reference: mmcv imread + ``cv2.warpAffine`` in
// ``mmpose/datasets/transforms/topdown_transforms.py:126``) with one C++
// call that:
//   1. parses the JPEG header (dims + EXIF orientation),
//   2. decodes ONLY the source region the warp actually samples
//      (libjpeg-turbo ``jpeg_crop_scanline`` + ``jpeg_skip_scanlines`` —
//      skipped rows avoid IDCT + color conversion),
//   3. optionally decodes at a DCT-domain 1/2, 1/4 or 1/8 scale when the
//      warp downsamples enough that full resolution is unnecessary
//      (``fast_scale`` mode; off for bit-parity with the cv2 path),
//   4. applies the recorded horizontal flip by mirroring the region buffer
//      (bit-exact with np.flip + warp),
//   5. runs cv::warpAffine (same OpenCV kernel as the Python path) from the
//      region into the model input crop, optionally emitting the bbox
//      coverage mask plane used by the DoubleProbMap family.
//
// Called from Python via ctypes (datasets/native_decode.py); ctypes releases
// the GIL for the duration, so DataLoader worker threads scale on real
// multi-core hosts.

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>  // jpeglib.h needs FILE
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void on_emit_message(j_common_ptr, int) {}  // silence warnings

// Minimal EXIF orientation parse from an APP1 marker payload ("Exif\0\0" +
// TIFF). Returns 0 when absent/unparseable (treated as orientation 1).
int parse_exif_orientation(const uint8_t* d, size_t len) {
  if (len < 14 || std::memcmp(d, "Exif\0\0", 6) != 0) return 0;
  const uint8_t* t = d + 6;  // TIFF header
  size_t tlen = len - 6;
  bool le;
  if (t[0] == 'I' && t[1] == 'I') le = true;
  else if (t[0] == 'M' && t[1] == 'M') le = false;
  else return 0;
  auto rd16 = [&](size_t off) -> uint32_t {
    if (off + 2 > tlen) return 0;
    return le ? (t[off] | (t[off + 1] << 8)) : ((t[off] << 8) | t[off + 1]);
  };
  auto rd32 = [&](size_t off) -> uint32_t {
    if (off + 4 > tlen) return 0;
    return le ? (t[off] | (t[off + 1] << 8) | (t[off + 2] << 16) | (uint32_t(t[off + 3]) << 24))
              : ((uint32_t(t[off]) << 24) | (t[off + 1] << 16) | (t[off + 2] << 8) | t[off + 3]);
  };
  if (rd16(2) != 42) return 0;
  uint32_t ifd = rd32(4);
  if (ifd + 2 > tlen) return 0;
  uint32_t n = rd16(ifd);
  for (uint32_t i = 0; i < n; ++i) {
    size_t e = ifd + 2 + 12 * size_t(i);
    if (e + 12 > tlen) return 0;
    if (rd16(e) == 0x0112) return int(rd16(e + 8));  // SHORT value inline
  }
  return 0;
}

// Scan raw JPEG bytes for the APP1/EXIF orientation without a full decode.
int jpeg_exif_orientation(const uint8_t* data, size_t len) {
  if (len < 4 || data[0] != 0xFF || data[1] != 0xD8) return -1;  // not a JPEG
  size_t p = 2;
  while (p + 4 <= len) {
    if (data[p] != 0xFF) return 0;
    // consume 0xFF fill bytes before the marker id (legal per B.1.1.2)
    while (p + 4 <= len && data[p + 1] == 0xFF) ++p;
    if (p + 4 > len) return 0;
    uint8_t marker = data[p + 1];
    if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { p += 2; continue; }
    if (marker == 0xDA || marker == 0xD9) return 0;  // SOS / EOI: no EXIF seen
    size_t seglen = (size_t(data[p + 2]) << 8) | data[p + 3];
    if (seglen < 2 || p + 2 + seglen > len) return 0;
    if (marker == 0xE1) {
      int o = parse_exif_orientation(data + p + 4, seglen - 2);
      if (o) return o;
    }
    p += 2 + seglen;
  }
  return 0;
}

struct Decoder {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  bool created = false;

  bool init(const uint8_t* data, size_t len) {
    cinfo.err = jpeg_std_error(&err.pub);
    err.pub.error_exit = on_error;
    err.pub.emit_message = on_emit_message;
    if (setjmp(err.jump)) return false;
    jpeg_create_decompress(&cinfo);
    created = true;
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) return false;
    return true;
  }
  ~Decoder() {
    if (created) jpeg_destroy_decompress(&cinfo);
  }
};

}  // namespace

extern "C" {

// Header probe: fills width/height/orientation (0 = none). Returns 0 on
// success, nonzero if the buffer is not a decodable JPEG.
int ppt_probe(const uint8_t* data, int64_t len, int* out_w, int* out_h, int* out_orientation) {
  Decoder dec;
  if (!dec.init(data, size_t(len))) return 1;
  *out_w = int(dec.cinfo.image_width);
  *out_h = int(dec.cinfo.image_height);
  int o = jpeg_exif_orientation(data, size_t(len));
  *out_orientation = o < 0 ? 0 : o;
  return 0;
}

// Sparse region decode into a zeroed full-(scaled-)size buffer.
//
// Decodes ONLY the JPEG rows/columns the downstream warp will sample and
// places them at their true coordinates inside ``buf`` (buf_h, buf_w, 3
// uint8 BGR, caller-zeroed: np.zeros), applying the recorded horizontal
// flip by mirroring (np.flip axis=1 semantics on the scaled grid). The
// affine warp itself runs in Python through the SAME cv2 build as the eager
// path, so the final crop is bit-exact with full decode + warp while the
// never-sampled JPEG area skips IDCT + color conversion.
//
//   M      : 2x3 row-major affine mapping POST-FLIP source pixel coords to
//            output crop coords (the matrix TopdownAffine computed).
//   flip_h : 1 if the pipeline recorded a horizontal flip.
//   denom  : DCT-domain downscale factor (1, 2, 4 or 8); buf dims must be
//            ceil(image_dim / denom).
//
// Returns 0 on success; 1 decode error; 2 bad arguments / dim mismatch.
int ppt_decode_region(const uint8_t* data, int64_t len, const double* M, int flip_h,
                      int out_w, int out_h, int denom,
                      uint8_t* buf, int buf_h, int buf_w) {
  if (denom != 1 && denom != 2 && denom != 4 && denom != 8) return 2;
  Decoder dec;
  if (!dec.init(data, size_t(len))) return 1;
  jpeg_decompress_struct& cinfo = dec.cinfo;
  if (setjmp(dec.err.jump)) return 1;

  const double W = double(cinfo.image_width);

  // Invert M (dst -> post-flip src) to find the sampled source region.
  const double det = M[0] * M[4] - M[1] * M[3];
  if (std::fabs(det) < 1e-12) return 2;
  const double inv[6] = {M[4] / det, -M[1] / det, (M[1] * M[5] - M[4] * M[2]) / det,
                         -M[3] / det, M[0] / det, (M[3] * M[2] - M[0] * M[5]) / det};
  double fx0 = 1e30, fy0 = 1e30, fx1 = -1e30, fy1 = -1e30;
  const double cx[4] = {-0.5, out_w - 0.5, out_w - 0.5, -0.5};
  const double cy[4] = {-0.5, -0.5, out_h - 0.5, out_h - 0.5};
  for (int i = 0; i < 4; ++i) {
    const double sx = inv[0] * cx[i] + inv[1] * cy[i] + inv[2];
    const double sy = inv[3] * cx[i] + inv[4] * cy[i] + inv[5];
    fx0 = std::min(fx0, sx); fx1 = std::max(fx1, sx);
    fy0 = std::min(fy0, sy); fy1 = std::max(fy1, sy);
  }
  // post-flip -> original x range (x_orig = W-1-x_flip)
  const double ox0 = flip_h ? (W - 1.0 - fx1) : fx0;
  const double ox1 = flip_h ? (W - 1.0 - fx0) : fx1;
  const double oy0 = fy0, oy1 = fy1;

  cinfo.scale_num = 1;
  cinfo.scale_denom = unsigned(denom);

#ifdef JCS_EXTENSIONS
  const bool gray = cinfo.jpeg_color_space == JCS_GRAYSCALE;
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_EXT_BGR;
#else
  const bool gray = cinfo.jpeg_color_space == JCS_GRAYSCALE;
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
#endif

  if (!jpeg_start_decompress(&cinfo)) return 1;
  const int Ws = int(cinfo.output_width);
  const int Hs = int(cinfo.output_height);
  if (Ws != buf_w || Hs != buf_h) { jpeg_abort_decompress(&cinfo); return 2; }

  // original -> scaled coords: x_s = (x_o - (denom-1)/2) / denom
  const double half = (denom - 1) * 0.5;
  int sx0 = int(std::floor((ox0 - half) / denom)) - 2;
  int sx1 = int(std::ceil((ox1 - half) / denom)) + 3;
  int sy0 = int(std::floor((oy0 - half) / denom)) - 2;
  int sy1 = int(std::ceil((oy1 - half) / denom)) + 3;
  sx0 = std::max(0, std::min(sx0, Ws)); sx1 = std::max(sx0, std::min(sx1, Ws));
  sy0 = std::max(0, std::min(sy0, Hs)); sy1 = std::max(sy0, std::min(sy1, Hs));
  if (sx1 - sx0 <= 0 || sy1 - sy0 <= 0) {  // warp samples nothing in-image
    jpeg_abort_decompress(&cinfo);
    return 0;
  }

  // horizontal crop: libjpeg rounds xoffset down to an iMCU boundary
  JDIMENSION xoff = JDIMENSION(sx0);
  JDIMENSION xw = JDIMENSION(sx1 - sx0);
  jpeg_crop_scanline(&cinfo, &xoff, &xw);
  const int rx0 = int(xoff);
  const int rw = int(xw);
  const int rh = sy1 - sy0;

  JDIMENSION to_skip = JDIMENSION(sy0);
  while (to_skip > 0) {
    JDIMENSION s = jpeg_skip_scanlines(&cinfo, to_skip);
    if (s == 0) break;
    to_skip -= s;
  }

  cv::Mat full(Hs, Ws, CV_8UC3, buf);  // caller-zeroed
  // flip placement: np.flip maps original column c -> Ws-1-c, so the region
  // occupying original scaled columns [rx0, rx0+rw) lands at [Ws-rx0-rw, ...)
  const int px0 = flip_h ? (Ws - rx0 - rw) : rx0;
  cv::Mat region = full(cv::Rect(px0, sy0, rw, rh));
  std::vector<uint8_t> rowbuf(size_t(rw) * (gray ? 1 : 3));
  int row = 0;
  while (row < rh && cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rows[1] = {rowbuf.data()};
    if (jpeg_read_scanlines(&cinfo, rows, 1) != 1) break;
    uint8_t* dst = region.ptr<uint8_t>(row);
    if (gray) {
      if (flip_h) {
        for (int x = 0; x < rw; ++x) {
          const uint8_t v = rowbuf[rw - 1 - x];
          dst[3 * x] = v; dst[3 * x + 1] = v; dst[3 * x + 2] = v;
        }
      } else {
        for (int x = 0; x < rw; ++x) { dst[3 * x] = rowbuf[x]; dst[3 * x + 1] = rowbuf[x]; dst[3 * x + 2] = rowbuf[x]; }
      }
    } else {
#ifdef JCS_EXTENSIONS
      if (flip_h) {
        for (int x = 0; x < rw; ++x) {
          const uint8_t* s = &rowbuf[3 * (rw - 1 - x)];
          dst[3 * x] = s[0]; dst[3 * x + 1] = s[1]; dst[3 * x + 2] = s[2];
        }
      } else {
        std::memcpy(dst, rowbuf.data(), size_t(rw) * 3);
      }
#else
      for (int x = 0; x < rw; ++x) {  // RGB -> BGR (+ optional mirror)
        const uint8_t* s = &rowbuf[3 * (flip_h ? (rw - 1 - x) : x)];
        dst[3 * x] = s[2]; dst[3 * x + 1] = s[1]; dst[3 * x + 2] = s[0];
      }
#endif
    }
    ++row;
  }
  jpeg_abort_decompress(&cinfo);
  return 0;
}

}  // extern "C"
