// Native image I/O for the host data pipeline: PNG decode.
//
// The training tars stream 512x512 PNGs (reference: tools/utils.py:74-102
// dispatches .png entries through scipy/PIL). Per-image Python decode is
// host time that stalls the accelerator between chunks; this decoder is
// C++ (zlib inflate + scanline unfilter), releases the GIL through ctypes,
// and so scales across loader threads.
//
// Scope: 8-bit, non-interlaced, color types 0 (grey), 2 (RGB), 4 (grey+
// alpha), 6 (RGBA) — everything our data pipeline and the reference
// dataset emit. Anything else returns an error and the Python caller
// falls back to PIL.
//
// API (C, ctypes-friendly):
//   imgio_png_probe(buf, len, &w, &h, &channels) -> 0 ok / <0 error
//   imgio_png_decode(buf, len, out, out_capacity) -> 0 ok / <0 error
//     out receives h*w*channels uint8 (row-major, channels innermost).

#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

constexpr unsigned char kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct Header {
  uint32_t w = 0, h = 0;
  int channels = 0;
};

// Parse IHDR and validate support. Returns 0 or a negative error code.
int parse_header(const uint8_t* buf, size_t len, Header* hdr) {
  if (len < 8 + 25 || std::memcmp(buf, kSig, 8) != 0) return -1;  // not a PNG
  const uint8_t* p = buf + 8;
  if (be32(p) != 13 || std::memcmp(p + 4, "IHDR", 4) != 0) return -2;
  const uint8_t* d = p + 8;
  hdr->w = be32(d);
  hdr->h = be32(d + 4);
  int bit_depth = d[8], color_type = d[9], interlace = d[12];
  if (hdr->w == 0 || hdr->h == 0) return -3;
  if (bit_depth != 8 || interlace != 0) return -4;  // unsupported: PIL path
  switch (color_type) {
    case 0: hdr->channels = 1; break;
    case 2: hdr->channels = 3; break;
    case 4: hdr->channels = 2; break;
    case 6: hdr->channels = 4; break;
    default: return -4;  // palette etc.: PIL path
  }
  return 0;
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  return pb <= pc ? b : c;
}

}  // namespace

extern "C" {

int imgio_png_probe(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h,
                    int32_t* channels) {
  Header hdr;
  int rc = parse_header(buf, size_t(len), &hdr);
  if (rc != 0) return rc;
  *w = int32_t(hdr.w);
  *h = int32_t(hdr.h);
  *channels = int32_t(hdr.channels);
  return 0;
}

int imgio_png_decode(const uint8_t* buf, int64_t len, uint8_t* out,
                     int64_t out_capacity) {
  Header hdr;
  int rc = parse_header(buf, size_t(len), &hdr);
  if (rc != 0) return rc;
  const size_t w = hdr.w, h = hdr.h, c = size_t(hdr.channels);
  if (int64_t(w * h * c) > out_capacity) return -5;

  // Gather the zlib stream across IDAT chunks.
  std::vector<uint8_t> z;
  const uint8_t* p = buf + 8;
  const uint8_t* end = buf + len;
  while (p + 12 <= end) {
    uint32_t clen = be32(p);
    const uint8_t* data = p + 8;
    if (data + clen + 4 > end) return -6;  // truncated
    if (std::memcmp(p + 4, "IDAT", 4) == 0) {
      z.insert(z.end(), data, data + clen);
    } else if (std::memcmp(p + 4, "IEND", 4) == 0) {
      break;
    }
    p = data + clen + 4;  // skip CRC
  }
  if (z.empty()) return -6;

  // Raw scanlines: per row one filter byte + w*c samples.
  const size_t stride = w * c;
  std::vector<uint8_t> raw(h * (1 + stride));
  uLongf raw_len = uLongf(raw.size());
  if (uncompress(raw.data(), &raw_len, z.data(), uLong(z.size())) != Z_OK ||
      raw_len != raw.size()) {
    return -7;
  }

  // Unfilter in place into `out`.
  const size_t bpp = c;  // 8-bit: bytes per pixel == channels
  for (size_t y = 0; y < h; ++y) {
    const uint8_t* row = raw.data() + y * (1 + stride);
    uint8_t filter = row[0];
    const uint8_t* src = row + 1;
    uint8_t* dst = out + y * stride;
    const uint8_t* up = y ? out + (y - 1) * stride : nullptr;
    switch (filter) {
      case 0:  // None
        std::memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i)
          dst[i] = uint8_t(src[i] + (i >= bpp ? dst[i - bpp] : 0));
        break;
      case 2:  // Up
        if (up)
          for (size_t i = 0; i < stride; ++i) dst[i] = uint8_t(src[i] + up[i]);
        else
          std::memcpy(dst, src, stride);
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? dst[i - bpp] : 0;
          int b = up ? up[i] : 0;
          dst[i] = uint8_t(src[i] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? dst[i - bpp] : 0;
          int b = up ? up[i] : 0;
          int cc = (up && i >= bpp) ? up[i - bpp] : 0;
          dst[i] = uint8_t(src[i] + paeth(a, b, cc));
        }
        break;
      default:
        return -8;
    }
  }
  return 0;
}

}  // extern "C"
