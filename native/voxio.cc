// Native voxel I/O runtime: binvox RLE codec + threaded batch decoder.
//
// The performance-critical host-side path of the data pipeline (the
// reference implements it as per-voxel Python, tools/binvox_rw.py:58-93 and
// :175-226; here it is native C++ with a thread pool so a multi-chip input
// pipeline can keep up with device step times).
//
// Exposed as a plain C ABI for ctypes binding (rendernet_tpu/io/native.py).
// On-disk layout: ASCII header ("#binvox 1", "dim d1 d2 d3", "translate",
// "scale", "data") followed by (value, count) byte pairs; flat voxel order
// is x-major then z then y ("xzy"); the dense output uses xyz order
// (axis-1/axis-2 swap), matching the Python codec.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Header {
  int d1, d2, d3;
  double translate[3];
  double scale;
  size_t payload_offset;
};

// Parse the ASCII header; returns 0 on success.
int parse_header(const uint8_t* buf, size_t len, Header* h) {
  const char* p = reinterpret_cast<const char*>(buf);
  const char* end = p + len;
  auto next_line = [&](std::string* out) -> bool {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) return false;
    out->assign(p, nl - p);
    p = nl + 1;
    return true;
  };
  std::string line;
  if (!next_line(&line) || line.rfind("#binvox", 0) != 0) return 1;
  h->translate[0] = h->translate[1] = h->translate[2] = 0.0;
  h->scale = 1.0;
  bool have_dim = false;
  while (next_line(&line)) {
    if (line.rfind("data", 0) == 0) {
      if (!have_dim) return 3;
      h->payload_offset = p - reinterpret_cast<const char*>(buf);
      return 0;
    }
    if (line.rfind("dim", 0) == 0) {
      if (sscanf(line.c_str(), "dim %d %d %d", &h->d1, &h->d2, &h->d3) != 3)
        return 2;
      have_dim = true;
    } else if (line.rfind("translate", 0) == 0) {
      sscanf(line.c_str(), "translate %lf %lf %lf", &h->translate[0],
             &h->translate[1], &h->translate[2]);
    } else if (line.rfind("scale", 0) == 0) {
      sscanf(line.c_str(), "scale %lf", &h->scale);
    }
  }
  return 4;
}

// RLE-decode payload into a dense uint8 grid in file (xzy) order.
int decode_payload(const uint8_t* payload, size_t plen, uint8_t* flat,
                   size_t n_voxels) {
  size_t out = 0;
  for (size_t i = 0; i + 1 < plen && out < n_voxels; i += 2) {
    uint8_t value = payload[i];
    size_t count = payload[i + 1];
    if (out + count > n_voxels) count = n_voxels - out;
    memset(flat + out, value, count);
    out += count;
  }
  return out == n_voxels ? 0 : 5;
}

}  // namespace

extern "C" {

// Parse header only: dims[3], translate[3], scale. Returns 0 on success.
int voxio_header(const uint8_t* buf, size_t len, int32_t* dims,
                 double* translate, double* scale) {
  Header h;
  int rc = parse_header(buf, len, &h);
  if (rc) return rc;
  dims[0] = h.d1;
  dims[1] = h.d2;
  dims[2] = h.d3;
  memcpy(translate, h.translate, sizeof h.translate);
  *scale = h.scale;
  return 0;
}

// Decode one binvox buffer into a caller-allocated uint8 grid of
// d1*d2*d3 entries in xyz order (axis fix applied). Returns 0 on success.
int voxio_decode(const uint8_t* buf, size_t len, uint8_t* out_xyz,
                 size_t out_capacity) {
  Header h;
  int rc = parse_header(buf, len, &h);
  if (rc) return rc;
  const size_t n = static_cast<size_t>(h.d1) * h.d2 * h.d3;
  if (out_capacity < n) return 6;
  std::vector<uint8_t> flat(n);
  rc = decode_payload(buf + h.payload_offset, len - h.payload_offset,
                      flat.data(), n);
  if (rc) return rc;
  // file order is (x, z, y): flat[((x * d2) + z) * d3 + y]; output is
  // xyz: out[((x * d3) + y) * d2 + z]  (d2 = z-extent, d3 = y-extent).
  // Blocked 2-D transpose per x-plane keeps both streams in cache.
  const int d2 = h.d2, d3 = h.d3;
  constexpr int BT = 32;
  for (int x = 0; x < h.d1; ++x) {
    const uint8_t* src_plane = flat.data() + static_cast<size_t>(x) * d2 * d3;
    uint8_t* dst_plane = out_xyz + static_cast<size_t>(x) * d2 * d3;
    for (int z0 = 0; z0 < d2; z0 += BT) {
      const int z1 = z0 + BT < d2 ? z0 + BT : d2;
      for (int y0 = 0; y0 < d3; y0 += BT) {
        const int y1 = y0 + BT < d3 ? y0 + BT : d3;
        for (int z = z0; z < z1; ++z) {
          const uint8_t* src_row = src_plane + static_cast<size_t>(z) * d3;
          for (int y = y0; y < y1; ++y) {
            dst_plane[static_cast<size_t>(y) * d2 + z] = src_row[y];
          }
        }
      }
    }
  }
  return 0;
}

// RLE-encode a dense uint8 xyz grid into a caller buffer (header + payload).
// Returns the number of bytes written, or -1 if the buffer is too small.
// Worst case payload is 2 * n_voxels + header; pass a buffer that large.
int64_t voxio_encode(const uint8_t* grid_xyz, int32_t d1, int32_t d2,
                     int32_t d3, const double* translate, double scale,
                     uint8_t* out, size_t out_capacity) {
  char header[256];
  int hlen = snprintf(header, sizeof header,
                      "#binvox 1\ndim %d %d %d\ntranslate %g %g %g\n"
                      "scale %g\ndata\n",
                      d1, d2, d3, translate[0], translate[1], translate[2],
                      scale);
  const size_t n = static_cast<size_t>(d1) * d2 * d3;
  if (out_capacity < static_cast<size_t>(hlen) + 2 * n + 2) return -1;
  memcpy(out, header, hlen);
  size_t w = hlen;
  // iterate in file (xzy) order while reading the xyz grid
  uint8_t run_val = 0;
  size_t run_len = 0;
  bool first = true;
  for (int x = 0; x < d1; ++x) {
    const uint8_t* plane = grid_xyz + static_cast<size_t>(x) * d2 * d3;
    for (int z = 0; z < d2; ++z) {
      for (int y = 0; y < d3; ++y) {
        uint8_t v = plane[static_cast<size_t>(y) * d2 + z] ? 1 : 0;
        if (first) {
          run_val = v;
          run_len = 1;
          first = false;
        } else if (v == run_val && run_len < 255) {
          ++run_len;
        } else {
          out[w++] = run_val;
          out[w++] = static_cast<uint8_t>(run_len);
          run_val = v;
          run_len = 1;
        }
      }
    }
  }
  if (!first) {
    out[w++] = run_val;
    out[w++] = static_cast<uint8_t>(run_len);
  }
  return static_cast<int64_t>(w);
}

// Threaded batch decode: n buffers (concatenated, with offsets/lengths)
// into a float32 batch array [n, d1, d2, d3]. Every entry must share dims.
// Returns 0 on success, else the first nonzero per-item status.
int voxio_decode_batch_f32(const uint8_t* blob, const int64_t* offsets,
                           const int64_t* lengths, int32_t n_items,
                           int32_t d1, int32_t d2, int32_t d3,
                           float* out, int32_t n_threads) {
  const size_t n_vox = static_cast<size_t>(d1) * d2 * d3;
  std::vector<int> status(n_items, 0);
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::vector<int> next_item{0};
  auto worker = [&](int tid) {
    std::vector<uint8_t> tmp(n_vox);
    for (int i = tid; i < n_items; i += n_threads) {
      int rc = voxio_decode(blob + offsets[i],
                            static_cast<size_t>(lengths[i]), tmp.data(),
                            n_vox);
      status[i] = rc;
      if (rc == 0) {
        float* dst = out + static_cast<size_t>(i) * n_vox;
        for (size_t j = 0; j < n_vox; ++j) dst[j] = tmp[j] ? 1.0f : 0.0f;
      }
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker, t);
  for (auto& th : pool) th.join();
  for (int i = 0; i < n_items; ++i)
    if (status[i]) return status[i];
  return 0;
}

}  // extern "C"
