// Native PCD vertex reader for fccf_pcr_tpu.
//
// The reference links PCL's PCD loader (#include <pcl/io/pcd_io.h>,
// FCCF.cpp:7); this is the framework's native-runtime equivalent: a
// dependency-free C++ parser for PCD v0.7 `ascii`, `binary`, and
// `binary_compressed` clouds, exposed through a C ABI and loaded from
// Python via ctypes (fccf_pcr_tpu/io/native.py). binary_compressed blobs
// use PCL's LZF scheme (field-major layout); the LZF decompressor here
// runs at memory speed, replacing the Python byte loop for
// production-size scans.
//
// C ABI:
//   int  fccf_pcd_read(const char* path, float** out_xyz, int64_t* out_n);
//       returns 0 on success; *out_xyz is malloc'd (N*3 floats), caller
//       frees with fccf_pcd_free. Nonzero return: 1 open failure,
//       2 parse failure, 3 unsupported layout (caller falls back to
//       the Python reader).
//   void fccf_pcd_free(float* p);

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <string>
#include <vector>

#include "io_util.h"

namespace {

using fccf_io::read_line;
using fccf_io::split;

// liblzf decompression (PCL binary_compressed payload).
bool lzf_decompress(const uint8_t* src, size_t in_len, uint8_t* dst,
                    size_t out_len) {
  size_t i = 0, o = 0;
  while (i < in_len) {
    unsigned ctrl = src[i++];
    if (ctrl < 32) {  // literal run
      unsigned run = ctrl + 1;
      if (i + run > in_len || o + run > out_len) return false;
      std::memcpy(dst + o, src + i, run);
      i += run;
      o += run;
    } else {  // back reference
      unsigned len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return false;
        len += src[i++];
      }
      len += 2;
      if (i >= in_len) return false;
      size_t ref = o - ((ctrl & 0x1F) << 8) - src[i++] - 1;
      if (ref + len > o + len) return false;  // ref underflow (wrapped)
      if (ref >= o || o + len > out_len) return false;
      for (unsigned k = 0; k < len; ++k) dst[o + k] = dst[ref + k];  // overlap
      o += len;
    }
  }
  return o == out_len;
}

struct Field {
  std::string name;
  int size = 4;
  char type = 'F';
  int count = 1;
};

float to_float(const uint8_t* p, int size, char type) {
  if (type == 'F') {
    if (size == 4) { float v; std::memcpy(&v, p, 4); return v; }
    if (size == 8) { double v; std::memcpy(&v, p, 8); return (float)v; }
  } else if (type == 'I') {
    if (size == 1) { int8_t v; std::memcpy(&v, p, 1); return (float)v; }
    if (size == 2) { int16_t v; std::memcpy(&v, p, 2); return (float)v; }
    if (size == 4) { int32_t v; std::memcpy(&v, p, 4); return (float)v; }
  } else if (type == 'U') {
    if (size == 1) { uint8_t v; std::memcpy(&v, p, 1); return (float)v; }
    if (size == 2) { uint16_t v; std::memcpy(&v, p, 2); return (float)v; }
    if (size == 4) { uint32_t v; std::memcpy(&v, p, 4); return (float)v; }
  }
  return 0.0f;
}

}  // namespace

extern "C" {

void fccf_pcd_free(float* p) { std::free(p); }

int fccf_pcd_read(const char* path, float** out_xyz, int64_t* out_n) {
  *out_xyz = nullptr;
  *out_n = 0;
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  std::vector<Field> fields;
  int64_t n = -1;
  std::string mode;
  std::string line;
  bool header_done = false;
  while (read_line(f, &line)) {
    if (line.empty() || line[0] == '#') continue;
    auto tok = split(line);
    if (tok.empty()) continue;
    const std::string& key = tok[0];
    if (key == "FIELDS") {
      fields.clear();
      for (size_t i = 1; i < tok.size(); ++i) {
        Field fl;
        fl.name = tok[i];
        fields.push_back(fl);
      }
    } else if (key == "SIZE") {
      for (size_t i = 1; i < tok.size() && i - 1 < fields.size(); ++i)
        fields[i - 1].size = std::atoi(tok[i].c_str());
    } else if (key == "TYPE") {
      for (size_t i = 1; i < tok.size() && i - 1 < fields.size(); ++i)
        fields[i - 1].type = tok[i][0];
    } else if (key == "COUNT") {
      for (size_t i = 1; i < tok.size() && i - 1 < fields.size(); ++i)
        fields[i - 1].count = std::atoi(tok[i].c_str());
    } else if (key == "POINTS") {
      if (tok.size() < 2) { std::fclose(f); return 2; }
      n = std::atoll(tok[1].c_str());
    } else if (key == "DATA") {
      mode = tok.size() > 1 ? tok[1] : "";
      header_done = true;
      break;
    }
  }
  if (!header_done || n < 0 || fields.empty()) { std::fclose(f); return 2; }

  int ix = -1, iy = -1, iz = -1;
  int64_t stride = 0;
  std::vector<int64_t> offsets(fields.size());
  for (size_t i = 0; i < fields.size(); ++i) {
    offsets[i] = stride;
    stride += (int64_t)fields[i].size * fields[i].count;
    if (fields[i].count != 1) continue;
    if (fields[i].name == "x") ix = (int)i;
    if (fields[i].name == "y") iy = (int)i;
    if (fields[i].name == "z") iz = (int)i;
  }
  if (ix < 0 || iy < 0 || iz < 0) { std::fclose(f); return 3; }
  if (fccf_io::xyz_alloc_overflows(n)) { std::fclose(f); return 2; }

  float* out = (float*)std::malloc(sizeof(float) * 3 * (size_t)n);
  if (!out) { std::fclose(f); return 2; }

  if (mode == "ascii") {
    int col_x = 0, col_y = 0, col_z = 0, col = 0;
    for (size_t i = 0; i < fields.size(); ++i) {
      if ((int)i == ix) col_x = col;
      if ((int)i == iy) col_y = col;
      if ((int)i == iz) col_z = col;
      col += fields[i].count;
    }
    for (int64_t r = 0; r < n; ++r) {
      if (!read_line(f, &line)) { std::free(out); std::fclose(f); return 2; }
      auto tok = split(line);
      if ((int)tok.size() < col) { std::free(out); std::fclose(f); return 2; }
      out[r * 3 + 0] = strtof(tok[col_x].c_str(), nullptr);
      out[r * 3 + 1] = strtof(tok[col_y].c_str(), nullptr);
      out[r * 3 + 2] = strtof(tok[col_z].c_str(), nullptr);
    }
  } else if (mode == "binary") {
    // chunked rows (65536/fread like the PLY reader) — one fread per
    // point costs 10M libc calls on a production scan
    const int64_t rows_per_chunk = 65536;
    std::vector<uint8_t> buf((size_t)stride * rows_per_chunk);
    int64_t done = 0;
    while (done < n) {
      int64_t chunk = std::min<int64_t>(rows_per_chunk, n - done);
      if (std::fread(buf.data(), stride, chunk, f) != (size_t)chunk) {
        std::free(out); std::fclose(f); return 2;
      }
      for (int64_t r = 0; r < chunk; ++r) {
        const uint8_t* row = buf.data() + (size_t)r * stride;
        out[(done + r) * 3 + 0] = to_float(row + offsets[ix], fields[ix].size, fields[ix].type);
        out[(done + r) * 3 + 1] = to_float(row + offsets[iy], fields[iy].size, fields[iy].type);
        out[(done + r) * 3 + 2] = to_float(row + offsets[iz], fields[iz].size, fields[iz].type);
      }
      done += chunk;
    }
  } else if (mode == "binary_compressed") {
    uint32_t sizes[2];
    if (std::fread(sizes, 4, 2, f) != 2) { std::free(out); std::fclose(f); return 2; }
    std::vector<uint8_t> comp(sizes[0]), blob(sizes[1]);
    if (std::fread(comp.data(), 1, sizes[0], f) != sizes[0]) {
      std::free(out); std::fclose(f); return 2;
    }
    if (!lzf_decompress(comp.data(), comp.size(), blob.data(), blob.size())) {
      std::free(out); std::fclose(f); return 2;
    }
    // field-major: each field's n values contiguously
    int64_t off = 0;
    std::vector<int64_t> field_off(fields.size());
    for (size_t i = 0; i < fields.size(); ++i) {
      field_off[i] = off;
      off += (int64_t)fields[i].size * fields[i].count * n;
    }
    if (off != (int64_t)blob.size()) { std::free(out); std::fclose(f); return 2; }
    for (int64_t r = 0; r < n; ++r) {
      out[r * 3 + 0] = to_float(blob.data() + field_off[ix] + r * fields[ix].size,
                                fields[ix].size, fields[ix].type);
      out[r * 3 + 1] = to_float(blob.data() + field_off[iy] + r * fields[iy].size,
                                fields[iy].size, fields[iy].type);
      out[r * 3 + 2] = to_float(blob.data() + field_off[iz] + r * fields[iz].size,
                                fields[iz].size, fields[iz].type);
    }
  } else {
    std::free(out);
    std::fclose(f);
    return 3;
  }

  std::fclose(f);
  *out_xyz = out;
  *out_n = n;
  return 0;
}

}  // extern "C"
