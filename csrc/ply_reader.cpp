// Native PLY vertex reader for fccf_pcr_tpu.
//
// The reference links PCL for `pcl::io::loadPLYFile` (FCCF.cpp:1655-1665);
// this is the framework's native-runtime equivalent: a dependency-free C++
// parser exposed through a C ABI and loaded from Python via ctypes
// (fccf_pcr_tpu/io/native.py). Binary little-endian files are decoded with
// strided memcpy at IO speed; ascii is parsed with strtof.
//
// C ABI:
//   int  fccf_ply_read(const char* path, float** out_xyz, int64_t* out_n);
//       returns 0 on success; *out_xyz is malloc'd (N*3 floats), caller
//       frees with fccf_ply_free. Nonzero return = errno-style code:
//       1 open failure, 2 parse failure, 3 unsupported format.
//   void fccf_ply_free(float* p);

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "io_util.h"

namespace {

using fccf_io::read_line;
using fccf_io::split;

struct Property {
  std::string name;
  int size = 0;        // bytes; 0 for list properties
  char kind = 'f';     // f=float, d=double, i=int, u=uint
  bool is_list = false;
  int list_count_size = 0;
  int list_elem_size = 0;
};

struct Element {
  std::string name;
  int64_t count = 0;
  std::vector<Property> props;
};

int type_size(const std::string& t, char* kind) {
  if (t == "char" || t == "int8") { *kind = 'i'; return 1; }
  if (t == "uchar" || t == "uint8") { *kind = 'u'; return 1; }
  if (t == "short" || t == "int16") { *kind = 'i'; return 2; }
  if (t == "ushort" || t == "uint16") { *kind = 'u'; return 2; }
  if (t == "int" || t == "int32") { *kind = 'i'; return 4; }
  if (t == "uint" || t == "uint32") { *kind = 'u'; return 4; }
  if (t == "float" || t == "float32") { *kind = 'f'; return 4; }
  if (t == "double" || t == "float64") { *kind = 'd'; return 8; }
  return 0;
}

double decode(const unsigned char* p, const Property& pr) {
  switch (pr.kind) {
    case 'f': { float v; memcpy(&v, p, 4); return v; }
    case 'd': { double v; memcpy(&v, p, 8); return v; }
    case 'i': {
      if (pr.size == 1) { int8_t v; memcpy(&v, p, 1); return v; }
      if (pr.size == 2) { int16_t v; memcpy(&v, p, 2); return v; }
      int32_t v; memcpy(&v, p, 4); return v;
    }
    default: {
      if (pr.size == 1) { uint8_t v; memcpy(&v, p, 1); return v; }
      if (pr.size == 2) { uint16_t v; memcpy(&v, p, 2); return v; }
      uint32_t v; memcpy(&v, p, 4); return v;
    }
  }
}

}  // namespace

extern "C" {

int fccf_ply_read(const char* path, float** out_xyz, int64_t* out_n) {
  *out_xyz = nullptr;  // defined on every failure path (same ABI as PCD)
  *out_n = 0;
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  std::string line;
  if (!read_line(f, &line) || line != "ply") { fclose(f); return 2; }

  std::string format;
  std::vector<Element> elements;
  while (read_line(f, &line)) {
    auto tok = split(line);
    if (tok.empty() || tok[0] == "comment" || tok[0] == "obj_info") continue;
    if (tok[0] == "format" && tok.size() >= 2) {
      format = tok[1];
    } else if (tok[0] == "element" && tok.size() >= 3) {
      Element e;
      e.name = tok[1];
      e.count = strtoll(tok[2].c_str(), nullptr, 10);
      elements.push_back(e);
    } else if (tok[0] == "property" && !elements.empty()) {
      Property p;
      if (tok.size() >= 5 && tok[1] == "list") {
        p.is_list = true;
        char k;
        p.list_count_size = type_size(tok[2], &k);
        p.list_elem_size = type_size(tok[3], &k);
        p.name = tok[4];
      } else if (tok.size() >= 3) {
        p.size = type_size(tok[1], &p.kind);
        p.name = tok[2];
        if (p.size == 0) { fclose(f); return 2; }
      } else {
        // a truncated property line would otherwise add a zero-size
        // column, silently shifting every later binary offset
        fclose(f);
        return 2;
      }
      elements.back().props.push_back(p);
    } else if (tok[0] == "end_header") {
      break;
    }
  }

  const Element* vertex = nullptr;
  for (const auto& e : elements)
    if (e.name == "vertex") { vertex = &e; break; }
  if (!vertex || vertex->count <= 0) { fclose(f); return 2; }

  int ix = -1, iy = -1, iz = -1;
  int64_t stride = 0;
  std::vector<int64_t> offsets(vertex->props.size(), 0);
  for (size_t i = 0; i < vertex->props.size(); i++) {
    const auto& p = vertex->props[i];
    if (p.is_list) { fclose(f); return 3; }  // list props in vertex: bail
    offsets[i] = stride;
    stride += p.size;
    if (p.name == "x") ix = static_cast<int>(i);
    if (p.name == "y") iy = static_cast<int>(i);
    if (p.name == "z") iz = static_cast<int>(i);
  }
  if (ix < 0 || iy < 0 || iz < 0) { fclose(f); return 2; }
  if (fccf_io::xyz_alloc_overflows(vertex->count)) { fclose(f); return 2; }

  float* out = static_cast<float*>(malloc(sizeof(float) * 3 * vertex->count));
  if (!out) { fclose(f); return 2; }

  if (format == "ascii") {
    // elements must appear in order; vertex is virtually always first.
    for (const auto& e : elements) {
      if (e.name == "vertex") {
        for (int64_t r = 0; r < e.count; r++) {
          if (!read_line(f, &line)) { free(out); fclose(f); return 2; }
          auto tok = split(line);
          if (tok.size() < e.props.size()) { free(out); fclose(f); return 2; }
          out[r * 3 + 0] = strtof(tok[ix].c_str(), nullptr);
          out[r * 3 + 1] = strtof(tok[iy].c_str(), nullptr);
          out[r * 3 + 2] = strtof(tok[iz].c_str(), nullptr);
        }
        break;
      }
      for (int64_t r = 0; r < e.count; r++) read_line(f, &line);
    }
  } else if (format == "binary_little_endian") {
    for (const auto& e : elements) {
      if (e.name == "vertex") break;
      // skip earlier fixed-stride elements; list-bearing ones unsupported
      int64_t es = 0;
      for (const auto& p : e.props) {
        if (p.is_list) { free(out); fclose(f); return 3; }
        es += p.size;
      }
      if (fseek(f, static_cast<long>(es * e.count), SEEK_CUR) != 0) {
        free(out); fclose(f); return 2;
      }
    }
    std::vector<unsigned char> buf(static_cast<size_t>(stride) * 65536);
    int64_t done = 0;
    const auto& px = vertex->props[ix];
    const auto& py = vertex->props[iy];
    const auto& pz = vertex->props[iz];
    while (done < vertex->count) {
      int64_t chunk = std::min<int64_t>(65536, vertex->count - done);
      if (fread(buf.data(), stride, chunk, f) != static_cast<size_t>(chunk)) {
        free(out); fclose(f); return 2;
      }
      const bool fast = px.kind == 'f' && py.kind == 'f' && pz.kind == 'f';
      for (int64_t r = 0; r < chunk; r++) {
        const unsigned char* row = buf.data() + r * stride;
        if (fast) {
          memcpy(&out[(done + r) * 3 + 0], row + offsets[ix], 4);
          memcpy(&out[(done + r) * 3 + 1], row + offsets[iy], 4);
          memcpy(&out[(done + r) * 3 + 2], row + offsets[iz], 4);
        } else {
          out[(done + r) * 3 + 0] = static_cast<float>(decode(row + offsets[ix], px));
          out[(done + r) * 3 + 1] = static_cast<float>(decode(row + offsets[iy], py));
          out[(done + r) * 3 + 2] = static_cast<float>(decode(row + offsets[iz], pz));
        }
      }
      done += chunk;
    }
  } else {
    free(out);
    fclose(f);
    return 3;  // big-endian: python fallback handles it
  }

  fclose(f);
  *out_xyz = out;
  *out_n = vertex->count;
  return 0;
}

void fccf_ply_free(float* p) { free(p); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched, threaded loader: reads N PLY files in parallel and pads/subsamples
// each directly into a caller-allocated (n, capacity, 3) float32 buffer +
// (n, capacity) uint8 mask — the exact fixed-capacity layout the registration
// pipeline consumes (fccf_pcr_tpu/io/synthetic.py pad_points semantics:
// deterministic every-k-th subsample on overflow).
//
//   int fccf_ply_read_batch(const char** paths, int64_t n_files,
//                           int64_t capacity, int threads,
//                           float* out_points, uint8_t* out_mask,
//                           int64_t* out_counts);
// returns 0 on success, else the first nonzero per-file error code.

#include <atomic>
#include <thread>

extern "C" {

int fccf_ply_read_batch(const char** paths, int64_t n_files, int64_t capacity,
                        int threads, float* out_points, uint8_t* out_mask,
                        int64_t* out_counts) {
  std::atomic<int64_t> next(0);
  std::atomic<int> status(0);
  int nthreads = threads > 0 ? threads : 4;
  if (nthreads > n_files) nthreads = static_cast<int>(n_files);

  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_files) return;
      float* xyz = nullptr;
      int64_t m = 0;
      int rc = fccf_ply_read(paths[i], &xyz, &m);
      if (rc != 0) {
        int expected = 0;
        status.compare_exchange_strong(expected, rc);
        out_counts[i] = 0;
        memset(out_points + i * capacity * 3, 0,
               sizeof(float) * capacity * 3);
        memset(out_mask + i * capacity, 0, capacity);
        continue;
      }
      float* dst = out_points + i * capacity * 3;
      uint8_t* msk = out_mask + i * capacity;
      int64_t kept = m <= capacity ? m : capacity;
      if (m <= capacity) {
        memcpy(dst, xyz, sizeof(float) * 3 * m);
      } else {
        // deterministic even subsample, BIT-IDENTICAL to the Python
        // fallback's np.linspace(0, m-1, capacity).astype(int64)
        // (synthetic.pad_points): numpy computes arange(k) * step in
        // float64 and pins the last sample to the exact stop, so the
        // same double arithmetic is used here — integer k*(m-1)/(cap-1)
        // rounds differently on ~1% of (m, capacity) pairs, and the
        // capacity==1 case would divide by zero.
        const double step =
            capacity > 1 ? static_cast<double>(m - 1) / (capacity - 1) : 0.0;
        for (int64_t k = 0; k < capacity; k++) {
          // num==1 linspace is [start]=0; the endpoint pin applies num>1
          int64_t src = (capacity > 1 && k == capacity - 1)
                            ? (m - 1)
                            : static_cast<int64_t>(k * step);
          memcpy(dst + k * 3, xyz + src * 3, sizeof(float) * 3);
        }
      }
      memset(dst + kept * 3, 0, sizeof(float) * 3 * (capacity - kept));
      memset(msk, 1, kept);
      memset(msk + kept, 0, capacity - kept);
      out_counts[i] = m;
      fccf_ply_free(xyz);
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < nthreads; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return status.load();
}

}  // extern "C"
