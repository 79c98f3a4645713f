// Shared header-parsing helpers for the native readers (ply_reader.cpp,
// pcd_reader.cpp). Header-only so each translation unit keeps internal
// linkage (static) — no extra symbol surface in libfccf_io.so.
#ifndef FCCF_IO_UTIL_H_
#define FCCF_IO_UTIL_H_

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

namespace fccf_io {

// Reads one '\n'-terminated line, dropping '\r'; returns false at EOF
// with no bytes read.
inline bool read_line(FILE* f, std::string* line) {
  line->clear();
  int c;
  while ((c = fgetc(f)) != EOF) {
    if (c == '\n') return true;
    if (c != '\r') line->push_back(static_cast<char>(c));
  }
  return !line->empty();
}

inline std::vector<std::string> split(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && (s[i] == ' ' || s[i] == '\t')) ++i;
    size_t j = i;
    while (j < s.size() && s[j] != ' ' && s[j] != '\t') ++j;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

// malloc-size guard: true when `count` xyz rows of float32 cannot be
// allocated without the byte computation overflowing size_t (a corrupt
// header's element count must fail parsing, not wrap into a tiny
// allocation the read loop then overruns).
inline bool xyz_alloc_overflows(int64_t count) {
  return count < 0 ||
         static_cast<uint64_t>(count) > SIZE_MAX / (sizeof(float) * 3);
}

}  // namespace fccf_io

#endif  // FCCF_IO_UTIL_H_
