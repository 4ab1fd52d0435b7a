// Native text-matrix (.amat) parser for the sbMNIST pipeline.
//
// The reference loads Larochelle's binarized-mnist amat files with
// np.loadtxt (reference datasets/sbmnist.py:55-58), which tokenizes 47M
// values through Python-level machinery. This parser is the TPU framework's
// native data-loading component: one pass over the raw bytes with a
// fast-path for the single-digit 0/1 tokens that dominate these files and
// strtof for everything else.
//
// Build: g++ -O3 -shared -fPIC (lazy, from ardae_tpu/data/native/__init__.py).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {
std::vector<float> g_values;  // filled by amat_parse, drained by amat_fetch

inline bool is_space(char c) {
  return c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == '\v' ||
         c == '\f';
}
}  // namespace

extern "C" {

// Parse every whitespace-separated float in `path` into an internal buffer.
// Returns the value count, or -1 on I/O failure.
long long amat_parse(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 0) {
    std::fclose(f);
    return -1;
  }
  // +1 for a NUL terminator so strtof never runs off the end.
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
  std::fclose(f);
  buf[got] = '\0';

  g_values.clear();
  // Typical density: binarized mnist is ~2 bytes/value.
  g_values.reserve(got / 2 + 16);

  const char* p = buf.data();
  const char* end = buf.data() + got;
  while (p < end) {
    while (p < end && is_space(*p)) ++p;
    if (p >= end) break;
    // Fast path: a bare single digit (the overwhelming case for 0/1 data).
    if (*p >= '0' && *p <= '9' && (p + 1 == end || is_space(p[1]))) {
      g_values.push_back(static_cast<float>(*p - '0'));
      ++p;
      continue;
    }
    char* next = nullptr;
    float v = std::strtof(p, &next);
    if (next == p) {  // unparseable byte: skip it defensively
      ++p;
      continue;
    }
    g_values.push_back(v);
    p = next;
  }
  return static_cast<long long>(g_values.size());
}

// Copy the parsed values into `out` (caller allocates amat_parse()'s return
// count) and release the internal buffer.
void amat_fetch(float* out) {
  std::memcpy(out, g_values.data(), g_values.size() * sizeof(float));
  g_values.clear();
  g_values.shrink_to_fit();
}

}  // extern "C"
