// pt_native: host-side native runtime for path_tracer_tpu.
//
// The reference implements its host runtime in Rust (OFF parsing
// src/render/load_off.rs, PPM encoding src/render/mod.rs:1031-1089, image
// hashing mod.rs:916-926). This library provides the TPU framework's native
// equivalents, exposed through a C ABI consumed via ctypes
// (path_tracer_tpu/native). Pure-Python fallbacks exist for every entry
// point; this is the fast path for large meshes / frames.
//
// Build: make -C csrc     (produces libpt_native.so)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OFF mesh parsing (semantics parity with load_off.rs:8-85: skip comments and
// blank lines, OFF magic, nv/nf/ne counts, scaled vertices, triangles only).
//
// Call with out == nullptr (or cap == 0) to query the triangle count.
// Returns the triangle count, or a negative error code:
//   -1 open failed, -2 bad header, -3 bad counts, -4 bad vertex,
//   -5 bad face (incl. non-triangle), -6 index out of range.
// ---------------------------------------------------------------------------

namespace {

struct Cursor {
  const char* p;
  const char* end;
};

// next non-empty, non-comment line (trimmed); returns false at EOF
bool next_line(Cursor& c, std::string& line) {
  while (c.p < c.end) {
    const char* nl = static_cast<const char*>(
        memchr(c.p, '\n', static_cast<size_t>(c.end - c.p)));
    const char* stop = nl ? nl : c.end;
    const char* b = c.p;
    const char* e = stop;
    c.p = nl ? nl + 1 : c.end;
    while (b < e && isspace(static_cast<unsigned char>(*b))) b++;
    while (e > b && isspace(static_cast<unsigned char>(e[-1]))) e--;
    if (e > b && *b != '#') {
      line.assign(b, static_cast<size_t>(e - b));
      return true;
    }
  }
  return false;
}

}  // namespace

long long pt_parse_off(const char* path, float scale, float* out,
                       long long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string data(static_cast<size_t>(sz), '\0');
  if (sz > 0 && fread(&data[0], 1, static_cast<size_t>(sz), f) !=
                    static_cast<size_t>(sz)) {
    fclose(f);
    return -1;
  }
  fclose(f);

  Cursor c{data.data(), data.data() + data.size()};
  std::string line;
  if (!next_line(c, line) || line != "OFF") return -2;
  if (!next_line(c, line)) return -3;

  long long nv, nf, ne;
  if (sscanf(line.c_str(), "%lld %lld %lld", &nv, &nf, &ne) != 3 || nv < 0 ||
      nf < 0)
    return -3;

  std::vector<float> verts(static_cast<size_t>(nv) * 3);
  for (long long i = 0; i < nv; i++) {
    if (!next_line(c, line)) return -4;
    float x, y, z;
    if (sscanf(line.c_str(), "%f %f %f", &x, &y, &z) != 3) return -4;
    verts[static_cast<size_t>(i) * 3 + 0] = x * scale;
    verts[static_cast<size_t>(i) * 3 + 1] = y * scale;
    verts[static_cast<size_t>(i) * 3 + 2] = z * scale;
  }

  for (long long i = 0; i < nf; i++) {
    if (!next_line(c, line)) return -5;
    long long cnt, a, b2, d2;
    if (sscanf(line.c_str(), "%lld %lld %lld %lld", &cnt, &a, &b2, &d2) != 4)
      return -5;
    if (cnt != 3) return -5;  // only triangles are supported
    if (a < 0 || a >= nv || b2 < 0 || b2 >= nv || d2 < 0 || d2 >= nv)
      return -6;
    if (out && i < cap) {
      float* t = out + static_cast<size_t>(i) * 9;
      memcpy(t + 0, &verts[static_cast<size_t>(a) * 3], 12);
      memcpy(t + 3, &verts[static_cast<size_t>(b2) * 3], 12);
      memcpy(t + 6, &verts[static_cast<size_t>(d2) * 3], 12);
    }
  }
  return nf;
}

// ---------------------------------------------------------------------------
// PPM body encoding: gamma-2.2 quantization (mod.rs:57-63) + "r g b " ASCII
// triplets, optionally in reverse pixel order (mod.rs:1065). Returns bytes
// written, or -1 if the buffer is too small.
// ---------------------------------------------------------------------------

long long pt_ppm_encode(const float* pixels, long long n, int reverse,
                        char* out, long long cap) {
  // 4096-entry gamma LUT on clamped linear values: max quantization error
  // ~0.02% of full scale, indistinguishable after the +0.5 rounding for all
  // but values on bucket edges; exact pow() for safety instead.
  char* w = out;
  char* end = out + cap;
  for (long long i = 0; i < n; i++) {
    long long idx = reverse ? (n - 1 - i) : i;
    const float* px = pixels + idx * 3;
    if (end - w < 13) return -1;
    for (int k = 0; k < 3; k++) {
      float v = px[k];
      v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
      int q = static_cast<int>(255.0 * std::pow(v, 1.0 / 2.2) + 0.5);
      w += sprintf(w, "%d ", q);
    }
  }
  return w - out;
}

// ---------------------------------------------------------------------------
// FNV-1a 64-bit over the f32 bit patterns (hashing.py parity).
// ---------------------------------------------------------------------------

unsigned long long pt_hash_image(const float* data, long long n_floats) {
  const unsigned char* bytes = reinterpret_cast<const unsigned char*>(data);
  unsigned long long h = 0xCBF29CE484222325ULL;
  for (long long i = 0; i < n_floats * 4; i++) {
    h ^= bytes[i];
    h *= 0x100000001B3ULL;
  }
  return h;
}

// ---------------------------------------------------------------------------
// 30-bit Morton codes for LBVH construction (points pre-normalized to [0,1)).
// ---------------------------------------------------------------------------

namespace {
inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}
}  // namespace

void pt_morton3d(const float* points01, long long n, uint32_t* out) {
  for (long long i = 0; i < n; i++) {
    const float* p = points01 + i * 3;
    uint32_t code = 0;
    uint32_t parts[3];
    for (int k = 0; k < 3; k++) {
      float v = p[k];
      v = v < 0.f ? 0.f : (v >= 1.f ? 0.99999994f : v);
      parts[k] = expand_bits(static_cast<uint32_t>(v * 1024.0f));
    }
    code = (parts[0] << 2) | (parts[1] << 1) | parts[2];
    out[i] = code;
  }
}

}  // extern "C"
