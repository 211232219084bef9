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
      if (names_len + len + 1 >= names_cap) {
        // Silently skipping a name would shift all later names relative
        // to quat/trans/cam_ids; fail so the caller uses the fallback.
        std::free(buf);
        return -1;
      }
      std::memcpy(names + names_len, name_start, len);
      names_len += len;
      names[names_len++] = '\n';
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

// --- COLMAP binary model format ---------------------------------------
// Little-endian, packed (no padding); spec: COLMAP src/colmap/scene/
// reconstruction_io.cc. Records are variable-length (per-point tracks,
// per-image keypoint tables), so parsing is a linear walk; all multi-
// byte reads go through memcpy (the buffers are unaligned).

namespace {

template <typename T>
inline bool rd(const char*& p, const char* end, T* out) {
  if (p + sizeof(T) > end) return false;
  std::memcpy(out, p, sizeof(T));
  p += sizeof(T);
  return true;
}

}  // namespace

extern "C" {

// Parse COLMAP points3D.bin. Same two-pass protocol as the text parser:
// pass 1 (xyz == nullptr) returns the point count (from the header);
// pass 2 fills xyz (n*3 f32) and rgb (n*3 f32 in [0,1]).
int64_t hugs_parse_points3d_bin(const char* path, float* xyz, float* rgb,
                                int64_t capacity) {
  size_t size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  const char* p = buf;
  const char* end = buf + size;
  uint64_t n = 0;
  if (!rd(p, end, &n)) { std::free(buf); return -1; }
  if (xyz == nullptr) { std::free(buf); return static_cast<int64_t>(n); }
  int64_t filled = 0;
  for (uint64_t i = 0; i < n && filled < capacity; ++i) {
    int64_t id;
    double x, y, z, err;
    uint8_t r, g, b;
    uint64_t track_len;
    if (!rd(p, end, &id) || !rd(p, end, &x) || !rd(p, end, &y) ||
        !rd(p, end, &z) || !rd(p, end, &r) || !rd(p, end, &g) ||
        !rd(p, end, &b) || !rd(p, end, &err) || !rd(p, end, &track_len)) {
      std::free(buf);
      return -1;
    }
    // Compare against remaining bytes without multiplying the untrusted
    // count (8 * track_len could overflow the pointer arithmetic).
    if (track_len > static_cast<uint64_t>(end - p) / 8) {
      std::free(buf);
      return -1;
    }
    p += 8 * track_len;  // (i32 image_id, i32 point2d_idx) per element
    xyz[filled * 3 + 0] = static_cast<float>(x);
    xyz[filled * 3 + 1] = static_cast<float>(y);
    xyz[filled * 3 + 2] = static_cast<float>(z);
    rgb[filled * 3 + 0] = static_cast<float>(r / 255.0);
    rgb[filled * 3 + 1] = static_cast<float>(g / 255.0);
    rgb[filled * 3 + 2] = static_cast<float>(b / 255.0);
    ++filled;
  }
  std::free(buf);
  return filled;
}

// Parse COLMAP images.bin pose records, skipping keypoint tables.
// Same protocol as hugs_parse_images (two passes, '\n'-joined names).
int64_t hugs_parse_images_bin(const char* path, double* quat, double* trans,
                              int32_t* cam_ids, char* names,
                              int64_t names_cap, int64_t capacity) {
  size_t size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  const char* p = buf;
  const char* end = buf + size;
  uint64_t n = 0;
  if (!rd(p, end, &n)) { std::free(buf); return -1; }
  if (quat == nullptr) { std::free(buf); return static_cast<int64_t>(n); }
  int64_t filled = 0;
  int64_t names_len = 0;
  for (uint64_t i = 0; i < n && filled < capacity; ++i) {
    int32_t img_id, cam_id;
    double q[4], t[3];
    if (!rd(p, end, &img_id)) { std::free(buf); return -1; }
    for (int k = 0; k < 4; ++k)
      if (!rd(p, end, &q[k])) { std::free(buf); return -1; }
    for (int k = 0; k < 3; ++k)
      if (!rd(p, end, &t[k])) { std::free(buf); return -1; }
    if (!rd(p, end, &cam_id)) { std::free(buf); return -1; }
    const char* name_start = p;
    while (p < end && *p != '\0') ++p;
    if (p >= end) { std::free(buf); return -1; }
    int64_t len = p - name_start;
    ++p;  // skip NUL
    uint64_t n_pts = 0;
    if (!rd(p, end, &n_pts)) { std::free(buf); return -1; }
    if (n_pts > static_cast<uint64_t>(end - p) / 24) {
      std::free(buf);
      return -1;
    }
    p += 24 * n_pts;  // (f64 x, f64 y, i64 point3d_id) per keypoint
    for (int k = 0; k < 4; ++k) quat[filled * 4 + k] = q[k];
    for (int k = 0; k < 3; ++k) trans[filled * 3 + k] = t[k];
    cam_ids[filled] = cam_id;
    if (names_len + len + 1 >= names_cap) {
      // A skipped name while `filled` advances would misattribute every
      // later pose; fail so the caller falls back to the Python parser.
      std::free(buf);
      return -1;
    }
    std::memcpy(names + names_len, name_start, len);
    names_len += len;
    names[names_len++] = '\n';
    ++filled;
  }
  if (names != nullptr && names_len < names_cap) names[names_len] = '\0';
  std::free(buf);
  return filled;
}

}  // extern "C"
