// Native host-side IO + preprocessing for the SLAM pipeline.
//
// The reference's data path is C++ (pcl::io readers, kittiHelper's fstream
// .bin loader src/kittiHelper.cpp:130-151, pcl::VoxelGrid filters); this
// library is the equivalent for the TPU host runtime: zero-copy .bin
// loading, binary-PCD parsing, and a hash-based centroid voxel filter, all
// exposed with a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: native/build.sh -> native/libscaloam_io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// Reads a KITTI velodyne .bin (float32 x,y,z,i). Returns #points, fills
// *out with a malloc'd buffer the caller frees via scaloam_free.
int64_t scaloam_read_bin(const char* path, float** out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  int64_t n = size / (4 * sizeof(float));
  float* buf = static_cast<float*>(std::malloc(n * 4 * sizeof(float)));
  size_t got = std::fread(buf, sizeof(float), n * 4, f);
  std::fclose(f);
  if (got != static_cast<size_t>(n * 4)) {
    std::free(buf);
    return -1;
  }
  *out = buf;
  return n;
}

void scaloam_free(void* p) { std::free(p); }

// Binary PCD fast path: parses the header for FIELDS x y z [intensity]
// float32 and returns the point block. Returns #points and #fields.
int64_t scaloam_read_pcd(const char* path, float** out, int32_t* n_fields) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t n = -1;
  int fields = 0;
  bool binary = false;
  while (std::fgets(line, sizeof(line), f)) {
    if (std::strncmp(line, "FIELDS", 6) == 0) {
      for (char* p = line + 6; *p; ++p)
        if (*p == ' ' && *(p + 1) != '\n' && *(p + 1) != 0) ++fields;
    } else if (std::strncmp(line, "POINTS", 6) == 0) {
      n = std::strtoll(line + 7, nullptr, 10);
    } else if (std::strncmp(line, "DATA", 4) == 0) {
      binary = std::strncmp(line + 5, "binary", 6) == 0;
      break;
    }
  }
  if (n < 0 || !binary || fields <= 0) {
    std::fclose(f);
    return -1;
  }
  float* buf = static_cast<float*>(std::malloc(n * fields * sizeof(float)));
  size_t got = std::fread(buf, sizeof(float), n * fields, f);
  std::fclose(f);
  if (got != static_cast<size_t>(n * fields)) {
    std::free(buf);
    return -1;
  }
  *out = buf;
  *n_fields = fields;
  return n;
}

// Centroid voxel-grid filter (pcl::VoxelGrid semantics). In-place output
// buffer `out` must hold n*3 floats; returns the number of output points.
int64_t scaloam_voxel_filter(const float* pts, int64_t n, int stride,
                             float leaf, float* out) {
  struct Cell {
    double x = 0, y = 0, z = 0;
    int64_t count = 0;
  };
  std::unordered_map<uint64_t, Cell> cells;
  cells.reserve(static_cast<size_t>(n / 4 + 16));
  const double inv = 1.0 / leaf;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * stride;
    if (!std::isfinite(p[0]) || !std::isfinite(p[1]) || !std::isfinite(p[2]))
      continue;
    int64_t cx = static_cast<int64_t>(std::floor(p[0] * inv));
    int64_t cy = static_cast<int64_t>(std::floor(p[1] * inv));
    int64_t cz = static_cast<int64_t>(std::floor(p[2] * inv));
    uint64_t key = (static_cast<uint64_t>(cx & 0x1FFFFF) << 42) |
                   (static_cast<uint64_t>(cy & 0x1FFFFF) << 21) |
                   (static_cast<uint64_t>(cz & 0x1FFFFF));
    Cell& c = cells[key];
    c.x += p[0];
    c.y += p[1];
    c.z += p[2];
    c.count += 1;
  }
  int64_t m = 0;
  for (const auto& kv : cells) {
    const Cell& c = kv.second;
    out[m * 3 + 0] = static_cast<float>(c.x / c.count);
    out[m * 3 + 1] = static_cast<float>(c.y / c.count);
    out[m * 3 + 2] = static_cast<float>(c.z / c.count);
    ++m;
  }
  return m;
}

// Range filter + finite check (removeClosedPointCloud equivalent,
// src/scanRegistration.cpp:88-114). Compacts xyz rows >= min_range.
int64_t scaloam_range_filter(const float* pts, int64_t n, int stride,
                             float min_range, float* out) {
  const float mr2 = min_range * min_range;
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * stride;
    if (!std::isfinite(p[0]) || !std::isfinite(p[1]) || !std::isfinite(p[2]))
      continue;
    float r2 = p[0] * p[0] + p[1] * p[1] + p[2] * p[2];
    if (r2 < mr2) continue;
    out[m * 3 + 0] = p[0];
    out[m * 3 + 1] = p[1];
    out[m * 3 + 2] = p[2];
    ++m;
  }
  return m;
}

}  // extern "C"
