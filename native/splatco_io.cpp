// splatco_io — native data-path helpers (C ABI, consumed via ctypes).
//
// The reference framework's ingest path parses COLMAP binary files with
// per-record Python struct loops (/root/reference/scene/colmap_loader.py);
// on Mill-19-scale reconstructions (10M+ points3D records with variable-
// length tracks) that costs minutes.  These parsers are single-pass C++
// over an mmap'd buffer.
//
// Exposed C ABI (all return 0 on success, negative on error):
//   splatco_points3d_count(data, len, *n_points)
//   splatco_points3d_parse(data, len, xyz[n*3] f64, rgb[n*3] u8,
//                          err[n] f64)
//   splatco_images_count(data, len, *n_images, *total_name_bytes,
//                        *total_pts2d)
//   splatco_images_parse(data, len, image_id[n] i32, qvec[n*4] f64,
//                        tvec[n*3] f64, camera_id[n] i32,
//                        name_offsets[n+1] i64, names[bytes] char,
//                        pts2d_offsets[n+1] i64, xys[total*2] f64,
//                        point3d_ids[total] i64)
//
// Build: make -C native   (produces libsplatco_io.so)

#include <cstdint>
#include <cstring>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  template <typename T>
  T read() {
    if (p + sizeof(T) > end) {
      ok = false;
      return T{};
    }
    T v;
    std::memcpy(&v, p, sizeof(T));
    p += sizeof(T);
    return v;
  }

  bool skip(size_t n) {
    if (p + n > end) {
      ok = false;
      return false;
    }
    p += n;
    return true;
  }
};

}  // namespace

extern "C" {

int splatco_points3d_count(const uint8_t* data, int64_t len,
                           int64_t* n_points) {
  Cursor c{data, data + len};
  const uint64_t n = c.read<uint64_t>();
  if (!c.ok) return -1;
  *n_points = static_cast<int64_t>(n);
  return 0;
}

int splatco_points3d_parse(const uint8_t* data, int64_t len, double* xyz,
                           uint8_t* rgb, double* err) {
  Cursor c{data, data + len};
  const uint64_t n = c.read<uint64_t>();
  for (uint64_t i = 0; i < n; ++i) {
    c.skip(8);  // point id
    xyz[i * 3 + 0] = c.read<double>();
    xyz[i * 3 + 1] = c.read<double>();
    xyz[i * 3 + 2] = c.read<double>();
    rgb[i * 3 + 0] = c.read<uint8_t>();
    rgb[i * 3 + 1] = c.read<uint8_t>();
    rgb[i * 3 + 2] = c.read<uint8_t>();
    err[i] = c.read<double>();
    const uint64_t track = c.read<uint64_t>();
    if (!c.skip(track * 8)) return -2;
    if (!c.ok) return -3;
  }
  return 0;
}

int splatco_images_count(const uint8_t* data, int64_t len,
                         int64_t* n_images, int64_t* total_name_bytes,
                         int64_t* total_pts2d) {
  Cursor c{data, data + len};
  const uint64_t n = c.read<uint64_t>();
  int64_t names = 0, pts = 0;
  for (uint64_t i = 0; i < n && c.ok; ++i) {
    c.skip(4 + 32 + 24 + 4);  // id, qvec, tvec, camera_id
    while (c.p < c.end && *c.p != 0) {
      ++c.p;
      ++names;
    }
    if (!c.skip(1)) return -2;  // NUL
    const uint64_t np = c.read<uint64_t>();
    pts += static_cast<int64_t>(np);
    if (!c.skip(np * 24)) return -3;
  }
  if (!c.ok) return -4;
  *n_images = static_cast<int64_t>(n);
  *total_name_bytes = names;
  *total_pts2d = pts;
  return 0;
}

int splatco_images_parse(const uint8_t* data, int64_t len,
                         int32_t* image_id, double* qvec, double* tvec,
                         int32_t* camera_id, int64_t* name_offsets,
                         char* names, int64_t* pts2d_offsets, double* xys,
                         int64_t* point3d_ids) {
  Cursor c{data, data + len};
  const uint64_t n = c.read<uint64_t>();
  int64_t name_pos = 0, pt_pos = 0;
  for (uint64_t i = 0; i < n; ++i) {
    image_id[i] = c.read<int32_t>();
    for (int k = 0; k < 4; ++k) qvec[i * 4 + k] = c.read<double>();
    for (int k = 0; k < 3; ++k) tvec[i * 3 + k] = c.read<double>();
    camera_id[i] = c.read<int32_t>();
    name_offsets[i] = name_pos;
    while (c.p < c.end && *c.p != 0) names[name_pos++] = *c.p++;
    if (!c.skip(1)) return -2;
    const uint64_t np = c.read<uint64_t>();
    pts2d_offsets[i] = pt_pos;
    for (uint64_t j = 0; j < np; ++j) {
      xys[(pt_pos + j) * 2 + 0] = c.read<double>();
      xys[(pt_pos + j) * 2 + 1] = c.read<double>();
      point3d_ids[pt_pos + j] = c.read<int64_t>();
    }
    pt_pos += static_cast<int64_t>(np);
    if (!c.ok) return -3;
  }
  name_offsets[n] = name_pos;
  pts2d_offsets[n] = pt_pos;
  return 0;
}

}  // extern "C"
