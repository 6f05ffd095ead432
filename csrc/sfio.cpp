// sfio — native IO/runtime support for slam_sensor_fusion_tpu.
//
// The reference's host-side runtime is C++ (PCL PCD IO, dirent scans,
// message_filters time sync); this library is the TPU build's native
// equivalent: a fast binary PCD parser/writer, Morton-code computation +
// argsort for loader pre-sorting, and an approximate-time stream aligner.
// Exposed as a plain C ABI consumed from Python via ctypes
// (slam_sensor_fusion_tpu/utils/native.py), with a NumPy fallback when the
// library is not built.
//
// Build: make -C csrc   (produces libsfio.so next to this file)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PCD IO (xyz float32; binary or ascii DATA, extra fields skipped)
// ---------------------------------------------------------------------------

// Parses the PCD at `path`. On success returns the number of points and
// fills `out` (caller-allocated, capacity `cap` points, xyz interleaved).
// Pass cap=0/out=null to query the size. Returns -1 on error.
long long sfio_read_pcd(const char* path, float* out, long long cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  long long n_points = -1;
  std::vector<std::string> fields;
  std::vector<int> sizes;
  std::vector<char> types;
  std::vector<int> counts;
  bool binary = false;
  char line[4096];

  while (fgets(line, sizeof(line), f)) {
    if (line[0] == '#') continue;
    char key[64];
    if (sscanf(line, "%63s", key) != 1) continue;
    if (strcmp(key, "FIELDS") == 0) {
      char* p = line + strlen("FIELDS");
      char name[64];
      int off = 0;
      while (sscanf(p, "%63s%n", name, &off) == 1) {
        fields.push_back(name);
        p += off;
      }
    } else if (strcmp(key, "SIZE") == 0) {
      char* p = line + strlen("SIZE");
      int v, off;
      while (sscanf(p, "%d%n", &v, &off) == 1) { sizes.push_back(v); p += off; }
    } else if (strcmp(key, "TYPE") == 0) {
      char* p = line + strlen("TYPE");
      char c; int off;
      while (sscanf(p, " %c%n", &c, &off) == 1) { types.push_back(c); p += off; }
    } else if (strcmp(key, "COUNT") == 0) {
      char* p = line + strlen("COUNT");
      int v, off;
      while (sscanf(p, "%d%n", &v, &off) == 1) { counts.push_back(v); p += off; }
    } else if (strcmp(key, "POINTS") == 0) {
      sscanf(line, "POINTS %lld", &n_points);
    } else if (strcmp(key, "DATA") == 0) {
      char mode[32];
      sscanf(line, "DATA %31s", mode);
      binary = strcmp(mode, "binary") == 0;
      if (!binary && strcmp(mode, "ascii") != 0) { fclose(f); return -1; }
      break;
    }
  }
  if (n_points < 0 || fields.empty()) { fclose(f); return -1; }
  if (counts.empty()) counts.assign(fields.size(), 1);
  if (sizes.size() != fields.size() || types.size() != fields.size()) {
    fclose(f);
    return -1;
  }

  // locate x/y/z byte offsets within a record
  long long stride = 0;
  long long off_xyz[3] = {-1, -1, -1};
  int col_xyz[3] = {-1, -1, -1};
  int col = 0;
  for (size_t i = 0; i < fields.size(); ++i) {
    for (int c = 0; c < counts[i]; ++c) {
      if (c == 0 && types[i] == 'F' && sizes[i] == 4) {
        if (fields[i] == "x") { off_xyz[0] = stride; col_xyz[0] = col; }
        if (fields[i] == "y") { off_xyz[1] = stride; col_xyz[1] = col; }
        if (fields[i] == "z") { off_xyz[2] = stride; col_xyz[2] = col; }
      }
      stride += sizes[i];
      ++col;
    }
  }
  if (off_xyz[0] < 0 || off_xyz[1] < 0 || off_xyz[2] < 0) { fclose(f); return -1; }

  if (!out || cap <= 0) { fclose(f); return n_points; }
  long long n = std::min(n_points, cap);

  if (binary) {
    std::vector<char> buf(static_cast<size_t>(stride) * n);
    if (fread(buf.data(), 1, buf.size(), f) != buf.size()) { fclose(f); return -1; }
    for (long long i = 0; i < n; ++i) {
      const char* rec = buf.data() + i * stride;
      memcpy(&out[i * 3 + 0], rec + off_xyz[0], 4);
      memcpy(&out[i * 3 + 1], rec + off_xyz[1], 4);
      memcpy(&out[i * 3 + 2], rec + off_xyz[2], 4);
    }
  } else {
    int total_cols = col;
    std::vector<double> row(total_cols);
    for (long long i = 0; i < n; ++i) {
      for (int c = 0; c < total_cols; ++c) {
        if (fscanf(f, "%lf", &row[c]) != 1) { fclose(f); return -1; }
      }
      out[i * 3 + 0] = static_cast<float>(row[col_xyz[0]]);
      out[i * 3 + 1] = static_cast<float>(row[col_xyz[1]]);
      out[i * 3 + 2] = static_cast<float>(row[col_xyz[2]]);
    }
  }
  fclose(f);
  return n;
}

// Writes an (n,3) float32 cloud as binary PCD. Returns 0 on success.
int sfio_write_pcd(const char* path, const float* pts, long long n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f,
          "# .PCD v0.7 - Point Cloud Data file format\n"
          "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
          "COUNT 1 1 1\nWIDTH %lld\nHEIGHT 1\n"
          "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS %lld\nDATA binary\n",
          n, n);
  size_t want = static_cast<size_t>(n) * 3;
  int ok = fwrite(pts, sizeof(float), want, f) == want ? 0 : -1;
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// Morton pre-sort (loader hot path)
// ---------------------------------------------------------------------------

static inline uint64_t spread10(uint64_t v) {
  v &= 0x3FF;
  v = (v | (v << 16)) & 0x030000FFull;
  v = (v | (v << 8)) & 0x0300F00Full;
  v = (v | (v << 4)) & 0x030C30C3ull;
  v = (v | (v << 2)) & 0x09249249ull;
  return v;
}

// Sorts (n,3) points by 30-bit Morton code in place of `out` (may alias
// pts). Matches ops/morton.sort_points_numpy exactly (stable order).
void sfio_morton_sort(const float* pts, long long n, float* out) {
  if (n <= 0) return;
  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (long long i = 1; i < n; ++i) {
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], pts[i * 3 + a]);
      hi[a] = std::max(hi[a], pts[i * 3 + a]);
    }
  }
  float ext[3];
  for (int a = 0; a < 3; ++a) ext[a] = std::max(hi[a] - lo[a], 1e-6f);

  std::vector<std::pair<uint64_t, long long>> keys(n);
  for (long long i = 0; i < n; ++i) {
    uint64_t code = 0;
    for (int a = 0; a < 3; ++a) {
      // match numpy: int64 truncation then clip
      long long q = static_cast<long long>((pts[i * 3 + a] - lo[a]) / ext[a] * 1024.0f);
      q = std::max(0ll, std::min(q, 1023ll));
      code |= spread10(static_cast<uint64_t>(q)) << a;
    }
    keys[i] = {code, i};
  }
  std::stable_sort(keys.begin(), keys.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  std::vector<float> tmp(static_cast<size_t>(n) * 3);
  for (long long i = 0; i < n; ++i) {
    const float* src = pts + keys[i].second * 3;
    memcpy(&tmp[i * 3], src, 3 * sizeof(float));
  }
  memcpy(out, tmp.data(), tmp.size() * sizeof(float));
}

// ---------------------------------------------------------------------------
// Frame paging: the fast pipeline's whole per-frame host staging in one
// call (models/pipeline_fast.build_paged_frames loop body) — uniform
// subsample in original scan order, radius crop, Morton sort, (nSt, 3,
// TM) page pack with sentinels, per-tile bbox/count. The Python loop
// over frames costs ~ms/frame in NumPy; this is the native loader path.
// ---------------------------------------------------------------------------

// pts: (n, 3) raw scan. Writes pages (nSt*3*TM), lo/hi (nSt*3), cnt
// (nSt) where nSt = S / TM. Returns kept-point count (<= S), -1 on bad
// args. Semantics match build_paged_frames exactly (verified by
// tests/test_io.py::test_native_page_frame_matches_numpy_staging).
long long sfio_page_frame(const float* pts, long long n, long long step,
                          float radius, long long S, long long TM,
                          float sentinel, float* pages, float* lo, float* hi,
                          int* cnt) {
  if (S <= 0 || TM <= 0 || S % TM) return -1;
  const long long nSt = S / TM;

  // subsample (only when the scan has at least `step` points — parity
  // with build_paged_frames / localization_node.cpp:292)
  std::vector<float> kept;
  kept.reserve(static_cast<size_t>(std::min(n, S)) * 3);
  const long long stride = (step > 1 && n >= step) ? step : 1;
  const float r2 = radius * radius;
  for (long long i = 0; i < n; i += stride) {
    const float x = pts[i * 3], y = pts[i * 3 + 1], z = pts[i * 3 + 2];
    if (x * x + y * y + z * z <= r2) {
      kept.push_back(x);
      kept.push_back(y);
      kept.push_back(z);
    }
  }
  long long m = static_cast<long long>(kept.size() / 3);
  if (m > 1) sfio_morton_sort(kept.data(), m, kept.data());
  if (m > S) m = S;

  // page pack: buf row t*TM+i -> pages[t][axis][i]
  for (long long t = 0; t < nSt; ++t) {
    const long long base = t * 3 * TM;
    long long c = m - t * TM;
    c = std::max(0ll, std::min(c, TM));
    cnt[t] = static_cast<int>(c);
    for (int a = 0; a < 3; ++a) {
      float bl = 0.0f, bh = 0.0f;
      float* row = pages + base + a * TM;
      if (c > 0) {
        bl = kept[(t * TM) * 3 + a];
        bh = bl;
      }
      for (long long i = 0; i < TM; ++i) {
        const long long src = t * TM + i;
        if (src < m) {
          const float v = kept[src * 3 + a];
          row[i] = v;
          bl = std::min(bl, v);
          bh = std::max(bh, v);
        } else {
          row[i] = sentinel;
        }
      }
      lo[t * 3 + a] = bl;
      hi[t * 3 + a] = bh;
    }
  }
  return m;
}

// ---------------------------------------------------------------------------
// Approximate-time alignment (C13 equivalent; see utils/timesync.py)
// ---------------------------------------------------------------------------

// For each query time, writes the index of the nearest stream sample and
// whether |dt| <= slop. Streams must be sorted ascending.
void sfio_nearest_within(const double* query, long long nq, const double* stream,
                         long long ns, double slop, long long* idx_out,
                         uint8_t* ok_out) {
  for (long long i = 0; i < nq; ++i) {
    if (ns == 0) { idx_out[i] = 0; ok_out[i] = 0; continue; }
    const double* it = std::lower_bound(stream, stream + ns, query[i]);
    long long right = std::min<long long>(it - stream, ns - 1);
    long long left = std::max<long long>(right - 1, 0);
    long long best = (std::abs(query[i] - stream[left]) <=
                      std::abs(stream[right] - query[i]))
                         ? left
                         : right;
    idx_out[i] = best;
    ok_out[i] = std::abs(stream[best] - query[i]) <= slop ? 1 : 0;
  }
}

}  // extern "C"
