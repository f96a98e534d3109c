// gridvision_host: native host-side runtime for the TPU engine.
//
// The reference's runtime shell is a C++ ROS 2 node: DDS subscriptions
// with latest-wins frame buffers (src/grid_vision_node.cpp:79-106),
// pcl::fromROSMsg ingestion, and RViz as the output surface. This library
// is its TPU-native counterpart: the pieces that must stay on the host
// (sensor ingestion, binary parsing, fixed-capacity packing for XLA,
// snapshot export) implemented natively and bound to Python via ctypes.
//
// Components:
//   1. Latest-frame mailboxes (single-producer single-consumer, overwrite
//      semantics == the reference's queue-depth-1 subscriptions).
//   2. PointCloud2-style binary -> fixed-capacity packed float32 arrays
//      (valid-first + sentinel padding, the layout types.PointCloud
//      expects), with non-finite filtering done in one pass.
//   3. A scalar occupancy-grid oracle (grid_map-exact index math, decay/
//      raster/clamp/sigmoid) for CPU parity checks of the XLA kernels.
//   4. PGM writer for grid snapshots (the headless replacement for the
//      reference's RViz occupancy display).
//
// Build: make -C runtime_cc   (produces libgridvision_host.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <shared_mutex>
#include <vector>

namespace {

constexpr float kPadSentinel = 1.0e8f;

// ---------------------------------------------------------------------------
// 1. Latest-frame mailbox
// ---------------------------------------------------------------------------
// Overwrite-on-write, read-latest: the DDS latest-frame semantics of the
// reference's image/cloud callbacks. A sequence lock lets the consumer
// detect torn reads without blocking the producer.

struct Mailbox {
  std::vector<uint8_t> buf[2];
  std::atomic<uint64_t> seq{0};   // even: stable; odd: writing
  std::atomic<int> latest{-1};
  std::mutex write_mu;
  uint64_t stamp_ns = 0;
};

constexpr int kMaxMailboxes = 64;
Mailbox g_mailboxes[kMaxMailboxes];

}  // namespace

extern "C" {

// Publish a frame into mailbox `id`. Returns the new sequence number.
uint64_t gv_mailbox_write(int id, const uint8_t* data, int64_t size,
                          uint64_t stamp_ns) {
  if (id < 0 || id >= kMaxMailboxes || size < 0) return 0;
  Mailbox& m = g_mailboxes[id];
  std::lock_guard<std::mutex> lock(m.write_mu);
  // latest is -1 before the first write; write into the other slot.
  int slot = m.latest.load(std::memory_order_relaxed) == 0 ? 1 : 0;
  m.buf[slot].assign(data, data + size);
  uint64_t s = m.seq.fetch_add(1, std::memory_order_acq_rel) + 1;
  m.latest.store(slot, std::memory_order_release);
  m.stamp_ns = stamp_ns;
  m.seq.fetch_add(1, std::memory_order_acq_rel);
  return s / 2 + 1;
}

// Read the latest frame. Returns bytes copied (0 if empty or `cap` too
// small; negative size means "tell me the size": returns required size).
int64_t gv_mailbox_read(int id, uint8_t* out, int64_t cap,
                        uint64_t* stamp_ns) {
  if (id < 0 || id >= kMaxMailboxes) return 0;
  Mailbox& m = g_mailboxes[id];
  for (int attempt = 0; attempt < 64; ++attempt) {
    uint64_t s0 = m.seq.load(std::memory_order_acquire);
    if (s0 & 1) continue;  // writer active
    int slot = m.latest.load(std::memory_order_acquire);
    if (slot < 0) return 0;
    const std::vector<uint8_t>& b = m.buf[slot];
    int64_t n = static_cast<int64_t>(b.size());
    if (cap < 0) return n;
    if (n > cap) return -n;
    std::memcpy(out, b.data(), n);
    if (stamp_ns) *stamp_ns = m.stamp_ns;
    uint64_t s1 = m.seq.load(std::memory_order_acquire);
    if (s0 == s1) return n;  // no tear
  }
  return 0;
}

uint64_t gv_mailbox_seq(int id) {
  if (id < 0 || id >= kMaxMailboxes) return 0;
  return g_mailboxes[id].seq.load(std::memory_order_acquire) / 2;
}

// ---------------------------------------------------------------------------
// 1b. Named shared-memory mailboxes (cross-process)
// ---------------------------------------------------------------------------
// File-backed seqlock mailboxes (mmap of a /dev/shm path): the transport
// that lets a *separate process* attach to a running engine session — the
// viewer's RViz-replacement feed (grid / markers / overlay channels) and
// multi-process sensor producers. Single-writer, any-reader.
//
// Layout (little-endian, 64-byte header + payload):
//   [0:8)   uint64 seq       even = stable, odd = write in progress
//   [8:16)  int64  size      payload bytes of the latest frame
//   [16:24) uint64 stamp_ns
//   [24:32) int64  capacity  max payload bytes
//   [32:40) uint64 magic     0x4756534853454d31 ("GVSHSEM1")
//   [40:64) reserved
//
// The Python runtime implements the identical layout with mmap as a
// fallback, so native and pure-Python endpoints interoperate.

}  // extern "C"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kShmMagic = 0x4756534853454d31ull;
constexpr int64_t kShmHeader = 64;

struct ShmBox {
  uint8_t* base = nullptr;   // mmap base (header)
  int64_t map_size = 0;
  bool writable = false;
};

constexpr int kMaxShmBoxes = 256;
ShmBox g_shm[kMaxShmBoxes];
std::mutex g_shm_mu;
// Per-handle reader/writer locks: capacity/read/write hold a shared lock
// for the duration of their access so a concurrent gv_shm_close (unique
// lock) cannot munmap the mapping out from under them.
std::shared_mutex g_shm_handle_mu[kMaxShmBoxes];

inline std::atomic<uint64_t>* shm_seq(ShmBox& b) {
  return reinterpret_cast<std::atomic<uint64_t>*>(b.base);
}

}  // namespace

extern "C" {

// Open (create=1: create/overwrite with `capacity`; create=0: attach to an
// existing mailbox, capacity read from its header). Returns a handle >= 0
// or a negative errno-style code.
int gv_shm_open(const char* path, int64_t capacity, int create) {
  int fd;
  int64_t map_size;
  if (create) {
    if (capacity <= 0) return -22;  // EINVAL
    fd = ::open(path, O_RDWR | O_CREAT, 0644);
    if (fd < 0) return -1;
    map_size = kShmHeader + capacity;
    if (::ftruncate(fd, map_size) != 0) {
      ::close(fd);
      return -2;
    }
  } else {
    fd = ::open(path, O_RDWR);
    if (fd < 0) return -1;
    struct stat st;
    if (::fstat(fd, &st) != 0 || st.st_size < kShmHeader) {
      ::close(fd);
      return -3;
    }
    map_size = st.st_size;
  }
  void* base = ::mmap(nullptr, map_size, PROT_READ | PROT_WRITE, MAP_SHARED,
                      fd, 0);
  ::close(fd);
  if (base == MAP_FAILED) return -4;
  uint8_t* p = static_cast<uint8_t*>(base);
  if (create) {
    std::memset(p, 0, kShmHeader);
    std::memcpy(p + 24, &capacity, 8);
    std::memcpy(p + 32, &kShmMagic, 8);
  } else {
    uint64_t magic;
    std::memcpy(&magic, p + 32, 8);
    int64_t cap;
    std::memcpy(&cap, p + 24, 8);
    if (magic != kShmMagic || cap <= 0 || kShmHeader + cap > map_size) {
      ::munmap(base, map_size);
      return -5;
    }
  }
  std::lock_guard<std::mutex> lock(g_shm_mu);
  for (int h = 0; h < kMaxShmBoxes; ++h) {
    if (g_shm[h].base == nullptr) {
      // Handle lock (lock order: g_shm_mu then handle, same as close)
      // so a stale-handled reader never sees a half-assigned slot.
      std::unique_lock<std::shared_mutex> hl(g_shm_handle_mu[h]);
      g_shm[h].base = p;
      g_shm[h].map_size = map_size;
      g_shm[h].writable = create != 0;
      return h;
    }
  }
  ::munmap(base, map_size);
  return -6;  // handle table full
}

int64_t gv_shm_capacity(int h) {
  if (h < 0 || h >= kMaxShmBoxes) return -1;
  std::shared_lock<std::shared_mutex> lock(g_shm_handle_mu[h]);
  if (g_shm[h].base == nullptr) return -1;
  int64_t cap;
  std::memcpy(&cap, g_shm[h].base + 24, 8);
  return cap;
}

// Publish a frame. Single writer per mailbox. Returns the frame sequence
// number (count of completed writes) or negative on error.
int64_t gv_shm_write(int h, const uint8_t* data, int64_t size,
                     uint64_t stamp_ns) {
  if (h < 0 || h >= kMaxShmBoxes || size < 0) return -1;
  std::shared_lock<std::shared_mutex> lock(g_shm_handle_mu[h]);
  if (g_shm[h].base == nullptr) return -1;
  ShmBox& b = g_shm[h];
  int64_t cap;
  std::memcpy(&cap, b.base + 24, 8);
  if (size > cap) return -2;
  std::atomic<uint64_t>* seq = shm_seq(b);
  uint64_t s = seq->fetch_add(1, std::memory_order_acq_rel) + 1;  // -> odd
  std::memcpy(b.base + 8, &size, 8);
  std::memcpy(b.base + 16, &stamp_ns, 8);
  std::memcpy(b.base + kShmHeader, data, size);
  seq->fetch_add(1, std::memory_order_acq_rel);                   // -> even
  return static_cast<int64_t>((s + 1) / 2);
}

// Read the latest frame. cap < 0: return required size without copying.
// Returns bytes copied, 0 if no frame yet, -needed if cap too small, or
// -1 on a bad handle. seq_out (optional) receives the frame sequence so
// readers can skip frames they have already seen.
int64_t gv_shm_read(int h, uint8_t* out, int64_t cap, uint64_t* stamp_ns,
                    uint64_t* seq_out) {
  if (h < 0 || h >= kMaxShmBoxes) return -1;
  std::shared_lock<std::shared_mutex> lock(g_shm_handle_mu[h]);
  if (g_shm[h].base == nullptr) return -1;
  ShmBox& b = g_shm[h];
  std::atomic<uint64_t>* seq = shm_seq(b);
  for (int attempt = 0; attempt < 1024; ++attempt) {
    uint64_t s0 = seq->load(std::memory_order_acquire);
    if (s0 == 0) return 0;   // never written
    if (s0 & 1) continue;    // writer active
    int64_t n;
    uint64_t stamp;
    std::memcpy(&n, b.base + 8, 8);
    std::memcpy(&stamp, b.base + 16, 8);
    if (cap < 0) return n;
    if (n > cap) return -n;
    std::memcpy(out, b.base + kShmHeader, n);
    uint64_t s1 = seq->load(std::memory_order_acquire);
    if (s0 == s1) {
      if (stamp_ns) *stamp_ns = stamp;
      if (seq_out) *seq_out = s0 / 2;
      return n;
    }
  }
  return 0;
}

void gv_shm_close(int h) {
  if (h < 0 || h >= kMaxShmBoxes) return;
  // Lock order: g_shm_mu then the handle lock (matches gv_shm_open).
  // The unique handle lock waits out any in-flight read/write on this
  // handle, and blocks new ones, before the munmap.
  std::lock_guard<std::mutex> lock(g_shm_mu);
  std::unique_lock<std::shared_mutex> handle_lock(g_shm_handle_mu[h]);
  if (g_shm[h].base != nullptr) {
    ::munmap(g_shm[h].base, g_shm[h].map_size);
    g_shm[h] = ShmBox{};
  }
}

// ---------------------------------------------------------------------------
// 2. Point-cloud packing
// ---------------------------------------------------------------------------
// Parse an interleaved binary point blob (PointCloud2-style: `stride`
// bytes per point, float32 x/y/z at `xyz_off`, optional float32 intensity
// at `int_off`, -1 if absent), drop non-finite points, pack valid-first
// into (capacity, 3) xyz + (capacity,) intensity with sentinel padding.
// Returns the number of valid points packed.
int64_t gv_pack_cloud(const uint8_t* blob, int64_t n_points, int stride,
                      int xyz_off, int int_off, float* out_xyz,
                      float* out_intensity, int64_t capacity) {
  int64_t n = 0;
  for (int64_t i = 0; i < n_points && n < capacity; ++i) {
    const uint8_t* p = blob + i * stride;
    float xyz[3];
    std::memcpy(xyz, p + xyz_off, 12);
    if (!std::isfinite(xyz[0]) || !std::isfinite(xyz[1]) ||
        !std::isfinite(xyz[2]))
      continue;
    out_xyz[n * 3 + 0] = xyz[0];
    out_xyz[n * 3 + 1] = xyz[1];
    out_xyz[n * 3 + 2] = xyz[2];
    if (int_off >= 0) {
      float inten;
      std::memcpy(&inten, p + int_off, 4);
      out_intensity[n] = std::isfinite(inten) ? inten : 0.0f;
    } else {
      out_intensity[n] = 0.0f;
    }
    ++n;
  }
  for (int64_t i = n; i < capacity; ++i) {
    out_xyz[i * 3 + 0] = kPadSentinel;
    out_xyz[i * 3 + 1] = kPadSentinel;
    out_xyz[i * 3 + 2] = kPadSentinel;
    out_intensity[i] = 0.0f;
  }
  return n;
}

// Same, applying a 4x4 row-major rigid transform while packing (fuses the
// reference's transformLidarToCamera host pass into ingest).
int64_t gv_pack_cloud_transform(const uint8_t* blob, int64_t n_points,
                                int stride, int xyz_off, int int_off,
                                const float* T_rowmajor, float* out_xyz,
                                float* out_intensity, int64_t capacity) {
  const float* T = T_rowmajor;
  int64_t n = 0;
  for (int64_t i = 0; i < n_points && n < capacity; ++i) {
    const uint8_t* p = blob + i * stride;
    float v[3];
    std::memcpy(v, p + xyz_off, 12);
    if (!std::isfinite(v[0]) || !std::isfinite(v[1]) || !std::isfinite(v[2]))
      continue;
    out_xyz[n * 3 + 0] = T[0] * v[0] + T[1] * v[1] + T[2] * v[2] + T[3];
    out_xyz[n * 3 + 1] = T[4] * v[0] + T[5] * v[1] + T[6] * v[2] + T[7];
    out_xyz[n * 3 + 2] = T[8] * v[0] + T[9] * v[1] + T[10] * v[2] + T[11];
    if (int_off >= 0) {
      float inten;
      std::memcpy(&inten, p + int_off, 4);
      out_intensity[n] = std::isfinite(inten) ? inten : 0.0f;
    } else {
      out_intensity[n] = 0.0f;
    }
    ++n;
  }
  for (int64_t i = n; i < capacity; ++i) {
    out_xyz[i * 3 + 0] = kPadSentinel;
    out_xyz[i * 3 + 1] = kPadSentinel;
    out_xyz[i * 3 + 2] = kPadSentinel;
    out_intensity[i] = 0.0f;
  }
  return n;
}

// ---------------------------------------------------------------------------
// 3. Occupancy-grid oracle (scalar reference implementation)
// ---------------------------------------------------------------------------
// Exact grid_map index math + the engine's update order (decay -> per-box
// inclusive block += hit -> clamp -> sigmoid). Used by tests to cross-
// check the XLA rasterizer from a second, independent implementation.

struct GridGeom {
  int size_x, size_y;
  float max_x, max_y;  // max corner position
  float res;
};

static bool grid_index(const GridGeom& g, float px, float py, int* ix,
                       int* iy) {
  float fx = std::floor((g.max_x - px) / g.res);
  float fy = std::floor((g.max_y - py) / g.res);
  int x = static_cast<int>(fx), y = static_cast<int>(fy);
  if (x < 0 || x >= g.size_x || y < 0 || y >= g.size_y) return false;
  *ix = x;
  *iy = y;
  return true;
}

// boxes: n x 4 floats (px, py, length, width). log_odds updated in place,
// occupancy written. Geometry: (size_x, size_y, center_x, center_y,
// length_x, length_y, resolution) then constants (decay, hit, lo_min,
// lo_max).
void gv_grid_update(float* log_odds, float* occupancy, int size_x,
                    int size_y, float center_x, float center_y,
                    float length_x, float length_y, float res,
                    const float* boxes, int n_boxes, float decay, float hit,
                    float lo_min, float lo_max) {
  GridGeom g{size_x, size_y, center_x + 0.5f * length_x,
             center_y + 0.5f * length_y, res};
  int64_t cells = static_cast<int64_t>(size_x) * size_y;
  for (int64_t i = 0; i < cells; ++i) log_odds[i] += decay;
  for (int b = 0; b < n_boxes; ++b) {
    float px = boxes[b * 4 + 0], py = boxes[b * 4 + 1];
    float hl = boxes[b * 4 + 2] / 2.0f, hw = boxes[b * 4 + 3] / 2.0f;
    float cx[4] = {px + hl, px + hl, px - hl, px - hl};
    float cy[4] = {py - hw, py + hw, py - hw, py + hw};
    int min_x = 0, min_y = 0, max_x = 0, max_y = 0;
    bool ok = true;
    for (int c = 0; c < 4 && ok; ++c) {
      int ix, iy;
      ok = grid_index(g, cx[c], cy[c], &ix, &iy);
      if (!ok) break;
      if (c == 0) {
        min_x = max_x = ix;
        min_y = max_y = iy;
      } else {
        min_x = std::min(min_x, ix);
        min_y = std::min(min_y, iy);
        max_x = std::max(max_x, ix);
        max_y = std::max(max_y, iy);
      }
    }
    if (!ok) continue;  // any off-map corner skips the whole box
    for (int x = min_x; x <= max_x; ++x)
      for (int y = min_y; y <= max_y; ++y)
        log_odds[static_cast<int64_t>(x) * size_y + y] += hit;
  }
  for (int64_t i = 0; i < cells; ++i) {
    float v = std::min(std::max(log_odds[i], lo_min), lo_max);
    log_odds[i] = v;
    occupancy[i] = 1.0f / (1.0f + std::exp(-v));
  }
}

// ---------------------------------------------------------------------------
// 4. Grid snapshot writer (PGM, headless RViz replacement)
// ---------------------------------------------------------------------------
int gv_write_pgm(const char* path, const int8_t* grid, int rows, int cols) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f, "P5\n%d %d\n255\n", cols, rows);
  std::vector<uint8_t> row(cols);
  for (int r = 0; r < rows; ++r) {
    for (int c = 0; c < cols; ++c) {
      int v = grid[static_cast<int64_t>(r) * cols + c];
      row[c] = static_cast<uint8_t>(
          v < 0 ? 127 : 255 - (v * 255) / 100);  // occupied -> dark
    }
    std::fwrite(row.data(), 1, cols, f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
