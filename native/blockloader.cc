// blockloader — native data-loading core for gfs3dseg_gws_tpu.
//
// TPU-native equivalent of the reference's torch DataLoader worker pool
// (SURVEY.md §2.3): a C++ thread pool that mmaps block .npy files, samples
// fixed-size point sets (uniform or class-coverage-aware), computes the
// xyzrgbXYZ attribute layout and labels, applies augmentation, and assembles
// ready (B, N, 9) float32 batches while the device computes.
//
// Exposed as a plain C ABI consumed via ctypes (native/__init__.py).
// Sampling semantics mirror gfs3dseg_gws_tpu/data/sampler.py (which mirrors
// reference dataloaders/loader.py:39-151); randomness uses a splitmix64/
// xoshiro256** stream seeded per (seed, epoch, index) so batches are
// deterministic for a given seed without any cross-thread coupling.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// RNG: splitmix64 seeding + xoshiro256**
// ---------------------------------------------------------------------------
struct Rng {
  uint64_t s[4];

  explicit Rng(uint64_t seed) {
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9e3779b97f4a7c15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      s[i] = z ^ (z >> 31);
    }
  }

  static uint64_t rotl(uint64_t v, int k) { return (v << k) | (v >> (64 - k)); }

  uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }

  // uniform in [0, n)
  uint64_t below(uint64_t n) { return next() % n; }

  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }

  double normal() {
    // Box-Muller
    double u1 = uniform(), u2 = uniform();
    if (u1 < 1e-300) u1 = 1e-300;
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(2.0 * M_PI * u2);
  }

  // Fisher-Yates partial shuffle based choice without replacement
  void choice_no_replace(int64_t n, int64_t k, std::vector<int64_t>* out) {
    std::vector<int64_t> pool(n);
    for (int64_t i = 0; i < n; ++i) pool[i] = i;
    out->resize(k);
    for (int64_t i = 0; i < k; ++i) {
      int64_t j = i + static_cast<int64_t>(below(n - i));
      std::swap(pool[i], pool[j]);
      (*out)[i] = pool[i];
    }
  }
};

// ---------------------------------------------------------------------------
// Minimal .npy reader (supports <f8 / <f4, C-order, 1-2 dims)
// ---------------------------------------------------------------------------
struct NpyArray {
  std::vector<double> data;  // always widened to double
  int64_t rows = 0, cols = 0;
};

bool load_npy(const std::string& path, NpyArray* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[6];
  f.read(magic, 6);
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  unsigned char ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t header_len = 0;
  if (ver[0] == 1) {
    uint16_t len16;
    f.read(reinterpret_cast<char*>(&len16), 2);
    header_len = len16;
  } else {
    f.read(reinterpret_cast<char*>(&header_len), 4);
  }
  std::string header(header_len, '\0');
  f.read(&header[0], header_len);

  const bool f8 = header.find("<f8") != std::string::npos;
  const bool f4 = header.find("<f4") != std::string::npos;
  if (!f8 && !f4) return false;
  if (header.find("'fortran_order': True") != std::string::npos) return false;

  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return false;
  size_t lp = header.find('(', sp), rp = header.find(')', sp);
  std::string shape = header.substr(lp + 1, rp - lp - 1);
  int64_t rows = 0, cols = 1, d3 = 0;
  int ndim = sscanf(shape.c_str(), "%ld, %ld, %ld", &rows, &cols, &d3);
  if (ndim < 1) return false;
  // reject >2-D arrays: reading only the first two entries would silently
  // reinterpret an (a, b, c) file as valid (a, b) data
  if (ndim >= 3) return false;
  if (cols == 0) cols = 1;

  const int64_t n = rows * cols;
  out->rows = rows;
  out->cols = cols;
  out->data.resize(n);
  if (f8) {
    f.read(reinterpret_cast<char*>(out->data.data()), n * 8);
  } else {
    std::vector<float> tmp(n);
    f.read(reinterpret_cast<char*>(tmp.data()), n * 4);
    for (int64_t i = 0; i < n; ++i) out->data[i] = tmp[i];
  }
  return static_cast<bool>(f);
}

// ---------------------------------------------------------------------------
// Sampling (mirrors data/sampler.py::sample_pointcloud)
// ---------------------------------------------------------------------------
struct AugmentConfig {
  double scale = 0.0;       // >1 enables uniform zoom in [1/scale, scale]
  int rot = 0;              // 1 enables z rotation
  double mirror_prob = 0.0;
  int jitter = 0;
};

struct SampleRequest {
  int64_t num_point = 2048;
  int augment = 0;
  AugmentConfig aug;
  // label mode: 0 = learning-order (+1, bg=0) over sampled_classes,
  //             1 = index into sampled_classes (use_all_classes),
  //             2 = binary mask of target_class (support)
  int label_mode = 0;
  int64_t target_class = 0;          // for label_mode 2 / coverage sampling
  int coverage_sampling = 0;         // 1 = class-coverage-aware
  const int64_t* sampled_classes = nullptr;
  int64_t n_sampled_classes = 0;
};

void matmul3(const double m[9], double* xyz) {
  double x = xyz[0], y = xyz[1], z = xyz[2];
  xyz[0] = m[0] * x + m[1] * y + m[2] * z;
  xyz[1] = m[3] * x + m[4] * y + m[5] * z;
  xyz[2] = m[6] * x + m[7] * y + m[8] * z;
}

int sample_block(const NpyArray& block, const SampleRequest& req, Rng* rng,
                 float* out_points, int64_t* out_labels, float* out_segment) {
  const int64_t n = block.rows;
  const int64_t cols = block.cols;
  const int64_t P = req.num_point;
  if (n <= 0 || cols < 7) return -1;

  std::vector<int64_t> inds;
  inds.reserve(P);
  if (!req.coverage_sampling) {
    if (n < P) {
      for (int64_t i = 0; i < P; ++i)
        inds.push_back(static_cast<int64_t>(rng->below(n)));
    } else {
      rng->choice_no_replace(n, P, &inds);
    }
  } else {
    std::vector<int64_t> valid;
    for (int64_t i = 0; i < n; ++i)
      if (static_cast<int64_t>(block.data[i * cols + 6]) == req.target_class)
        valid.push_back(i);
    int64_t n_valid;
    if (n < P)
      n_valid = static_cast<int64_t>(valid.size());
    else
      n_valid = static_cast<int64_t>(
          static_cast<double>(valid.size()) / n * P);
    std::vector<int64_t> vsel;
    Rng vr(rng->next());
    vr.choice_no_replace(valid.size(), n_valid, &vsel);
    for (int64_t i = 0; i < n_valid; ++i) inds.push_back(valid[vsel[i]]);
    const int64_t rest = P - n_valid;
    if (n < P) {
      for (int64_t i = 0; i < rest; ++i)
        inds.push_back(static_cast<int64_t>(rng->below(n)));
    } else {
      std::vector<int64_t> osel;
      rng->choice_no_replace(n, rest, &osel);
      for (int64_t i = 0; i < rest; ++i) inds.push_back(osel[i]);
    }
  }

  // xyz shift to min
  double mn[3] = {1e30, 1e30, 1e30};
  for (int64_t i = 0; i < P; ++i) {
    const double* row = &block.data[inds[i] * cols];
    for (int d = 0; d < 3; ++d) mn[d] = std::min(mn[d], row[d]);
  }

  std::vector<double> xyz(P * 3);
  for (int64_t i = 0; i < P; ++i) {
    const double* row = &block.data[inds[i] * cols];
    for (int d = 0; d < 3; ++d) xyz[i * 3 + d] = row[d] - mn[d];
  }

  if (req.augment) {
    double m[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    if (req.aug.scale > 1.0) {
      double lo = 1.0 / req.aug.scale;
      double s = lo + rng->uniform() * (req.aug.scale - lo);
      for (int i = 0; i < 9; ++i) m[i] *= s;
    }
    if (req.aug.rot == 1) {
      double a = rng->uniform() * 2.0 * M_PI;
      double c = std::cos(a), s = std::sin(a);
      double r[9] = {c, -s, 0, s, c, 0, 0, 0, 1};
      double t[9];
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
          t[i * 3 + j] = 0;
          for (int k = 0; k < 3; ++k)
            t[i * 3 + j] += r[i * 3 + k] * m[k * 3 + j];
        }
      memcpy(m, t, sizeof(t));
    }
    if (req.aug.mirror_prob > 0) {
      if (rng->uniform() < req.aug.mirror_prob / 2)
        for (int j = 0; j < 3; ++j) m[0 * 3 + j] = -m[0 * 3 + j];
      if (rng->uniform() < req.aug.mirror_prob / 2)
        for (int j = 0; j < 3; ++j) m[1 * 3 + j] = -m[1 * 3 + j];
    }
    for (int64_t i = 0; i < P; ++i) matmul3(m, &xyz[i * 3]);
    if (req.aug.jitter) {
      for (int64_t i = 0; i < P * 3; ++i) {
        double j = 0.01 * rng->normal();
        j = std::max(-0.05, std::min(0.05, j));
        xyz[i] += static_cast<float>(j);
      }
    }
  }

  // normalised XYZ (post augmentation)
  double mn2[3] = {1e30, 1e30, 1e30}, mx2[3] = {-1e30, -1e30, -1e30};
  for (int64_t i = 0; i < P; ++i)
    for (int d = 0; d < 3; ++d) {
      mn2[d] = std::min(mn2[d], xyz[i * 3 + d]);
      mx2[d] = std::max(mx2[d], xyz[i * 3 + d]);
    }
  double span[3];
  for (int d = 0; d < 3; ++d) {
    span[d] = mx2[d] - mn2[d];
    if (span[d] <= 0) span[d] = 1.0;
  }

  // label lookup table for mode 0/1
  for (int64_t i = 0; i < P; ++i) {
    const double* row = &block.data[inds[i] * cols];
    float* o = &out_points[i * 9];
    for (int d = 0; d < 3; ++d) o[d] = static_cast<float>(xyz[i * 3 + d]);
    for (int d = 0; d < 3; ++d)
      o[3 + d] = static_cast<float>(row[3 + d] / 255.0);
    for (int d = 0; d < 3; ++d)
      o[6 + d] = static_cast<float>((xyz[i * 3 + d] - mn2[d]) / span[d]);

    const int64_t raw = static_cast<int64_t>(row[6]);
    int64_t label = 0;
    if (req.label_mode == 2) {
      label = raw == req.target_class ? 1 : 0;
    } else {
      for (int64_t c = 0; c < req.n_sampled_classes; ++c) {
        if (req.sampled_classes[c] == raw) {
          label = c + (req.label_mode == 0 ? 1 : 0);
          break;
        }
      }
    }
    out_labels[i] = label;
    out_segment[i] = cols >= 8 ? static_cast<float>(row[7]) : 0.0f;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Batch pool
// ---------------------------------------------------------------------------
struct Pool {
  std::vector<std::string> paths;
  SampleRequest req;
  std::vector<int64_t> classes;
  int64_t batch_size = 16;
  uint64_t seed = 0;
  int n_threads = 4;

  struct Batch {
    std::vector<float> points;
    std::vector<int64_t> labels;
    std::vector<float> segment;
    int64_t valid = 0;
  };

  std::vector<int64_t> order;
  std::atomic<int64_t> next_batch{0};
  int64_t n_batches = 0;

  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  std::atomic<int64_t> consumed{0};
  int64_t max_inflight = 64;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  // first unreadable/corrupt block path; non-empty => the pool is poisoned
  // and bl_pool_get returns -2 (a zero-filled stand-in row silently entering
  // training batches contradicts the fail-loud collection policy)
  std::atomic<bool> load_error{false};
  std::string error_path;
  // out-of-order completion buffer
  std::vector<Batch*> done;

  ~Pool() {
    {
      // mutate under the lock: a worker between its predicate check and
      // blocking would otherwise miss the notify and sleep forever,
      // hanging the t.join() below (pool.close() at every epoch end)
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_space.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    for (auto* b : done) delete b;
  }

  void poison(const std::string& path) {
    {
      std::lock_guard<std::mutex> lk(mu);
      if (!load_error) error_path = path;
      load_error = true;
      stop = true;
    }
    cv_space.notify_all();
    cv_ready.notify_all();
  }
};

void worker_fn(Pool* p) {
  const int64_t P = p->req.num_point;
  while (!p->stop) {
    const int64_t bi = p->next_batch.fetch_add(1);
    if (bi >= p->n_batches) return;
    {
      // backpressure: never run more than max_inflight batches ahead
      std::unique_lock<std::mutex> lk(p->mu);
      p->cv_space.wait(lk, [&] {
        return p->stop || bi < p->consumed.load() + p->max_inflight;
      });
      if (p->stop) return;
    }
    auto* batch = new Pool::Batch();
    batch->points.resize(p->batch_size * P * 9);
    batch->labels.resize(p->batch_size * P);
    batch->segment.resize(p->batch_size * P);
    const int64_t start = bi * p->batch_size;
    const int64_t end =
        std::min<int64_t>(start + p->batch_size,
                          static_cast<int64_t>(p->order.size()));
    batch->valid = end - start;
    for (int64_t i = start; i < end; ++i) {
      NpyArray block;
      if (!load_npy(p->paths[p->order[i]], &block)) {
        p->poison(p->paths[p->order[i]]);
        delete batch;
        return;
      }
      Rng rng(p->seed * 1000003ULL + static_cast<uint64_t>(i));
      SampleRequest req = p->req;
      req.sampled_classes = p->classes.data();
      req.n_sampled_classes = static_cast<int64_t>(p->classes.size());
      const int64_t off = i - start;
      if (sample_block(block, req, &rng, &batch->points[off * P * 9],
                       &batch->labels[off * P],
                       &batch->segment[off * P]) != 0) {
        p->poison(p->paths[p->order[i]]);
        delete batch;
        return;
      }
    }
    // pad final short batch by repeating the first sample
    for (int64_t off = batch->valid; off < p->batch_size; ++off) {
      memcpy(&batch->points[off * P * 9], &batch->points[0],
             sizeof(float) * P * 9);
      memcpy(&batch->labels[off * P], &batch->labels[0],
             sizeof(int64_t) * P);
      memcpy(&batch->segment[off * P], &batch->segment[0],
             sizeof(float) * P);
    }
    {
      std::lock_guard<std::mutex> lk(p->mu);
      if (static_cast<int64_t>(p->done.size()) <= bi)
        p->done.resize(bi + 1, nullptr);
      p->done[bi] = batch;
    }
    p->cv_ready.notify_all();
  }
}

// ---------------------------------------------------------------------------
// Packed wire-format encoder (parallel/steps.py::pack_batch hot path)
// ---------------------------------------------------------------------------
// f32 -> f16 with IEEE round-to-nearest-even, bit-exact with numpy's
// astype(float16) (standard magic-number conversion; overflow saturates to
// inf like hardware/numpy).
inline uint16_t f32_to_f16_rtne(float ff) {
  uint32_t f;
  memcpy(&f, &ff, 4);
  const uint32_t f32inf = 255u << 23;
  const uint32_t f16max = (127u + 16u) << 23;           // smallest overflow
  const uint32_t denorm_magic_u = ((127u - 15u) + (23u - 10u) + 1u) << 23;
  const uint32_t sign = f & 0x80000000u;
  uint16_t o;
  f ^= sign;
  if (f >= f16max) {
    o = (f > f32inf) ? 0x7e00 : 0x7c00;                 // nan : inf
  } else if (f < (113u << 23)) {
    // subnormal-f16 range: float addition of the magic constant performs
    // the RNE shift/round in hardware
    float fd;
    memcpy(&fd, &f, 4);
    float magic;
    memcpy(&magic, &denorm_magic_u, 4);
    fd += magic;
    uint32_t d;
    memcpy(&d, &fd, 4);
    o = static_cast<uint16_t>(d - denorm_magic_u);
  } else {
    const uint32_t mant_odd = (f >> 13) & 1u;           // ties-to-even
    f += (static_cast<uint32_t>(15 - 127) << 23) + 0xfffu;
    f += mant_odd;
    o = static_cast<uint16_t>(f >> 13);
  }
  return o | static_cast<uint16_t>(sign >> 16);
}

struct PackFlags {
  std::atomic<bool> overflow{false};     // finite f32 -> f16 inf
  std::atomic<bool> nonfinite{false};    // input already inf/nan
  std::atomic<bool> badlabel{false};     // label outside u8
};

// Encode rows [begin, end): xyz f16 LE bytes 0:6 | rgb u8 6:9 | label 9 —
// the exact layout of parallel/steps.py::pack_quantized_parts. rgb matches
// numpy clip(rint(v * 255), 0, 255) in f32 arithmetic (nearbyintf is
// round-half-to-even under the default FE_TONEAREST mode, like np.rint).
void pack_rows(const float* pts, const int64_t* labels, int64_t begin,
               int64_t end, uint8_t* out, PackFlags* flags) {
  bool overflow = false, nonfinite = false, badlabel = false;
  for (int64_t i = begin; i < end; ++i) {
    const float* p = pts + i * 9;
    uint8_t* o = out + i * 10;
    for (int d = 0; d < 3; ++d) {
      const float v = p[d];
      const uint16_t h = f32_to_f16_rtne(v);
      if (!std::isfinite(v)) nonfinite = true;
      else if ((h & 0x7fffu) == 0x7c00u) overflow = true;
      o[d * 2] = static_cast<uint8_t>(h & 0xffu);        // little-endian
      o[d * 2 + 1] = static_cast<uint8_t>(h >> 8);
    }
    for (int d = 0; d < 3; ++d) {
      float v = std::nearbyintf(p[3 + d] * 255.0f);
      v = std::max(0.0f, std::min(255.0f, v));
      o[6 + d] = static_cast<uint8_t>(v);
    }
    int64_t l = 0;
    if (labels) {
      l = labels[i];
      if (l < 0 || l > 255) {
        badlabel = true;
        l = 0;
      }
    }
    o[9] = static_cast<uint8_t>(l);
  }
  if (overflow) flags->overflow = true;
  if (nonfinite) flags->nonfinite = true;
  if (badlabel) flags->badlabel = true;
}

}  // namespace

extern "C" {

// One-pass encoder for the (count, 9) f32 xyzrgbXYZ -> (count, 10) u8
// packed H2D wire buffer (parallel/steps.py::pack_batch byte layout).
// `labels` may be NULL (byte 9 = 0). Returns 0 on success, 1 if a FINITE
// coordinate overflowed f16 (numpy path raises only in that case — inputs
// already containing inf/nan pass through, matching pack_batch's
// isinf(out) && isfinite(in) guard), 2 if any label is outside [0, 255].
// n_threads <= 1 encodes inline; more splits rows across std::threads.
int bl_pack(const float* points, const int64_t* labels, int64_t count,
            uint8_t* out, int n_threads) {
  PackFlags flags;
  if (n_threads <= 1 || count < 65536) {
    pack_rows(points, labels, 0, count, out, &flags);
  } else {
    std::vector<std::thread> ts;
    const int64_t chunk = (count + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      const int64_t b = t * chunk;
      const int64_t e = std::min(count, b + chunk);
      if (b >= e) break;
      ts.emplace_back(pack_rows, points, labels, b, e, out, &flags);
    }
    for (auto& t : ts) t.join();
  }
  if (flags.overflow && !flags.nonfinite) return 1;
  if (flags.badlabel) return 2;
  return 0;
}

// Creates a pool over n_paths NUL-separated block file paths.
void* bl_pool_create(const char* paths_blob, int64_t n_paths,
                     const int64_t* classes, int64_t n_classes,
                     int64_t num_point, int64_t batch_size, int label_mode,
                     int coverage, int64_t target_class, int augment,
                     double aug_scale, int aug_rot, double aug_mirror_prob,
                     int aug_jitter, uint64_t seed, int shuffle,
                     int n_threads) {
  auto* p = new Pool();
  const char* cur = paths_blob;
  for (int64_t i = 0; i < n_paths; ++i) {
    p->paths.emplace_back(cur);
    cur += p->paths.back().size() + 1;
  }
  p->classes.assign(classes, classes + n_classes);
  p->req.num_point = num_point;
  p->req.label_mode = label_mode;
  p->req.coverage_sampling = coverage;
  p->req.target_class = target_class;
  p->req.augment = augment;
  p->req.aug = {aug_scale, aug_rot, aug_mirror_prob, aug_jitter};
  p->batch_size = batch_size;
  p->seed = seed;
  p->n_threads = n_threads;

  p->order.resize(n_paths);
  for (int64_t i = 0; i < n_paths; ++i) p->order[i] = i;
  if (shuffle) {
    Rng r(seed);
    for (int64_t i = n_paths - 1; i > 0; --i) {
      int64_t j = static_cast<int64_t>(r.below(i + 1));
      std::swap(p->order[i], p->order[j]);
    }
  }
  p->n_batches = (n_paths + batch_size - 1) / batch_size;
  for (int i = 0; i < n_threads; ++i)
    p->workers.emplace_back(worker_fn, p);
  return p;
}

int64_t bl_pool_num_batches(void* pool) {
  return static_cast<Pool*>(pool)->n_batches;
}

// Blocks until batch `index` is ready; copies it out. Returns valid count,
// -1 past the end, or -2 if a worker hit an unreadable/corrupt block
// (bl_pool_error gives the path).
int64_t bl_pool_get(void* pool, int64_t index, float* points, int64_t* labels,
                    float* segment) {
  auto* p = static_cast<Pool*>(pool);
  if (index >= p->n_batches) return -1;
  Pool::Batch* batch = nullptr;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_ready.wait(lk, [&] {
      return p->load_error ||
             (static_cast<int64_t>(p->done.size()) > index &&
              p->done[index] != nullptr);
    });
    if (static_cast<int64_t>(p->done.size()) <= index ||
        p->done[index] == nullptr)
      return -2;  // poisoned before this batch completed
    batch = p->done[index];
    p->done[index] = nullptr;
  }
  memcpy(points, batch->points.data(), batch->points.size() * sizeof(float));
  memcpy(labels, batch->labels.data(),
         batch->labels.size() * sizeof(int64_t));
  memcpy(segment, batch->segment.data(),
         batch->segment.size() * sizeof(float));
  const int64_t valid = batch->valid;
  delete batch;
  {
    // mutate under the lock (see ~Pool): an unlocked bump + notify can race
    // a worker's predicate check and leave it blocked past the wakeup
    std::lock_guard<std::mutex> lk(p->mu);
    p->consumed.fetch_add(1);
  }
  p->cv_space.notify_all();
  return valid;
}

// Path of the first unreadable/corrupt block ("" if none). The pointer is
// valid until bl_pool_destroy.
const char* bl_pool_error(void* pool) {
  auto* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->mu);
  return p->error_path.c_str();
}

void bl_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// One-shot single-block sampler (no pool) for tests / support shots.
int bl_sample_one(const char* path, const int64_t* classes,
                  int64_t n_classes, int64_t num_point, int label_mode,
                  int coverage, int64_t target_class, int augment,
                  double aug_scale, int aug_rot, double aug_mirror_prob,
                  int aug_jitter, uint64_t seed, float* points,
                  int64_t* labels, float* segment) {
  NpyArray block;
  if (!load_npy(path, &block)) return -1;
  Rng rng(seed);
  SampleRequest req;
  req.num_point = num_point;
  req.label_mode = label_mode;
  req.coverage_sampling = coverage;
  req.target_class = target_class;
  req.augment = augment;
  req.aug = {aug_scale, aug_rot, aug_mirror_prob, aug_jitter};
  req.sampled_classes = classes;
  req.n_sampled_classes = n_classes;
  return sample_block(block, req, &rng, points, labels, segment);
}

}  // extern "C"
