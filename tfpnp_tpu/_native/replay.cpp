// Native replay-ring engine: the host-side experience store.
//
// TPU-native equivalent of the reference's runtime-side experience path
// (tfpnp/utils/rpm.py list buffer + trainer.py:224-241 per-sample CPU
// copies). Episodes stream tens of megabytes of f32 wire records to the
// host every second; this engine does the masked ring insert and the
// sample gather as parallel memcpy over preallocated storage, with no
// Python object churn and the GIL released (ctypes releases it around
// foreign calls).
//
// Layout: F independent fields (one per pytree leaf), each a
// [capacity, row_floats[f]] contiguous f32 array. Insert/gather walk
// fields x rows with std::thread workers when the payload is large.
//
// C ABI only — loaded via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Ring {
  int64_t capacity = 0;
  int64_t idx = 0;   // next write slot
  int64_t size = 0;  // valid rows
  std::vector<int64_t> row_floats;
  std::vector<std::vector<float>> store;  // per field
};

// Run fn(first, last) over [0, n) on up to k threads.
template <typename Fn>
void parallel_for(int64_t n, int64_t min_grain, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t k = std::min<int64_t>(hw ? hw : 1, (n + min_grain - 1) / min_grain);
  if (k <= 1) {
    fn(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(k);
  int64_t chunk = (n + k - 1) / k;
  for (int64_t t = 0; t < k; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

Ring* rb_create(int64_t capacity, const int64_t* row_floats,
                int64_t n_fields) {
  if (capacity <= 0 || n_fields <= 0) return nullptr;
  Ring* rb = new Ring;
  rb->capacity = capacity;
  rb->row_floats.assign(row_floats, row_floats + n_fields);
  rb->store.resize(n_fields);
  for (int64_t f = 0; f < n_fields; ++f) {
    if (rb->row_floats[f] <= 0) {
      delete rb;
      return nullptr;
    }
    rb->store[f].resize(static_cast<size_t>(capacity) * rb->row_floats[f]);
  }
  return rb;
}

void rb_destroy(Ring* rb) { delete rb; }

int64_t rb_size(const Ring* rb) { return rb ? rb->size : 0; }
int64_t rb_capacity(const Ring* rb) { return rb ? rb->capacity : 0; }

// Insert rows i of batch (per-field [nrows, row_floats[f]]) where keep[i].
// Returns number of rows stored. Ring semantics match the Python buffer:
// consecutive kept rows land at (idx + j) % capacity.
int64_t rb_insert_masked(Ring* rb, const float* const* batch,
                         const uint8_t* keep, int64_t nrows) {
  if (!rb || nrows <= 0) return 0;
  std::vector<int64_t> rows;
  rows.reserve(nrows);
  for (int64_t i = 0; i < nrows; ++i)
    if (keep[i]) rows.push_back(i);
  int64_t k = static_cast<int64_t>(rows.size());
  if (k == 0) return 0;

  int64_t n_fields = static_cast<int64_t>(rb->store.size());
  // flat work list: (field, j) pairs, parallelized over total copies
  parallel_for(n_fields * k, /*min_grain=*/8, [&](int64_t lo, int64_t hi) {
    for (int64_t w = lo; w < hi; ++w) {
      int64_t f = w / k, j = w % k;
      int64_t rf = rb->row_floats[f];
      int64_t dst = (rb->idx + j) % rb->capacity;
      std::memcpy(rb->store[f].data() + dst * rf, batch[f] + rows[j] * rf,
                  rf * sizeof(float));
    }
  });
  rb->idx = (rb->idx + k) % rb->capacity;
  rb->size = std::min(rb->size + k, rb->capacity);
  return k;
}

// Gather rows idx[j] (0 <= idx[j] < size) into out (per-field
// [batch, row_floats[f]]).
void rb_gather(const Ring* rb, const int64_t* idx, int64_t batch,
               float* const* out) {
  if (!rb || batch <= 0) return;
  int64_t n_fields = static_cast<int64_t>(rb->store.size());
  parallel_for(n_fields * batch, /*min_grain=*/8, [&](int64_t lo, int64_t hi) {
    for (int64_t w = lo; w < hi; ++w) {
      int64_t f = w / batch, j = w % batch;
      int64_t rf = rb->row_floats[f];
      std::memcpy(out[f] + j * rf, rb->store[f].data() + idx[j] * rf,
                  rf * sizeof(float));
    }
  });
}

}  // extern "C"
