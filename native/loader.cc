// cpg-tpu native batch loader.
//
// The reference's input pipeline is torch DataLoader worker processes doing
// PIL decode + transform per image (ref:utils/dataset.py) — its only
// concurrent subsystem. The TPU-native replacement keeps augmentation on
// device (cpg_tpu/data/augment.py); what remains host-side is batch
// assembly: shuffled gather of uint8 images into contiguous buffers, which
// for 224x224 fine-grained batches is ~20MB/batch of memcpy that should
// overlap with device compute. This library runs that gather on a prefetch
// thread with a bounded ring of ready batches.
//
// C API (ctypes-friendly, no pybind11 in this environment):
//   handle = cpg_loader_create(x, y, n, item_bytes, batch, capacity,
//                              seed, shuffle)
//   int    cpg_loader_next(handle, out_x, out_y)   // blocks; 0 on success
//   void   cpg_loader_destroy(handle)
//   epoch reshuffles happen automatically at each wrap-around.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, pthreads only).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Batch {
  std::vector<uint8_t> x;
  std::vector<int32_t> y;
};

struct Loader {
  const uint8_t* x = nullptr;   // (n, item_bytes) row-major, borrowed
  const int32_t* y = nullptr;   // (n,)
  int64_t n = 0;
  int64_t item_bytes = 0;
  int64_t batch = 0;
  size_t capacity = 2;
  bool shuffle = true;

  std::vector<int64_t> order;
  int64_t cursor = 0;
  std::mt19937_64 rng;

  std::deque<Batch> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};

  void reshuffle() {
    if (shuffle) {
      for (int64_t i = n - 1; i > 0; --i) {
        std::uniform_int_distribution<int64_t> d(0, i);
        std::swap(order[i], order[d(rng)]);
      }
    }
    cursor = 0;
  }

  Batch assemble() {
    Batch b;
    b.x.resize(batch * item_bytes);
    b.y.resize(batch);
    for (int64_t i = 0; i < batch; ++i) {
      if (cursor >= n) reshuffle();
      const int64_t idx = order[cursor++];
      std::memcpy(b.x.data() + i * item_bytes, x + idx * item_bytes,
                  item_bytes);
      b.y[i] = y[idx];
    }
    return b;
  }

  void run() {
    while (!stop.load(std::memory_order_relaxed)) {
      Batch b = assemble();
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < capacity || stop; });
      if (stop) return;
      ready.emplace_back(std::move(b));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* cpg_loader_create(const uint8_t* x, const int32_t* y, int64_t n,
                        int64_t item_bytes, int64_t batch, int64_t capacity,
                        uint64_t seed, int shuffle) {
  if (!x || !y || n <= 0 || batch <= 0 || item_bytes <= 0) return nullptr;
  auto* L = new Loader();
  L->x = x;
  L->y = y;
  L->n = n;
  L->item_bytes = item_bytes;
  L->batch = batch;
  L->capacity = capacity > 0 ? static_cast<size_t>(capacity) : 2;
  L->shuffle = shuffle != 0;
  L->rng.seed(seed);
  L->order.resize(n);
  for (int64_t i = 0; i < n; ++i) L->order[i] = i;
  L->reshuffle();
  L->worker = std::thread([L] { L->run(); });
  return L;
}

int cpg_loader_next(void* handle, uint8_t* out_x, int32_t* out_y) {
  auto* L = static_cast<Loader*>(handle);
  if (!L || !out_x || !out_y) return -1;
  Batch b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] { return !L->ready.empty() || L->stop; });
    if (L->stop && L->ready.empty()) return -2;
    b = std::move(L->ready.front());
    L->ready.pop_front();
    L->cv_space.notify_one();
  }
  std::memcpy(out_x, b.x.data(), b.x.size());
  std::memcpy(out_y, b.y.data(), b.y.size() * sizeof(int32_t));
  return 0;
}

void cpg_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  if (!L) return;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  if (L->worker.joinable()) L->worker.join();
  delete L;
}

}  // extern "C"
