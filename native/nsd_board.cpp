// Native board runtime for neural_speech_decoding_tpu.
//
// The reference's acquisition stack lives in BrainFlow's C++
// BoardController (serial protocol, ring buffer, board worker threads —
// SURVEY.md §2.3). This is our equivalent for the boards that matter in a
// hardware-free deployment: a producer thread generates (synthetic) or
// replays (recorded) samples into a single-producer ring buffer at
// sample_rate * speed, and consumers snapshot the most recent n samples —
// the exact `get_current_board_data` semantics the Python layers above
// expect. Exposed as a C ABI for ctypes (runtime/native.py).
//
// Layout conventions (matching BrainFlow):
//   * board data is [rows, time] with row 0 a monotonically increasing
//     sample counter and rows 1..channels the EEG channels;
//   * get_current(n, out) fills a row-major [rows, n] buffer left-aligned
//     (row stride n) with the latest m = min(n, available) samples, oldest
//     first, and returns m.
//
// Concurrency: one producer thread, any number of snapshot readers. A
// plain mutex guards the ring; at EEG rates (kHz) contention is nil and
// the predictable latency beats cleverness. Build: `make -C native`.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr int kModeSynthetic = 0;
constexpr int kModeReplay = 1;
constexpr double kTwoPi = 6.283185307179586476925286766559;

class Ring {
 public:
  void reset(int rows, long capacity) {
    rows_ = rows;
    capacity_ = capacity;
    buf_.assign(static_cast<size_t>(rows) * capacity, 0.0);
    written_ = 0;
  }

  // block: [rows, k] row-major with row stride k
  void push(const double* block, long k) {
    std::lock_guard<std::mutex> g(mu_);
    long pos = written_ % capacity_;
    long first = std::min(k, capacity_ - pos);
    for (int r = 0; r < rows_; ++r) {
      std::memcpy(&buf_[static_cast<size_t>(r) * capacity_ + pos],
                  block + static_cast<size_t>(r) * k, first * sizeof(double));
      if (k > first) {
        std::memcpy(&buf_[static_cast<size_t>(r) * capacity_],
                    block + static_cast<size_t>(r) * k + first,
                    (k - first) * sizeof(double));
      }
    }
    written_ += k;
  }

  long count() {
    std::lock_guard<std::mutex> g(mu_);
    return std::min(written_, capacity_);
  }

  // out: [rows, n] row-major (row stride n); returns m = min(n, available)
  long latest(long n, double* out) {
    std::lock_guard<std::mutex> g(mu_);
    long avail = std::min(written_, capacity_);
    long m = std::min(n, avail);
    if (m == 0) return 0;
    long end = written_ % capacity_;
    long start = (end - m) % capacity_;
    if (start < 0) start += capacity_;
    for (int r = 0; r < rows_; ++r) {
      const double* row = &buf_[static_cast<size_t>(r) * capacity_];
      double* dst = out + static_cast<size_t>(r) * n;
      long tail = std::min(m, capacity_ - start);
      std::memcpy(dst, row + start, tail * sizeof(double));
      if (m > tail) std::memcpy(dst + tail, row, (m - tail) * sizeof(double));
    }
    return m;
  }

 private:
  std::mutex mu_;
  std::vector<double> buf_;
  int rows_ = 0;
  long capacity_ = 0;
  long written_ = 0;
};

struct Board {
  int mode = kModeSynthetic;
  int rows = 9;
  int channels = 8;
  int sr = 125;
  uint64_t seed = 0;

  std::vector<float> replay;  // [channels, total] row-major
  long replay_total = 0;

  Ring ring;
  std::thread producer;
  std::atomic<bool> running{false};
  double speed = 1.0;

  void generate(long start, long k, std::vector<double>& out,
                std::mt19937_64& rng) {
    // out: [rows, k] row-major
    std::normal_distribution<double> gauss(0.0, 1.0);
    for (long i = 0; i < k; ++i) out[i] = static_cast<double>(start + i);
    if (mode == kModeReplay && replay_total > 0) {
      for (int c = 0; c < channels; ++c) {
        double* dst = &out[static_cast<size_t>(1 + c) * k];
        const float* src = &replay[static_cast<size_t>(c) * replay_total];
        for (long i = 0; i < k; ++i) dst[i] = src[(start + i) % replay_total];
      }
    } else {
      for (int c = 0; c < channels; ++c) {
        double* dst = &out[static_cast<size_t>(1 + c) * k];
        for (long i = 0; i < k; ++i) {
          double t = static_cast<double>(start + i) / sr;
          double base = std::sin(kTwoPi * (8.0 + c) * t);
          double mod = 0.4 * std::sin(kTwoPi * (2.0 + 0.2 * c) * t + c);
          dst[i] = base + mod + 0.35 * gauss(rng);
        }
      }
    }
  }

  void pump() {
    std::mt19937_64 rng(seed);
    long block = std::max(1L, static_cast<long>(sr) / 25);
    auto period = std::chrono::duration<double>(block / (sr * speed));
    auto next = std::chrono::steady_clock::now();
    std::vector<double> scratch(static_cast<size_t>(rows) * block);
    long sent = 0;
    while (running.load(std::memory_order_acquire)) {
      generate(sent, block, scratch, rng);
      ring.push(scratch.data(), block);
      sent += block;
      next += std::chrono::duration_cast<std::chrono::steady_clock::duration>(
          period);
      auto now = std::chrono::steady_clock::now();
      if (next > now) {
        std::this_thread::sleep_until(next);
      } else {
        next = now;  // fell behind; don't burst
      }
    }
  }
};

}  // namespace

extern "C" {

void* nsd_board_create(int mode, int num_rows, int num_channels,
                       int sample_rate, uint64_t seed) {
  if (num_rows < num_channels + 1 || num_channels <= 0 || sample_rate <= 0)
    return nullptr;
  auto* b = new Board();
  b->mode = mode;
  b->rows = num_rows;
  b->channels = num_channels;
  b->sr = sample_rate;
  b->seed = seed;
  return b;
}

int nsd_board_load_replay(void* handle, const float* data, int channels,
                          long total) {
  auto* b = static_cast<Board*>(handle);
  if (!b || channels < b->channels || total <= 0) return 1;
  b->replay.assign(data, data + static_cast<size_t>(channels) * total);
  b->replay_total = total;
  return 0;
}

int nsd_board_start(void* handle, long buffer_size, double speed) {
  auto* b = static_cast<Board*>(handle);
  if (!b || buffer_size <= 0 || speed <= 0) return 1;
  if (b->running.load()) return 2;
  if (b->mode == kModeReplay && b->replay_total == 0) return 3;
  b->ring.reset(b->rows, buffer_size);
  b->speed = speed;
  b->running.store(true, std::memory_order_release);
  b->producer = std::thread(&Board::pump, b);
  return 0;
}

void nsd_board_stop(void* handle) {
  auto* b = static_cast<Board*>(handle);
  if (!b) return;
  b->running.store(false, std::memory_order_release);
  if (b->producer.joinable()) b->producer.join();
}

void nsd_board_release(void* handle) {
  auto* b = static_cast<Board*>(handle);
  if (!b) return;
  nsd_board_stop(handle);
  delete b;
}

long nsd_board_data_count(void* handle) {
  auto* b = static_cast<Board*>(handle);
  return b ? b->ring.count() : 0;
}

long nsd_board_get_current(void* handle, long n, double* out) {
  auto* b = static_cast<Board*>(handle);
  return b ? b->ring.latest(n, out) : 0;
}

}  // extern "C"
