// Native data-path kernels for the ctrlora-tpu loader.
//
// The reference delegates image prep to cv2 inside torch DataLoader worker
// *processes* (datasets/multigen20m.py:59-95). Here the loader runs in
// threads, so the hot per-sample transform — paired square crop + resize +
// normalization to float32 — is implemented in C++ (GIL-free, thread-pooled)
// and called through ctypes. Falls back to the cv2 path when the library
// isn't built.
//
// Build: make -C native     (produces libctrlora_data.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// a tiny fixed thread pool
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void run(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* pool() {
  static ThreadPool p(std::max(2u, std::thread::hardware_concurrency()));
  return &p;
}

// ---------------------------------------------------------------------------
// resize kernels (uint8 HWC3 -> float32 HWC3)
// ---------------------------------------------------------------------------

// bilinear sampling for upscale; box/area average for downscale
void resize_norm_one(const uint8_t* src, int sh, int sw,
                     int crop_t, int crop_l, int crop_h, int crop_w,
                     float* dst, int dh, int dw, float scale, float shift) {
  const double ry = double(crop_h) / dh;
  const double rx = double(crop_w) / dw;
  const bool down = ry >= 1.0 || rx >= 1.0;
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      float acc[3] = {0.f, 0.f, 0.f};
      if (down) {
        // area average over the source box
        int y0 = int(std::floor(y * ry)), y1 = std::max(y0 + 1, int(std::floor((y + 1) * ry)));
        int x0 = int(std::floor(x * rx)), x1 = std::max(x0 + 1, int(std::floor((x + 1) * rx)));
        y1 = std::min(y1, crop_h);
        x1 = std::min(x1, crop_w);
        const float inv = 1.0f / float((y1 - y0) * (x1 - x0));
        for (int yy = y0; yy < y1; ++yy) {
          const uint8_t* row = src + size_t(crop_t + yy) * sw * 3 + size_t(crop_l + x0) * 3;
          for (int xx = x0; xx < x1; ++xx) {
            acc[0] += row[0];
            acc[1] += row[1];
            acc[2] += row[2];
            row += 3;
          }
        }
        acc[0] *= inv; acc[1] *= inv; acc[2] *= inv;
      } else {
        // bilinear
        double fy = (y + 0.5) * ry - 0.5, fx = (x + 0.5) * rx - 0.5;
        fy = std::max(0.0, std::min(fy, double(crop_h - 1)));
        fx = std::max(0.0, std::min(fx, double(crop_w - 1)));
        int y0 = int(fy), x0 = int(fx);
        int y1 = std::min(y0 + 1, crop_h - 1), x1 = std::min(x0 + 1, crop_w - 1);
        float wy = float(fy - y0), wx = float(fx - x0);
        const uint8_t* p00 = src + size_t(crop_t + y0) * sw * 3 + size_t(crop_l + x0) * 3;
        const uint8_t* p01 = src + size_t(crop_t + y0) * sw * 3 + size_t(crop_l + x1) * 3;
        const uint8_t* p10 = src + size_t(crop_t + y1) * sw * 3 + size_t(crop_l + x0) * 3;
        const uint8_t* p11 = src + size_t(crop_t + y1) * sw * 3 + size_t(crop_l + x1) * 3;
        for (int c = 0; c < 3; ++c) {
          float top = p00[c] * (1 - wx) + p01[c] * wx;
          float bot = p10[c] * (1 - wx) + p11[c] * wx;
          acc[c] = top * (1 - wy) + bot * wy;
        }
      }
      float* out = dst + (size_t(y) * dw + x) * 3;
      out[0] = acc[0] * scale + shift;
      out[1] = acc[1] * scale + shift;
      out[2] = acc[2] * scale + shift;
    }
  }
}

struct Task {
  const uint8_t* src;
  int sh, sw, ct, cl, chh, cww;
  float* dst;
  int dh, dw;
  float scale, shift;
};

}  // namespace

extern "C" {

// Process a batch of independent crop+resize+normalize jobs in parallel.
// Arrays are flat; per-image metadata in the int/float arrays.
void ctrlora_batch_resize_norm(
    const uint8_t** srcs, const int* shs, const int* sws,
    const int* crop_t, const int* crop_l, const int* crop_h, const int* crop_w,
    float** dsts, int dh, int dw, float scale, float shift, int n) {
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    pool()->run([=, &done, &mu, &cv] {
      resize_norm_one(srcs[i], shs[i], sws[i], crop_t[i], crop_l[i],
                      crop_h[i], crop_w[i], dsts[i], dh, dw, scale, shift);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
}

// Single-image variant.
void ctrlora_resize_norm(const uint8_t* src, int sh, int sw, int ct, int cl,
                         int ch, int cw, float* dst, int dh, int dw,
                         float scale, float shift) {
  resize_norm_one(src, sh, sw, ct, cl, ch, cw, dst, dh, dw, scale, shift);
}

int ctrlora_native_version() { return 1; }

}  // extern "C"
