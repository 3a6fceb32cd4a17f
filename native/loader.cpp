// sodt_tpu native data loader: threaded decode + resize + prefetch.
//
// The reference delegates its image hot path to cv2 inside torch DataLoader
// workers (/root/reference/basics/utils/datasets.py). This host has a single
// CPU core feeding a TPU, so the goal is not parallel decode but *overlap*:
// a GIL-free C++ worker decodes/resizes the next batch of RGB+IR tile pairs
// into a ring of pinned buffers while the device crunches the current step,
// with a decoded-tile RAM cache so steady-state epochs are memcpy-bound.
//
// C ABI (ctypes-friendly):
//   handle = loader_create(rgb_paths, ir_paths, n_files, img_size,
//                          cache_bytes)
//   loader_submit(handle, job_id, indices, n_idx)   // async decode request
//   loader_wait(handle, job_id, rgb_out, ir_out)    // blocks; fills buffers
//   loader_destroy(handle)
//
// Output layout per job: n_idx tiles of (img_size, img_size, 3) uint8, RGB
// then IR, C-contiguous. IR single-channel pngs are replicated to 3ch like
// the python loader.

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <algorithm>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Job {
  uint64_t id;
  std::vector<int> indices;
  std::vector<uint8_t> rgb, ir;  // filled by worker
  bool done = false;
  std::string error;  // non-empty => decode failure, Wait returns false
};

class Loader {
 public:
  Loader(std::vector<std::string> rgb_paths,
         std::vector<std::string> ir_paths, int img_size,
         size_t cache_bytes)
      : rgb_paths_(std::move(rgb_paths)), ir_paths_(std::move(ir_paths)),
        img_size_(img_size), cache_budget_(cache_bytes) {
    worker_ = std::thread([this] { Run(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    worker_.join();
  }

  void Submit(uint64_t id, const int* idx, int n) {
    auto job = std::make_shared<Job>();
    job->id = id;
    job->indices.assign(idx, idx + n);
    {
      std::lock_guard<std::mutex> lk(mu_);
      pending_.push_back(job);
      jobs_[id] = job;
    }
    cv_.notify_all();
  }

  bool Wait(uint64_t id, uint8_t* rgb_out, uint8_t* ir_out) {
    std::shared_ptr<Job> job;
    {
      std::unique_lock<std::mutex> lk(mu_);
      auto it = jobs_.find(id);
      if (it == jobs_.end()) return false;
      job = it->second;
      done_cv_.wait(lk, [&] { return job->done || stop_; });
      jobs_.erase(id);
    }
    if (!job->done) return false;
    if (!job->error.empty()) {
      std::lock_guard<std::mutex> lk(mu_);
      last_error_ = job->error;
      return false;
    }
    std::memcpy(rgb_out, job->rgb.data(), job->rgb.size());
    std::memcpy(ir_out, job->ir.data(), job->ir.size());
    return true;
  }

  std::string LastError() {
    std::lock_guard<std::mutex> lk(mu_);
    return last_error_;
  }

 private:
  // decode one file to a resized (img_size^2 * 3) uint8 RGB tile; cached
  // until the budget is hit, decoded into `scratch` afterwards
  const uint8_t* Tile(int index, bool ir, std::vector<uint8_t>& scratch) {
    auto& cache = ir ? ir_cache_ : rgb_cache_;
    auto it = cache.find(index);
    if (it != cache.end()) return it->second.data();

    const std::string& path = ir ? ir_paths_[index] : rgb_paths_[index];
    cv::Mat img = cv::imread(path, cv::IMREAD_UNCHANGED);
    if (img.empty()) {
      // Fail the whole job: the sample's labels still apply, so a silent
      // gray substitute would train annotations against a blank tile. The
      // python path (_read_image) raises on unreadable files; parity here
      // means surfacing the error to loader_wait (returns 0 -> wrapper
      // raises with the path from loader_last_error).
      return nullptr;
    }
    if (img.channels() == 1) {
      cv::cvtColor(img, img, cv::COLOR_GRAY2BGR);
    } else if (img.channels() == 4) {
      cv::cvtColor(img, img, cv::COLOR_BGRA2BGR);
    }
    if (img.depth() != CV_8U) img.convertTo(img, CV_8U);
    // resize longest side to img_size (reference load_image semantics);
    // VEDAI tiles are square so this is a plain resize
    double r = static_cast<double>(img_size_) / std::max(img.rows, img.cols);
    if (r != 1.0) {
      cv::resize(img, img, cv::Size(int(img.cols * r), int(img.rows * r)),
                 0, 0, r < 1 ? cv::INTER_AREA : cv::INTER_LINEAR);
    }
    cv::cvtColor(img, img, cv::COLOR_BGR2RGB);
    cv::Mat square(img_size_, img_size_, CV_8UC3, cv::Scalar(114, 114, 114));
    img.copyTo(square(cv::Rect(0, 0, img.cols, img.rows)));

    std::vector<uint8_t> buf(size_t(img_size_) * img_size_ * 3);
    std::memcpy(buf.data(), square.data, buf.size());

    if (cache_used_ + buf.size() <= cache_budget_) {
      cache_used_ += buf.size();
      auto res = cache.emplace(index, std::move(buf));
      return res.first->second.data();
    }
    scratch = std::move(buf);
    return scratch.data();
  }

  void Run() {
    for (;;) {
      std::shared_ptr<Job> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || !pending_.empty(); });
        if (stop_) return;
        job = pending_.front();
        pending_.pop_front();
      }
      const size_t tile = size_t(img_size_) * img_size_ * 3;
      job->rgb.resize(tile * job->indices.size());
      job->ir.resize(tile * job->indices.size());
      std::vector<uint8_t> scratch;
      for (size_t i = 0; i < job->indices.size(); ++i) {
        int idx = job->indices[i];
        const uint8_t* rgb = Tile(idx, false, scratch);
        if (!rgb) {
          job->error = "failed to decode " + rgb_paths_[idx];
          break;
        }
        std::memcpy(job->rgb.data() + i * tile, rgb, tile);
        const uint8_t* ir = Tile(idx, true, scratch);
        if (!ir) {
          job->error = "failed to decode " + ir_paths_[idx];
          break;
        }
        std::memcpy(job->ir.data() + i * tile, ir, tile);
      }
      {
        std::lock_guard<std::mutex> lk(mu_);
        job->done = true;
      }
      done_cv_.notify_all();
    }
  }

  std::vector<std::string> rgb_paths_, ir_paths_;
  int img_size_;
  size_t cache_budget_;
  size_t cache_used_ = 0;
  std::unordered_map<int, std::vector<uint8_t>> rgb_cache_, ir_cache_;

  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::deque<std::shared_ptr<Job>> pending_;
  std::map<uint64_t, std::shared_ptr<Job>> jobs_;
  std::thread worker_;
  bool stop_ = false;
  std::string last_error_;
};

}  // namespace

extern "C" {

void* loader_create(const char** rgb_paths, const char** ir_paths,
                    int n_files, int img_size, size_t cache_bytes) {
  std::vector<std::string> rgb(rgb_paths, rgb_paths + n_files);
  std::vector<std::string> ir(ir_paths, ir_paths + n_files);
  return new Loader(std::move(rgb), std::move(ir), img_size, cache_bytes);
}

void loader_submit(void* handle, uint64_t job_id, const int* indices,
                   int n_idx) {
  static_cast<Loader*>(handle)->Submit(job_id, indices, n_idx);
}

int loader_wait(void* handle, uint64_t job_id, uint8_t* rgb_out,
                uint8_t* ir_out) {
  return static_cast<Loader*>(handle)->Wait(job_id, rgb_out, ir_out) ? 1 : 0;
}

// Copies the most recent failure message (e.g. the undecodable path) into
// buf; returns the number of bytes written (excluding the NUL).
int loader_last_error(void* handle, char* buf, int buf_len) {
  std::string err = static_cast<Loader*>(handle)->LastError();
  if (buf_len <= 0) return 0;
  int n = std::min<int>(err.size(), buf_len - 1);
  std::memcpy(buf, err.data(), n);
  buf[n] = '\0';
  return n;
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
