// diskio — native batch record reader for the disk index.
//
// Replaces the reference's thread-per-core monoio/io_uring runtime
// (src/query_disk_index.rs:711-742, read_node :73-81) with a portable
// C++ positional-read thread pool: fixed-size (4096 B, NVMe-sector
// aligned) records are fetched with pread(2) fanned out across worker
// threads, so a beam of node reads completes in one disk round-trip
// latency instead of beamwidth of them. Exposed as a C ABI for ctypes.
//
// Build: make -C native   (produces libdiskio.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lock(mu_);
            cv_.wait(lock, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> task) {
    {
      std::lock_guard<std::mutex> lock(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

struct Reader {
  int fd;
  int64_t record_size;
  ThreadPool pool;

  Reader(int fd, int64_t record_size, int n_threads)
      : fd(fd), record_size(record_size), pool(n_threads) {}
};

}  // namespace

extern "C" {

// Open a record file. n_threads <= 0 selects a default sized for NVMe
// queue depth vs. typical beamwidths.
void* diskio_open(const char* path, int64_t record_size, int n_threads) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
#ifdef POSIX_FADV_RANDOM
  ::posix_fadvise(fd, 0, 0, POSIX_FADV_RANDOM);
#endif
  if (n_threads <= 0) n_threads = 16;
  return new Reader(fd, record_size, n_threads);
}

// Read n records by id into out (n * record_size bytes, caller-owned).
// Returns the number of complete records read.
int64_t diskio_read_batch(void* handle, const int64_t* ids, int64_t n,
                          char* out) {
  auto* r = static_cast<Reader*>(handle);
  std::atomic<int64_t> ok{0};
  std::atomic<int64_t> pending{n};
  std::mutex done_mu;
  std::condition_variable done_cv;

  for (int64_t i = 0; i < n; ++i) {
    r->pool.submit([r, i, ids, out, &ok, &pending, &done_mu, &done_cv] {
      const int64_t off = ids[i] * r->record_size;
      char* dst = out + i * r->record_size;
      int64_t got = 0;
      while (got < r->record_size) {
        ssize_t rd =
            ::pread(r->fd, dst + got, r->record_size - got, off + got);
        if (rd <= 0) break;
        got += rd;
      }
      if (got == r->record_size) ok.fetch_add(1);
      if (pending.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lock(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lock(done_mu);
  done_cv.wait(lock, [&pending] { return pending.load() == 0; });
  return ok.load();
}

void diskio_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  ::close(r->fd);
  delete r;
}

}  // extern "C"
