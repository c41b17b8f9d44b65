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
#if defined(__AVX2__)
#include <immintrin.h>
#endif
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <sys/uio.h>
#include <cstdlib>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <unistd.h>
#include <unordered_map>
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
  // Optional read-only mapping of the whole record file
  // (MSE_DISKIO_MMAP=1): the navigator parses beam records directly
  // from the mapping — zero syscalls and zero copies per record in the
  // warm (page-cached) regime. Cold pages fault SYNCHRONOUSLY one at a
  // time, losing the pool's parallel-miss fan-out, so this is an
  // opt-in for warm serving, not the default.
  const uint8_t* map = nullptr;
  size_t map_len = 0;

  Reader(int fd, int64_t record_size, int n_threads)
      : fd(fd), record_size(record_size), pool(n_threads) {}
};

}  // namespace

extern "C" {

// Bump whenever any exported signature changes (the Python loader
// refuses to drive a stale prebuilt .so through a newer ctypes
// prototype — a silently ignored trailing argument would no-op the
// feature it carries, e.g. the `spec` knob on disknav_search).
int64_t diskio_abi_version() { return 2; }

// Open a record file. n_threads <= 0 selects a default sized for NVMe
// queue depth vs. typical beamwidths.
void* diskio_open(const char* path, int64_t record_size, int n_threads) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
#ifdef POSIX_FADV_RANDOM
  ::posix_fadvise(fd, 0, 0, POSIX_FADV_RANDOM);
#endif
  if (n_threads <= 0) n_threads = 16;
  auto* r = new Reader(fd, record_size, n_threads);
  const char* want_map = ::getenv("MSE_DISKIO_MMAP");
  if (want_map && want_map[0] == '1') {
    struct stat st;
    if (::fstat(fd, &st) == 0 && st.st_size > 0) {
      void* m = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
      if (m != MAP_FAILED) {
        r->map = static_cast<const uint8_t*>(m);
        r->map_len = st.st_size;
      }
    }
  }
  return r;
}

// Read n records by id into out (n * record_size bytes, caller-owned).
// Returns the number of complete records read.
//
// Fast path: preadv2(RWF_NOWAIT) inline from the calling thread — a
// page-cached record completes without any pool dispatch (measured:
// on a 1-core host the wake/wait round-trip per beam dominated warm
// serving). Only actual cache misses fan out to the worker pool, where
// parallel preads hide NVMe latency (the io_uring role,
// query_disk_index.rs:711-742).
int64_t diskio_read_batch(void* handle, const int64_t* ids, int64_t n,
                          char* out) {
  auto* r = static_cast<Reader*>(handle);
  std::atomic<int64_t> ok{0};

#if defined(__linux__) && defined(RWF_NOWAIT)
  {
    int64_t misses[256];
    int64_t miss_out[256];
    int64_t n_miss = 0;
    for (int64_t i = 0; i < n; ++i) {
      struct iovec iov = {out + i * r->record_size,
                          (size_t)r->record_size};
      ssize_t rd = ::preadv2(r->fd, &iov, 1, ids[i] * r->record_size,
                             RWF_NOWAIT);
      if (rd == r->record_size) {
        ok.fetch_add(1);
      } else if (n_miss < 256) {
        misses[n_miss] = ids[i];
        miss_out[n_miss] = i;
        ++n_miss;
      } else {
        // overflow (beam > 256): pool the rest below via slow path
        misses[0] = -1;
        n_miss = -1;
        break;
      }
    }
    if (n_miss == 0) return ok.load();
    if (n_miss > 0) {
      // pool only the misses
      std::atomic<int64_t> pending{n_miss};
      std::mutex done_mu;
      std::condition_variable done_cv;
      for (int64_t m = 0; m < n_miss; ++m) {
        const int64_t id = misses[m];
        char* dst = out + miss_out[m] * r->record_size;
        r->pool.submit([r, id, dst, &ok, &pending, &done_mu, &done_cv] {
          const int64_t off = id * r->record_size;
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
    ok.store(0);  // n_miss < 0: fall through to the full pooled path
  }
#endif

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
  if (r->map) ::munmap(const_cast<uint8_t*>(r->map), r->map_len);
  ::close(r->fd);
  delete r;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// disknav — the beam-search hot loop, native.
//
// The reference executes the whole per-query loop in compiled code on a
// thread-per-core io_uring runtime (src/query_disk_index.rs:144-212).
// Round 2 measured the Python/numpy per-hop frontier work (seen-bitmap
// update, PQ LUT-sum, top-beamwidth selection) to be GIL-bound: 2 serving
// threads were SLOWER than 1 (docs/scale1m_report.json qps_vs_threads).
// This moves the entire search loop behind the C ABI; the ctypes call
// releases the GIL, so serving threads scale and the per-hop work runs at
// native speed. Python keeps only per-query setup (LUT GEMV) and final
// result assembly (msgpack-decoding the top-k records).
//
// Semantics mirror meme_search_engine_tpu/index/disk_index.py::search
// exactly: same seen-bitmap admission, same ADC scoring (+optional
// descriptor product on both frontier and exact scores), same
// 2*search_list frontier truncation, same visited>=search_list stop.

namespace {

// fp16 -> fp32 via a 64K-entry table built once (records store LE fp16).
struct F16Table {
  float t[65536];
  F16Table() {
    for (uint32_t h = 0; h < 65536; ++h) {
      uint32_t sign = (h & 0x8000u) << 16;
      uint32_t exp = (h >> 10) & 0x1f;
      uint32_t man = h & 0x3ffu;
      uint32_t bits;
      if (exp == 0) {
        if (man == 0) {
          bits = sign;
        } else {  // subnormal: normalise
          int e = -1;
          uint32_t m = man;
          do {
            ++e;
            m <<= 1;
          } while ((m & 0x400u) == 0);
          bits = sign | ((127 - 15 - e) << 23) | ((m & 0x3ffu) << 13);
        }
      } else if (exp == 31) {
        bits = sign | 0x7f800000u | (man << 13);
      } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
      }
      std::memcpy(&t[h], &bits, 4);
    }
  }
};
const F16Table& f16_table() {
  static F16Table table;
  return table;
}

// Minimal msgpack cursor: enough to pull id/vector/vertices out of a
// PackedIndexEntry record (pipeline/formats.py pack()) without touching
// the other fields.
struct MsgCursor {
  const uint8_t* p;
  const uint8_t* end;
  bool fail = false;

  uint8_t peek() {
    if (p >= end) {
      fail = true;
      return 0;
    }
    return *p;
  }
  uint8_t take() {
    if (p >= end) {
      fail = true;
      return 0;
    }
    return *p++;
  }
  uint64_t be(int n) {
    if (p + n > end) {
      fail = true;
      return 0;
    }
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 8) | *p++;
    return v;
  }

  int64_t read_int() {
    uint8_t b = take();
    if (b < 0x80) return b;                       // positive fixint
    if (b >= 0xe0) return (int8_t)b;              // negative fixint
    switch (b) {
      case 0xcc: return (int64_t)be(1);
      case 0xcd: return (int64_t)be(2);
      case 0xce: return (int64_t)be(4);
      case 0xcf: return (int64_t)be(8);
      case 0xd0: return (int8_t)be(1);
      case 0xd1: return (int16_t)be(2);
      case 0xd2: return (int32_t)be(4);
      case 0xd3: return (int64_t)be(8);
      default: fail = true; return 0;
    }
  }

  // returns length; sets *s to the bytes
  int64_t read_str(const char** s) {
    uint8_t b = take();
    int64_t n;
    if ((b & 0xe0) == 0xa0) n = b & 0x1f;
    else if (b == 0xd9) n = (int64_t)be(1);
    else if (b == 0xda) n = (int64_t)be(2);
    else if (b == 0xdb) n = (int64_t)be(4);
    else { fail = true; return -1; }
    if (p + n > end) { fail = true; return -1; }
    *s = (const char*)p;
    p += n;
    return n;
  }

  int64_t read_bin(const uint8_t** s) {
    uint8_t b = take();
    int64_t n;
    if (b == 0xc4) n = (int64_t)be(1);
    else if (b == 0xc5) n = (int64_t)be(2);
    else if (b == 0xc6) n = (int64_t)be(4);
    else { fail = true; return -1; }
    if (p + n > end) { fail = true; return -1; }
    *s = p;
    p += n;
    return n;
  }

  int64_t read_array_len() {
    uint8_t b = take();
    if ((b & 0xf0) == 0x90) return b & 0x0f;
    if (b == 0xdc) return (int64_t)be(2);
    if (b == 0xdd) return (int64_t)be(4);
    fail = true;
    return -1;
  }

  int64_t read_map_len() {
    uint8_t b = take();
    if ((b & 0xf0) == 0x80) return b & 0x0f;
    if (b == 0xde) return (int64_t)be(2);
    if (b == 0xdf) return (int64_t)be(4);
    fail = true;
    return -1;
  }

  void skip() {
    uint8_t b = peek();
    if (fail) return;
    if (b < 0x80 || b >= 0xe0 || b == 0xc0 || b == 0xc2 || b == 0xc3) {
      ++p;
      return;
    }
    if ((b & 0xe0) == 0xa0 || b == 0xd9 || b == 0xda || b == 0xdb) {
      const char* s;
      read_str(&s);
      return;
    }
    if (b == 0xc4 || b == 0xc5 || b == 0xc6) {
      const uint8_t* s;
      read_bin(&s);
      return;
    }
    if ((b & 0xf0) == 0x90 || b == 0xdc || b == 0xdd) {
      int64_t n = read_array_len();
      for (int64_t i = 0; i < n && !fail; ++i) skip();
      return;
    }
    if ((b & 0xf0) == 0x80 || b == 0xde || b == 0xdf) {
      int64_t n = read_map_len();
      for (int64_t i = 0; i < n && !fail; ++i) {
        skip();
        skip();
      }
      return;
    }
    switch (b) {
      case 0xca: ++p; be(4); return;  // f32
      case 0xcb: ++p; be(8); return;  // f64
      case 0xcc: case 0xd0: ++p; be(1); return;
      case 0xcd: case 0xd1: ++p; be(2); return;
      case 0xce: case 0xd2: ++p; be(4); return;
      case 0xcf: case 0xd3: ++p; be(8); return;
      default: fail = true; return;
    }
  }
};

struct ParsedNode {
  int64_t id = -1;
  const uint8_t* vec_f16 = nullptr;  // LE fp16, vec_len halfwords
  int64_t vec_len = 0;
  int64_t vertices[512];  // fixed: no per-node heap churn (R <= 512)
  int64_t n_vertices = 0;
};

// Record layout: u32 LE body length + msgpack map (formats.py pack()).
bool parse_record(const uint8_t* rec, int64_t record_size, ParsedNode* out) {
  uint32_t len;
  std::memcpy(&len, rec, 4);
  if ((int64_t)len + 4 > record_size) return false;
  MsgCursor c{rec + 4, rec + 4 + len};
  int64_t n_keys = c.read_map_len();
  if (c.fail) return false;
  for (int64_t i = 0; i < n_keys; ++i) {
    const char* key;
    int64_t klen = c.read_str(&key);
    if (c.fail) return false;
    if (klen == 2 && !std::memcmp(key, "id", 2)) {
      out->id = c.read_int();
    } else if (klen == 6 && !std::memcmp(key, "vector", 6)) {
      int64_t n = c.read_bin(&out->vec_f16);
      out->vec_len = n / 2;
    } else if (klen == 8 && !std::memcmp(key, "vertices", 8)) {
      int64_t n = c.read_array_len();
      if (c.fail || n < 0 || n > 512) return false;
      out->n_vertices = n;
      for (int64_t j = 0; j < n; ++j) out->vertices[j] = c.read_int();
    } else {
      c.skip();
    }
    if (c.fail) return false;
  }
  return out->id >= 0 && out->vec_f16 != nullptr;
}

struct Nav {
  Reader* reader;          // borrowed from diskio_open (Python owns it)
  int64_t count;           // nodes in the index
  int64_t d;               // embedding dims
  const uint8_t* pq_codes; // (count, n_chunks), mmap'd by Python
  int64_t n_chunks;
  int64_t n_centroids;
  const uint8_t* descriptors;  // (count, n_desc)
  int64_t n_desc;
};

struct FrontierEntry {
  float score;
  int64_t id;
};

}  // namespace

extern "C" {

// Attach a navigator to an open diskio reader. pq_codes/descriptors are
// borrowed pointers (Python keeps the mmaps alive for the Nav lifetime).
void* disknav_open(void* reader_handle, int64_t count, int64_t d,
                   const uint8_t* pq_codes, int64_t n_chunks,
                   int64_t n_centroids, const uint8_t* descriptors,
                   int64_t n_desc) {
  f16_table();  // build the table outside the hot path
  auto* nav = new Nav{static_cast<Reader*>(reader_handle), count, d,
                      pq_codes,  n_chunks, n_centroids, descriptors, n_desc};
  return nav;
}

// Full beam search. Returns the number of visited nodes written to
// out_ids/out_scores (ranked by exact score desc, id asc at ties), or -1
// on a parse/IO failure. counters := {node_reads, pq_comparisons}.
// spec > 0 enables speculative frontier reads: each hop also fetches the
// next `spec` best frontier candidates (ranks bw..bw+spec-1) in the SAME
// fan-out batch, caching them for the hop that later visits them. The
// search order, scores and results are bit-identical to spec=0 — only
// the IO schedule changes (deeper effective queue depth per disk
// round-trip, the single-stream analogue of the reference's io_uring
// QD; cold single-stream latency is otherwise bounded by ~hops x one
// QD<=beamwidth round-trip). On the mmap path speculation becomes
// POSIX_MADV_WILLNEED kernel readahead. node_reads counts actual IO
// issued (speculative included; cache hits are not re-counted).
int64_t disknav_search(void* handle, const float* lut, const float* query,
                       const float* desc_scales, int use_desc,
                       int64_t start_id, int64_t beamwidth,
                       int64_t search_list, int64_t* out_ids,
                       float* out_scores, int64_t max_out,
                       int64_t* counters, int64_t spec) {
  auto* nav = static_cast<Nav*>(handle);
  const float* f16 = f16_table().t;
  const int64_t rs = nav->reader->record_size;
  int64_t node_reads = 0, pq_cmps = 0;

  auto adc = [&](int64_t id) {
    const uint8_t* code = nav->pq_codes + id * nav->n_chunks;
    const int64_t nc = nav->n_centroids;
    float s0 = 0.f, s1 = 0.f, s2 = 0.f, s3 = 0.f;
    int64_t c = 0;
    for (; c + 4 <= nav->n_chunks; c += 4) {
      s0 += lut[c * nc + code[c]];
      s1 += lut[(c + 1) * nc + code[c + 1]];
      s2 += lut[(c + 2) * nc + code[c + 2]];
      s3 += lut[(c + 3) * nc + code[c + 3]];
    }
    for (; c < nav->n_chunks; ++c) s0 += lut[c * nc + code[c]];
    return s0 + s1 + s2 + s3;
  };
  auto desc_dot = [&](int64_t id) {
    const uint8_t* dsc = nav->descriptors + id * nav->n_desc;
    float s = 0.f;
    for (int64_t c = 0; c < nav->n_desc; ++c) s += dsc[c] * desc_scales[c];
    return s;
  };

  std::vector<uint64_t> seen((nav->count + 63) / 64, 0);
  auto test_set = [&](int64_t id) {
    uint64_t& w = seen[id >> 6];
    uint64_t bit = 1ull << (id & 63);
    bool was = w & bit;
    w |= bit;
    return was;
  };

  std::vector<FrontierEntry> frontier;
  frontier.reserve(2 * search_list + 256);
  test_set(start_id);
  frontier.push_back({adc(start_id) + (use_desc ? desc_dot(start_id) : 0.f),
                      start_id});
  pq_cmps += 1;

  std::vector<FrontierEntry> visited;
  visited.reserve(search_list + beamwidth + 1);
  std::vector<int64_t> hop_cands;
  hop_cands.reserve(beamwidth * 512);
  std::vector<float> hop_scores;
  if (spec < 0) spec = 0;
  std::vector<char> buf((beamwidth + spec) * rs);
  std::vector<int64_t> batch(beamwidth);
  std::vector<int64_t> read_ids;
  read_ids.reserve(beamwidth + spec);
  // speculative records read ahead of their visit; consumed (moved out)
  // when the beam reaches them, so each node is read at most once
  std::unordered_map<int64_t, std::vector<char>> spec_cache;
  std::vector<const uint8_t*> recptr(beamwidth);
  std::vector<std::vector<char>> owned(beamwidth);
  // total order (score desc, id asc — the NeighbourBuffer composite
  // key): nth_element partition *sets* are then unique, so beam and
  // truncation selections cannot differ between the one-partition
  // (spec=0) and two-partition (spec>0) paths on exact score ties
  // (duplicate records produce identical ADC scores), keeping the
  // spec-invariance contract bit-exact
  auto by_score_desc = [](const FrontierEntry& a, const FrontierEntry& b) {
    if (a.score != b.score) return a.score > b.score;
    return a.id < b.id;
  };

  while (!frontier.empty()) {
    int64_t bw = std::min<int64_t>(beamwidth, frontier.size());
    int64_t want = std::min<int64_t>(bw + spec, frontier.size());
    if ((int64_t)frontier.size() > want)
      std::nth_element(frontier.begin(), frontier.begin() + want - 1,
                       frontier.end(), by_score_desc);
    if (want > bw)
      std::nth_element(frontier.begin(), frontier.begin() + bw - 1,
                       frontier.begin() + want, by_score_desc);
    for (int64_t i = 0; i < bw; ++i) batch[i] = frontier[i].id;
    // ranks bw..want-1 stay in the frontier; they are only prefetched
    const int64_t n_spec = want - bw;
    std::vector<int64_t> spec_ids(n_spec);
    for (int64_t i = 0; i < n_spec; ++i) spec_ids[i] = frontier[bw + i].id;
    frontier.erase(frontier.begin(), frontier.begin() + bw);

    const uint8_t* map = nav->reader->map;
    if (map != nullptr) {
      // zero-copy warm path: records parsed in place from the mapping
      // (no syscall, no memcpy); cold pages fault synchronously
      for (int64_t i = 0; i < bw; ++i) {
        if ((batch[i] + 1) * rs > (int64_t)nav->reader->map_len) return -1;
        __builtin_prefetch(map + batch[i] * rs, 0, 0);
      }
      // speculation on the mmap path = kernel readahead of the likely
      // next hops (record offsets are page-aligned: rs = 4096)
      for (int64_t i = 0; i < n_spec; ++i) {
        if ((spec_ids[i] + 1) * rs <= (int64_t)nav->reader->map_len)
          ::posix_madvise(const_cast<uint8_t*>(map) + spec_ids[i] * rs,
                          rs, POSIX_MADV_WILLNEED);
      }
      node_reads += bw;
    } else {
      // one fan-out batch: beam nodes missing from the cache, then the
      // speculative candidates (pool threads overlap all of them)
      read_ids.clear();
      for (int64_t i = 0; i < bw; ++i) {
        recptr[i] = nullptr;
        auto it = spec_cache.find(batch[i]);
        if (it != spec_cache.end()) {
          owned[i] = std::move(it->second);
          spec_cache.erase(it);
          recptr[i] = (const uint8_t*)owned[i].data();
        } else {
          read_ids.push_back(batch[i]);
        }
      }
      const int64_t n_beam_reads = (int64_t)read_ids.size();
      for (int64_t i = 0; i < n_spec; ++i)
        if (!spec_cache.count(spec_ids[i])) read_ids.push_back(spec_ids[i]);
      const int64_t n_reads = (int64_t)read_ids.size();
      if (n_reads > 0 && diskio_read_batch(nav->reader, read_ids.data(),
                                           n_reads, buf.data()) != n_reads)
        return -1;
      node_reads += n_reads;
      // scatter: beam misses in read order, then cache the speculatives
      int64_t pos = 0;
      for (int64_t i = 0; i < bw; ++i)
        if (recptr[i] == nullptr)
          recptr[i] = (const uint8_t*)buf.data() + (pos++) * rs;
      for (; pos < n_reads; ++pos) {
        std::vector<char> rec(rs);
        std::memcpy(rec.data(), buf.data() + pos * rs, rs);
        spec_cache.emplace(read_ids[pos], std::move(rec));
      }
      (void)n_beam_reads;
    }

    for (int64_t i = 0; i < bw; ++i) {
      ParsedNode node;
      const uint8_t* rec = map != nullptr
                               ? map + batch[i] * rs
                               : recptr[i];
      if (!parse_record(rec, rs, &node))
        return -1;
      // exact fp16 dot (+ descriptor product, matching the reference's
      // slider reordering of final results, query_disk_index.rs:168-169)
      float exact = 0.f;
      int64_t nd = std::min(node.vec_len, nav->d);
      int64_t j = 0;
#if defined(__F16C__) && defined(__AVX2__)
      {
        __m256 acc0 = _mm256_setzero_ps(), acc1 = _mm256_setzero_ps();
        for (; j + 16 <= nd; j += 16) {
          __m128i h0 = _mm_loadu_si128((const __m128i*)(node.vec_f16 + 2 * j));
          __m128i h1 =
              _mm_loadu_si128((const __m128i*)(node.vec_f16 + 2 * j + 16));
          acc0 = _mm256_fmadd_ps(_mm256_cvtph_ps(h0),
                                 _mm256_loadu_ps(query + j), acc0);
          acc1 = _mm256_fmadd_ps(_mm256_cvtph_ps(h1),
                                 _mm256_loadu_ps(query + j + 8), acc1);
        }
        __m256 acc = _mm256_add_ps(acc0, acc1);
        float tmp[8];
        _mm256_storeu_ps(tmp, acc);
        exact = tmp[0] + tmp[1] + tmp[2] + tmp[3] + tmp[4] + tmp[5] +
                tmp[6] + tmp[7];
      }
#endif
      for (; j < nd; ++j) {
        uint16_t h;
        std::memcpy(&h, node.vec_f16 + 2 * j, 2);
        exact += query[j] * f16[h];
      }
      if (use_desc) exact += desc_dot(node.id);
      visited.push_back({exact, node.id});

      for (int64_t vi = 0; vi < node.n_vertices; ++vi) {
        int64_t v = node.vertices[vi];
        if (v < 0 || v >= nav->count || test_set(v)) continue;
        // prefetch the candidate's PQ row now: at 1e7 nodes the code
        // matrix is ~640 MB, so every admission is a cold random
        // cache-line miss that would otherwise serialise inside the
        // ADC loop below (the reference prefetches identically:
        // diskann/src/vector.rs fast_dot prefetch variants)
        __builtin_prefetch(nav->pq_codes + v * nav->n_chunks, 0, 1);
        if (use_desc)
          __builtin_prefetch(nav->descriptors + v * nav->n_desc, 0, 1);
        hop_cands.push_back(v);
      }
    }

    // chunk-major batched ADC over this hop's new candidates: each
    // 1 KB LUT row stays L1-resident across the whole candidate block
    // (per-candidate scoring walked all 64 rows per code and thrashed)
    if (!hop_cands.empty()) {
      size_t hc = hop_cands.size();
      hop_scores.assign(hc, 0.f);
      for (int64_t c = 0; c < nav->n_chunks; ++c) {
        const float* lrow = lut + c * nav->n_centroids;
        for (size_t x = 0; x < hc; ++x)
          hop_scores[x] += lrow[nav->pq_codes[hop_cands[x] * nav->n_chunks + c]];
      }
      pq_cmps += (int64_t)hc;
      for (size_t x = 0; x < hc; ++x) {
        float approx = hop_scores[x];
        if (use_desc) approx += desc_dot(hop_cands[x]);
        frontier.push_back({approx, hop_cands[x]});
      }
      hop_cands.clear();
    }

    if ((int64_t)frontier.size() > 2 * search_list) {
      std::nth_element(frontier.begin(), frontier.begin() + search_list - 1,
                       frontier.end(), by_score_desc);
      frontier.resize(search_list);
    }
    if ((int64_t)visited.size() >= search_list) break;
  }

  std::sort(visited.begin(), visited.end(),
            [](const FrontierEntry& a, const FrontierEntry& b) {
              if (a.score != b.score) return a.score > b.score;
              return a.id < b.id;
            });
  int64_t n_out = std::min<int64_t>(visited.size(), max_out);
  for (int64_t i = 0; i < n_out; ++i) {
    out_ids[i] = visited[i].id;
    out_scores[i] = visited[i].score;
  }
  counters[0] = node_reads;
  counters[1] = pq_cmps;
  return n_out;
}

void disknav_close(void* handle) { delete static_cast<Nav*>(handle); }

// ---------------------------------------------------------------------------
// stitch_refill — the RobustStitch slot-refill loop (lib.rs:326-374
// semantics), exact and sequential. The loop carries per-in-neighbour
// state (degree, membership, per-pair budget) that defeats numpy
// vectorisation: measured on this host, int64-key isin/argsort machinery
// costs 2-3x the interpreted loop it replaces, so the loop runs here at
// native speed instead. Python fallback kept in index/vamana.py.
//
// graph: (n, r) int32 adjacency, -1-padded; degrees: (n,) int32;
// in_ns: (P,) int32 former in-neighbours in stream order; cands:
// (P, r) int32 candidate ids in score-rank order.
void stitch_refill(int32_t* graph, int32_t* degrees, int64_t n,
                   const int32_t* in_ns, int64_t n_pairs,
                   const int32_t* cands, int64_t bp, int64_t max_add,
                   int64_t r) {
  for (int64_t p = 0; p < n_pairs; ++p) {
    int32_t in_n = in_ns[p];
    int32_t* row = graph + (int64_t)in_n * r;
    int32_t deg = degrees[in_n];
    int64_t added = 0;
    const int32_t* cand_row = cands + p * r;
    for (int64_t j = 0; j < r && added < max_add && deg < r; ++j) {
      int32_t c = cand_row[j];
      if (c < 0 || c >= bp) continue;
      bool present = false;
      for (int32_t k = 0; k < deg; ++k)
        if (row[k] == c) {
          present = true;
          break;
        }
      if (present) continue;
      row[deg++] = c;
      ++added;
    }
    degrees[in_n] = deg;
  }
}

}  // extern "C"
