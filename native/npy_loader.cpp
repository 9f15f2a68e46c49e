// Native .npy shard loader: mmap + parallel row gather.
//
// Host-side runtime component for the data pipeline.  The Python pipeline
// keeps whole datasets device-resident (they are small); for out-of-core
// datasets this library memory-maps .npy shards and gathers arbitrary sample
// rows into a caller-provided contiguous batch buffer with a thread pool,
// so batch assembly overlaps device compute (driven from
// ultrasound_modeling_tpu/data/native_loader.py via ctypes).
//
// Replaces the role of the reference's tf.data host threading
// (reference: Dataset.py:17-28) with an explicit, allocation-free gather.
//
// Exposed C ABI:
//   void*   uml_open(const char* path)           -> handle or NULL
//   int     uml_ndim(void*)                      -> rank
//   int64_t uml_dim(void*, int i)                -> shape[i]
//   int     uml_itemsize(void*)                  -> element bytes
//   char    uml_kind(void*)                      -> 'f' | 'i' | 'u' | 'b'
//   int64_t uml_row_bytes(void*)                 -> bytes per leading-dim row
//   int     uml_gather(void*, const int64_t* idx, int64_t n, void* out,
//                      int n_threads)            -> 0 ok / -1 bad index
//   void    uml_close(void*)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct NpyFile {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_len = 0;
  const uint8_t* data = nullptr;  // first element
  std::vector<int64_t> shape;
  int itemsize = 0;
  char kind = 'f';
  int64_t row_bytes = 0;
};

// Minimal .npy v1/v2 header parse (little-endian, C-contiguous only).
bool parse_header(NpyFile* f) {
  if (f->map_len < 10 || std::memcmp(f->map, "\x93NUMPY", 6) != 0) return false;
  const uint8_t major = f->map[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = f->map[8] | (f->map[9] << 8);
    header_off = 10;
  } else {
    header_len = f->map[8] | (f->map[9] << 8) |
                 (size_t(f->map[10]) << 16) | (size_t(f->map[11]) << 24);
    header_off = 12;
  }
  if (header_off + header_len > f->map_len) return false;
  std::string h(reinterpret_cast<const char*>(f->map + header_off), header_len);

  // fortran_order must be False.
  if (h.find("'fortran_order': True") != std::string::npos) return false;

  // descr: e.g. '<f4', '<f8', '|u1'
  size_t dpos = h.find("'descr'");
  if (dpos == std::string::npos) return false;
  size_t q1 = h.find('\'', dpos + 7);
  size_t q2 = h.find('\'', q1 + 1);
  std::string descr = h.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3) return false;
  if (descr[0] == '>') return false;  // big-endian unsupported
  f->kind = descr[1];
  f->itemsize = std::atoi(descr.c_str() + 2);
  if (f->itemsize <= 0) return false;

  // shape tuple
  size_t spos = h.find("'shape'");
  if (spos == std::string::npos) return false;
  size_t p1 = h.find('(', spos);
  size_t p2 = h.find(')', p1);
  std::string tup = h.substr(p1 + 1, p2 - p1 - 1);
  f->shape.clear();
  const char* s = tup.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    f->shape.push_back(std::strtoll(s, const_cast<char**>(&s), 10));
  }
  if (f->shape.empty()) return false;

  f->data = f->map + header_off + header_len;
  int64_t row = f->itemsize;
  for (size_t i = 1; i < f->shape.size(); ++i) row *= f->shape[i];
  f->row_bytes = row;
  // Validate total size.
  size_t need = size_t(row) * size_t(f->shape[0]);
  size_t have = f->map_len - (header_off + header_len);
  return need <= have;
}

}  // namespace

extern "C" {

void* uml_open(const char* path) {
  auto* f = new NpyFile();
  f->fd = ::open(path, O_RDONLY);
  if (f->fd < 0) { delete f; return nullptr; }
  struct stat st;
  if (fstat(f->fd, &st) != 0) { ::close(f->fd); delete f; return nullptr; }
  f->map_len = size_t(st.st_size);
  f->map = static_cast<const uint8_t*>(
      mmap(nullptr, f->map_len, PROT_READ, MAP_PRIVATE, f->fd, 0));
  if (f->map == MAP_FAILED || !parse_header(f)) {
    if (f->map != MAP_FAILED) munmap(const_cast<uint8_t*>(f->map), f->map_len);
    ::close(f->fd);
    delete f;
    return nullptr;
  }
  // Row gathers touch scattered pages: tell the kernel NOT to run
  // file-wide readahead.  (MADV_WILLNEED over the whole mapping would
  // prefetch the entire archive — self-defeating for the out-of-core
  // larger-than-RAM datasets this loader exists for; per-gather WILLNEED
  // on the touched rows happens in uml_gather.)
  madvise(const_cast<uint8_t*>(f->map), f->map_len, MADV_RANDOM);
  return f;
}

int uml_ndim(void* h) { return int(static_cast<NpyFile*>(h)->shape.size()); }

int64_t uml_dim(void* h, int i) {
  auto* f = static_cast<NpyFile*>(h);
  return (i >= 0 && size_t(i) < f->shape.size()) ? f->shape[i] : -1;
}

int uml_itemsize(void* h) { return static_cast<NpyFile*>(h)->itemsize; }

char uml_kind(void* h) { return static_cast<NpyFile*>(h)->kind; }

int64_t uml_row_bytes(void* h) { return static_cast<NpyFile*>(h)->row_bytes; }

int uml_gather(void* h, const int64_t* idx, int64_t n, void* out,
               int n_threads) {
  auto* f = static_cast<NpyFile*>(h);
  const int64_t rows = f->shape[0];
  for (int64_t i = 0; i < n; ++i)
    if (idx[i] < 0 || idx[i] >= rows) return -1;

  // Async readahead for exactly the requested rows (page-aligned) — the
  // cold-cache out-of-core path overlaps disk I/O with the copies below;
  // a no-op when pages are already resident.
  const long pg = sysconf(_SC_PAGESIZE);
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = f->data + idx[i] * f->row_bytes;
    auto a = reinterpret_cast<uintptr_t>(p) & ~uintptr_t(pg - 1);
    size_t len = size_t(reinterpret_cast<uintptr_t>(p) + f->row_bytes - a);
    madvise(reinterpret_cast<void*>(a), len, MADV_WILLNEED);
  }

  auto copy_range = [&](int64_t lo, int64_t hi) {
    uint8_t* dst = static_cast<uint8_t*>(out) + lo * f->row_bytes;
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst, f->data + idx[i] * f->row_bytes, size_t(f->row_bytes));
      dst += f->row_bytes;
    }
  };

  if (n_threads <= 1 || n < 2 * n_threads) {
    copy_range(0, n);
    return 0;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(copy_range, lo, hi);
  }
  for (auto& th : pool) th.join();
  return 0;
}

void uml_close(void* h) {
  auto* f = static_cast<NpyFile*>(h);
  if (f->map) munmap(const_cast<uint8_t*>(f->map), f->map_len);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

}  // extern "C"
