// mimo_tpu native data loader: memory-mapped float32 matrix files with
// multithreaded row gather and CSV ingestion.
//
// Purpose: out-of-core datasets for stochastic VI — the host samples
// minibatches from an mmap'd file (no GIL, no Python loop, pages faulted
// on demand) while the device crunches the previous batch. The reference
// holds all data in a NumPy array (RAM-bound at ~1e7 points,
// SURVEY.md §6); this loader removes the host-RAM ceiling.
//
// ABI (C, used from Python via ctypes):
//   void* mimo_open(const char* path, long* n_rows, long* n_cols);
//   void  mimo_close(void* handle);
//   void  mimo_gather(void* handle, const long* idx, long count,
//                     float* out, int n_threads);
//   long  mimo_csv_to_bin(const char* csv, const char* bin);  // rows or -1
//
// Binary format: 16-byte header {int64 n_rows, int64 n_cols} then
// row-major float32 data.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Dataset {
  int fd = -1;
  void* map = nullptr;
  size_t map_bytes = 0;
  int64_t rows = 0;
  int64_t cols = 0;
  const float* data = nullptr;
};

}  // namespace

extern "C" {

void* mimo_open(const char* path, int64_t* n_rows, int64_t* n_cols) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(map, st.st_size, MADV_RANDOM);
  auto* ds = new Dataset;
  ds->fd = fd;
  ds->map = map;
  ds->map_bytes = static_cast<size_t>(st.st_size);
  const int64_t* hdr = static_cast<const int64_t*>(map);
  ds->rows = hdr[0];
  ds->cols = hdr[1];
  ds->data = reinterpret_cast<const float*>(hdr + 2);
  // validate with division, not multiplication: rows*cols*4 can wrap
  // modulo 2^64 for a corrupt header and pass a product-based check
  const size_t payload = ds->map_bytes - 16;
  if (ds->rows <= 0 || ds->cols <= 0 ||
      static_cast<size_t>(ds->cols) > payload / sizeof(float) ||
      static_cast<size_t>(ds->rows) >
          payload / (sizeof(float) * static_cast<size_t>(ds->cols))) {
    munmap(map, st.st_size);
    ::close(fd);
    delete ds;
    return nullptr;
  }
  if (n_rows) *n_rows = ds->rows;
  if (n_cols) *n_cols = ds->cols;
  return ds;
}

void mimo_close(void* handle) {
  auto* ds = static_cast<Dataset*>(handle);
  if (!ds) return;
  if (ds->map) munmap(ds->map, ds->map_bytes);
  if (ds->fd >= 0) ::close(ds->fd);
  delete ds;
}

// Gather rows idx[0..count) into out (count x cols), multithreaded.
void mimo_gather(void* handle, const int64_t* idx, int64_t count,
                 float* out, int n_threads) {
  auto* ds = static_cast<Dataset*>(handle);
  if (!ds || count <= 0) return;
  const int64_t cols = ds->cols;
  const size_t row_bytes = sizeof(float) * static_cast<size_t>(cols);
  int threads = n_threads > 0 ? n_threads : 4;
  if (threads > count) threads = static_cast<int>(count);

  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t r = idx[i];
      if (r < 0 || r >= ds->rows) {
        memset(out + i * cols, 0, row_bytes);
      } else {
        memcpy(out + i * cols, ds->data + r * cols, row_bytes);
      }
    }
  };
  if (threads <= 1) {
    worker(0, count);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (count + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < count ? lo + chunk : count;
    if (lo >= hi) break;
    pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// Sequential slab read: rows [start, start+count) into out.
void mimo_read_block(void* handle, int64_t start, int64_t count,
                     float* out) {
  auto* ds = static_cast<Dataset*>(handle);
  if (!ds) return;
  if (start < 0) start = 0;
  if (start + count > ds->rows) count = ds->rows - start;
  if (count <= 0) return;
  memcpy(out, ds->data + start * ds->cols,
         sizeof(float) * static_cast<size_t>(count) * ds->cols);
}

// Parse a headerless numeric CSV into the binary format. Returns the row
// count, or -1 on failure. Two passes: count columns/rows, then parse.
int64_t mimo_csv_to_bin(const char* csv_path, const char* bin_path) {
  FILE* f = fopen(csv_path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return -1;
  }
  fclose(f);
  buf[size] = '\0';

  // count columns from the first line
  int64_t cols = 1;
  for (long i = 0; i < size && buf[i] != '\n'; ++i)
    if (buf[i] == ',') ++cols;

  std::vector<float> vals;
  vals.reserve(1 << 20);
  char* p = buf.data();
  char* end = buf.data() + size;
  while (p < end) {
    char* next = nullptr;
    float v = strtof(p, &next);
    if (next == p) {
      ++p;  // skip separators / newlines / stray chars
      continue;
    }
    vals.push_back(v);
    p = next;
  }
  if (vals.empty() || vals.size() % cols != 0) return -1;
  int64_t rows = static_cast<int64_t>(vals.size()) / cols;

  FILE* out = fopen(bin_path, "wb");
  if (!out) return -1;
  int64_t hdr[2] = {rows, cols};
  fwrite(hdr, sizeof(int64_t), 2, out);
  fwrite(vals.data(), sizeof(float), vals.size(), out);
  fclose(out);
  return rows;
}

// Write a float32 matrix to the binary format (for converters/tests).
int64_t mimo_write_bin(const char* path, const float* data, int64_t rows,
                       int64_t cols) {
  FILE* out = fopen(path, "wb");
  if (!out) return -1;
  int64_t hdr[2] = {rows, cols};
  fwrite(hdr, sizeof(int64_t), 2, out);
  size_t n = static_cast<size_t>(rows) * cols;
  size_t written = fwrite(data, sizeof(float), n, out);
  fclose(out);
  return written == n ? rows : -1;
}

}  // extern "C"
