// uwu_dataio — native data-loading runtime for uwudiff_tpu.
//
// A multi-threaded, GIL-free shard reader + batch prefetch ring for the
// latent-cache training path (the production hot path: pre-encoded
// latents/embeddings stream from npz shards into the jitted train step).
// Python's single-threaded reader stalls the step at high throughput;
// this pool decodes shards and assembles batches in C++ worker threads
// while the device computes.
//
// Scope: uncompressed (STORED) zip members — exactly what numpy's
// np.savez emits — with .npy v1/v2 headers, C-contiguous arrays.
//
// C ABI (ctypes-friendly):
//   uwu_open(paths, n)                -> handle (parses all headers)
//   uwu_num_arrays / uwu_array_info    -> introspection
//   uwu_read(handle, shard, name, dst) -> one array, memcpy from mmap
//   uwu_batch_start(handle, name, indices..., bs, threads)
//         -> background assembly of gather-batches into a ring
//   uwu_batch_next(loader, dst)        -> blocking pop of next batch
//   uwu_close / uwu_batch_stop

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

#pragma pack(push, 1)
struct ZipLocalHeader {
  uint32_t sig;            // 0x04034b50
  uint16_t version;
  uint16_t flags;
  uint16_t method;         // 0 = stored
  uint16_t mtime, mdate;
  uint32_t crc;
  uint32_t comp_size;
  uint32_t uncomp_size;
  uint16_t name_len;
  uint16_t extra_len;
};
#pragma pack(pop)

struct ArrayView {
  const uint8_t* data = nullptr;  // element data (past the .npy header)
  uint64_t nbytes = 0;
  std::vector<int64_t> shape;
  char dtype_kind = 'f';
  int dtype_size = 4;
};

struct Shard {
  int fd = -1;
  const uint8_t* map = nullptr;
  uint64_t size = 0;
  std::unordered_map<std::string, ArrayView> arrays;
};

bool parse_npy(const uint8_t* p, uint64_t avail, ArrayView* out) {
  if (avail < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) return false;
  uint8_t major = p[6];
  uint64_t hdr_len, hdr_off;
  if (major == 1) {
    hdr_len = p[8] | (p[9] << 8);
    hdr_off = 10;
  } else {
    hdr_len = p[8] | (p[9] << 8) | (uint64_t(p[10]) << 16) |
              (uint64_t(p[11]) << 24);
    hdr_off = 12;
  }
  std::string hdr(reinterpret_cast<const char*>(p + hdr_off), hdr_len);
  // descr
  auto dpos = hdr.find("'descr':");
  if (dpos == std::string::npos) return false;
  auto q0 = hdr.find('\'', dpos + 8);
  auto q1 = hdr.find('\'', q0 + 1);
  std::string descr = hdr.substr(q0 + 1, q1 - q0 - 1);  // e.g. "<f4"
  if (hdr.find("'fortran_order': True") != std::string::npos) return false;
  out->dtype_kind = descr.size() > 1 ? descr[1] : 'f';
  out->dtype_size = std::stoi(descr.substr(2));
  // shape tuple
  auto spos = hdr.find("'shape':");
  auto p0 = hdr.find('(', spos);
  auto p1 = hdr.find(')', p0);
  std::string shape_str = hdr.substr(p0 + 1, p1 - p0 - 1);
  out->shape.clear();
  int64_t cur = -1;
  for (char c : shape_str) {
    if (c >= '0' && c <= '9') {
      if (cur < 0) cur = 0;
      cur = cur * 10 + (c - '0');
    } else if (cur >= 0) {
      out->shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) out->shape.push_back(cur);
  uint64_t n = 1;
  for (auto s : out->shape) n *= uint64_t(s);
  out->nbytes = n * out->dtype_size;
  out->data = p + hdr_off + hdr_len;
  return true;
}

bool parse_shard(const char* path, Shard* shard) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return false; }
  auto* map = static_cast<const uint8_t*>(
      mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  if (map == MAP_FAILED) { ::close(fd); return false; }
  shard->fd = fd;
  shard->map = map;
  shard->size = st.st_size;

  // walk local headers front-to-back (np.savez writes sequentially;
  // entries use ZIP64 extra fields: sizes live at extra id 0x0001)
  uint64_t off = 0;
  while (off + sizeof(ZipLocalHeader) <= shard->size) {
    const auto* lh = reinterpret_cast<const ZipLocalHeader*>(map + off);
    if (lh->sig != 0x04034b50) break;  // central directory reached
    std::string name(reinterpret_cast<const char*>(map + off +
                                                   sizeof(ZipLocalHeader)),
                     lh->name_len);
    uint64_t comp_size = lh->comp_size;
    if (comp_size == 0xFFFFFFFFu) {  // ZIP64
      const uint8_t* extra =
          map + off + sizeof(ZipLocalHeader) + lh->name_len;
      uint64_t epos = 0;
      while (epos + 4 <= lh->extra_len) {
        uint16_t id, sz;
        std::memcpy(&id, extra + epos, 2);
        std::memcpy(&sz, extra + epos + 2, 2);
        if (id == 0x0001 && sz >= 16) {
          // uncompressed size (8) then compressed size (8)
          std::memcpy(&comp_size, extra + epos + 4 + 8, 8);
          break;
        }
        epos += 4 + sz;
      }
    }
    uint64_t data_off =
        off + sizeof(ZipLocalHeader) + lh->name_len + lh->extra_len;
    if (lh->method == 0) {  // stored
      ArrayView view;
      if (parse_npy(map + data_off, shard->size - data_off, &view)) {
        // strip ".npy"
        if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
          name = name.substr(0, name.size() - 4);
        shard->arrays[name] = view;
      }
    }
    if (comp_size == 0xFFFFFFFFu) break;  // size unknown: stop the walk
    off = data_off + comp_size;
  }
  return !shard->arrays.empty();
}

struct Handle {
  std::vector<Shard> shards;
};

struct Batch {
  std::vector<uint8_t> data;
};

struct BatchLoader {
  Handle* handle = nullptr;
  std::string array_name;
  std::vector<std::pair<int32_t, int32_t>> order;  // (shard, row)
  int batch_size = 0;
  uint64_t row_bytes = 0;

  // ordered ring: batches are consumed strictly in index order so that
  // parallel loaders over different arrays of the same shards stay
  // row-aligned with each other
  std::map<size_t, Batch> ring;
  size_t ring_cap = 4;
  size_t consume_cursor = 0;  // guarded by mu
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::atomic<bool> stop{false};
  std::atomic<size_t> next_batch{0};
  std::vector<std::thread> workers;

  size_t n_batches() const { return order.size() / batch_size; }

  void worker() {
    while (!stop.load()) {
      size_t b = next_batch.fetch_add(1);
      if (b >= n_batches()) break;
      Batch batch;
      batch.data.resize(row_bytes * batch_size);
      for (int i = 0; i < batch_size; ++i) {
        auto [si, row] = order[b * batch_size + i];
        const auto& arr = handle->shards[si].arrays.at(array_name);
        std::memcpy(batch.data.data() + i * row_bytes,
                    arr.data + uint64_t(row) * row_bytes, row_bytes);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_put.wait(lk, [&] {
        return b < consume_cursor + ring_cap || stop.load();
      });
      if (stop.load()) break;
      ring.emplace(b, std::move(batch));
      cv_get.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* uwu_open(const char** paths, int n_paths) {
  auto* h = new Handle();
  h->shards.resize(n_paths);
  for (int i = 0; i < n_paths; ++i) {
    if (!parse_shard(paths[i], &h->shards[i])) {
      delete h;
      return nullptr;
    }
  }
  return h;
}

int uwu_num_arrays(void* handle, int shard) {
  auto* h = static_cast<Handle*>(handle);
  return int(h->shards[shard].arrays.size());
}

// info: ndim into *ndim, shape into shape[8], dtype size return value;
// returns -1 if missing
int uwu_array_info(void* handle, int shard, const char* name, int* ndim,
                   int64_t* shape) {
  auto* h = static_cast<Handle*>(handle);
  auto it = h->shards[shard].arrays.find(name);
  if (it == h->shards[shard].arrays.end()) return -1;
  const auto& a = it->second;
  *ndim = int(a.shape.size());
  for (size_t i = 0; i < a.shape.size() && i < 8; ++i) shape[i] = a.shape[i];
  return a.dtype_size;
}

// copy one whole array out of the mmap
int uwu_read(void* handle, int shard, const char* name, void* dst) {
  auto* h = static_cast<Handle*>(handle);
  auto it = h->shards[shard].arrays.find(name);
  if (it == h->shards[shard].arrays.end()) return -1;
  std::memcpy(dst, it->second.data, it->second.nbytes);
  return 0;
}

// background batch assembly: gather rows (shard_idx[i], row_idx[i]) into
// batches of `batch_size`, `n_threads` workers, ring of 4 batches
void* uwu_batch_start(void* handle, const char* name,
                      const int32_t* shard_idx, const int32_t* row_idx,
                      int n_rows, int batch_size, int n_threads) {
  auto* h = static_cast<Handle*>(handle);
  auto* bl = new BatchLoader();
  bl->handle = h;
  bl->array_name = name;
  bl->batch_size = batch_size;
  const auto& a0 = h->shards[shard_idx[0]].arrays.at(name);
  uint64_t row = a0.dtype_size;
  for (size_t i = 1; i < a0.shape.size(); ++i) row *= a0.shape[i];
  bl->row_bytes = row;
  bl->order.reserve(n_rows);
  for (int i = 0; i < n_rows; ++i)
    bl->order.emplace_back(shard_idx[i], row_idx[i]);
  for (int t = 0; t < n_threads; ++t)
    bl->workers.emplace_back([bl] { bl->worker(); });
  return bl;
}

// blocking pop of the NEXT batch in order; returns 0 on success,
// 1 when exhausted
int uwu_batch_next(void* loader, void* dst) {
  auto* bl = static_cast<BatchLoader*>(loader);
  std::unique_lock<std::mutex> lk(bl->mu);
  if (bl->consume_cursor >= bl->n_batches()) return 1;
  size_t want = bl->consume_cursor;
  bl->cv_get.wait(lk, [&] {
    return bl->ring.count(want) > 0 || bl->stop.load();
  });
  if (bl->stop.load() && bl->ring.count(want) == 0) return 1;
  Batch b = std::move(bl->ring.at(want));
  bl->ring.erase(want);
  bl->consume_cursor = want + 1;
  bl->cv_put.notify_all();
  lk.unlock();
  std::memcpy(dst, b.data.data(), b.data.size());
  return 0;
}

void uwu_batch_stop(void* loader) {
  auto* bl = static_cast<BatchLoader*>(loader);
  bl->stop.store(true);
  bl->cv_put.notify_all();
  bl->cv_get.notify_all();
  for (auto& w : bl->workers)
    if (w.joinable()) w.join();
  delete bl;
}

void uwu_close(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  for (auto& s : h->shards) {
    if (s.map) munmap(const_cast<uint8_t*>(s.map), s.size);
    if (s.fd >= 0) ::close(s.fd);
  }
  delete h;
}

}  // extern "C"
