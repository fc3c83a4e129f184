// uwu_tario — native tar-shard reader for uwudiff_tpu.
//
// WebDataset-style training streams read samples out of plain tar
// archives ("shards"); Python's tarfile walks headers with per-member
// object overhead and holds the GIL through reads. This runtime mmaps
// every shard once, builds a flat member index up front, and serves
// member bytes as GIL-free memcpys (ctypes releases the GIL during the
// call), so a Python thread pool over tar-read + native image decode
// gets true parallelism.
//
// Format scope (everything Python's tarfile and GNU tar emit):
//   - POSIX ustar headers (name[100] + prefix[155])
//   - GNU long-name records (typeflag 'L' overrides the next header)
//   - PAX extended headers (typeflag 'x': `path=` overrides; 'g'
//     globals skipped)
//   - octal sizes + GNU base-256 (high-bit) sizes
//   - only regular files ('0' / '\0') are indexed
//
// C ABI (ctypes-friendly):
//   uwu_tar_open(paths, n)        -> handle (indexes all shards)
//   uwu_tar_count(handle)         -> total member count
//   uwu_tar_name(handle, i)       -> member name (owned by handle)
//   uwu_tar_size(handle, i)       -> member byte size
//   uwu_tar_shard(handle, i)      -> which input shard the member is in
//   uwu_tar_read(handle, i, dst)  -> memcpy member bytes into dst
//   uwu_tar_close(handle)

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr size_t kBlock = 512;

struct TarHeader {
  char name[100];
  char mode[8];
  char uid[8];
  char gid[8];
  char size[12];
  char mtime[12];
  char chksum[8];
  char typeflag;
  char linkname[100];
  char magic[6];
  char version[2];
  char uname[32];
  char gname[32];
  char devmajor[8];
  char devminor[8];
  char prefix[155];
  char pad[12];
};
static_assert(sizeof(TarHeader) == kBlock, "tar header must be 512B");

// octal or GNU base-256 numeric field
uint64_t parse_size(const char* p, size_t n) {
  const auto* u = reinterpret_cast<const uint8_t*>(p);
  if (u[0] & 0x80) {  // base-256: big-endian, high bit marks the format
    uint64_t v = u[0] & 0x7F;
    for (size_t i = 1; i < n; ++i) v = (v << 8) | u[i];
    return v;
  }
  uint64_t v = 0;
  for (size_t i = 0; i < n && p[i]; ++i) {
    if (p[i] < '0' || p[i] > '7') continue;  // skip leading spaces
    v = (v << 3) | uint64_t(p[i] - '0');
  }
  return v;
}

bool all_zero(const uint8_t* p) {
  for (size_t i = 0; i < kBlock; ++i)
    if (p[i]) return false;
  return true;
}

// PAX extended header: "<len> key=value\n" records; return path= if any
std::string pax_path(const uint8_t* data, uint64_t size) {
  std::string out;
  uint64_t pos = 0;
  while (pos < size) {
    // decimal record length includes itself and the trailing newline
    uint64_t len = 0, p = pos;
    while (p < size && data[p] >= '0' && data[p] <= '9') {
      len = len * 10 + (data[p] - '0');
      ++p;
    }
    if (p >= size || data[p] != ' ' || len == 0 || pos + len > size) break;
    const char* rec = reinterpret_cast<const char*>(data + p + 1);
    uint64_t rec_len = len - (p + 1 - pos) - 1;  // minus prefix and \n
    if (rec_len > 5 && std::memcmp(rec, "path=", 5) == 0)
      out.assign(rec + 5, rec_len - 5);
    pos += len;
  }
  return out;
}

struct Member {
  std::string name;
  int shard;
  uint64_t offset;  // into the shard's data (past the header)
  uint64_t size;
};

struct Shard {
  const uint8_t* data = nullptr;
  uint64_t size = 0;
  int fd = -1;
};

struct TarSet {
  std::vector<Shard> shards;
  std::vector<Member> members;
};

bool index_shard(TarSet* set, int shard_idx) {
  const Shard& sh = set->shards[shard_idx];
  uint64_t pos = 0;
  std::string gnu_longname;  // pending 'L' override
  std::string pax_name;      // pending 'x' override
  int zero_blocks = 0;
  while (pos + kBlock <= sh.size) {
    const uint8_t* block = sh.data + pos;
    if (all_zero(block)) {
      if (++zero_blocks >= 2) break;  // end-of-archive marker
      pos += kBlock;
      continue;
    }
    zero_blocks = 0;
    const auto* h = reinterpret_cast<const TarHeader*>(block);
    uint64_t size = parse_size(h->size, sizeof(h->size));
    uint64_t data_pos = pos + kBlock;
    uint64_t padded = (size + kBlock - 1) / kBlock * kBlock;
    if (data_pos + padded > sh.size && size > 0) return false;  // truncated

    char type = h->typeflag;
    if (type == 'L') {  // GNU long name: data is the next member's name
      gnu_longname.assign(
          reinterpret_cast<const char*>(sh.data + data_pos),
          strnlen(reinterpret_cast<const char*>(sh.data + data_pos), size));
    } else if (type == 'x') {  // PAX per-file extended header
      std::string p = pax_path(sh.data + data_pos, size);
      if (!p.empty()) pax_name = p;
    } else if (type == 'g') {
      // PAX global header: ignored
    } else if (type == '0' || type == '\0') {
      std::string name;
      if (!pax_name.empty()) {
        name.swap(pax_name);
      } else if (!gnu_longname.empty()) {
        name.swap(gnu_longname);
      } else {
        char nbuf[101] = {0};
        std::memcpy(nbuf, h->name, 100);
        if (h->prefix[0]) {
          char pbuf[156] = {0};
          std::memcpy(pbuf, h->prefix, 155);
          name = std::string(pbuf) + "/" + nbuf;
        } else {
          name = nbuf;
        }
      }
      set->members.push_back(Member{name, shard_idx, data_pos, size});
      gnu_longname.clear();
      pax_name.clear();
    } else {
      // directories/links/devices: skip, and any pending overrides
      // apply to them, not to a later file
      gnu_longname.clear();
      pax_name.clear();
    }
    pos = data_pos + padded;
  }
  return true;
}

}  // namespace

extern "C" {

void* uwu_tar_open(const char** paths, int n) {
  auto* set = new TarSet();
  for (int i = 0; i < n; ++i) {
    int fd = ::open(paths[i], O_RDONLY);
    if (fd < 0) {
      delete set;
      return nullptr;
    }
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
      ::close(fd);
      delete set;
      return nullptr;
    }
    void* map = mmap(nullptr, size_t(st.st_size), PROT_READ, MAP_PRIVATE, fd, 0);
    if (map == MAP_FAILED) {
      ::close(fd);
      delete set;
      return nullptr;
    }
    set->shards.push_back(
        Shard{static_cast<const uint8_t*>(map), uint64_t(st.st_size), fd});
  }
  for (int i = 0; i < int(set->shards.size()); ++i) {
    if (!index_shard(set, i)) {
      for (auto& sh : set->shards) {
        munmap(const_cast<uint8_t*>(sh.data), size_t(sh.size));
        ::close(sh.fd);
      }
      delete set;
      return nullptr;
    }
  }
  return set;
}

int64_t uwu_tar_count(void* handle) {
  return int64_t(static_cast<TarSet*>(handle)->members.size());
}

const char* uwu_tar_name(void* handle, int64_t i) {
  auto* set = static_cast<TarSet*>(handle);
  if (i < 0 || size_t(i) >= set->members.size()) return nullptr;
  return set->members[size_t(i)].name.c_str();
}

int64_t uwu_tar_size(void* handle, int64_t i) {
  auto* set = static_cast<TarSet*>(handle);
  if (i < 0 || size_t(i) >= set->members.size()) return -1;
  return int64_t(set->members[size_t(i)].size);
}

int uwu_tar_shard(void* handle, int64_t i) {
  auto* set = static_cast<TarSet*>(handle);
  if (i < 0 || size_t(i) >= set->members.size()) return -1;
  return set->members[size_t(i)].shard;
}

int uwu_tar_read(void* handle, int64_t i, uint8_t* dst) {
  auto* set = static_cast<TarSet*>(handle);
  if (i < 0 || size_t(i) >= set->members.size()) return -1;
  const Member& m = set->members[size_t(i)];
  std::memcpy(dst, set->shards[m.shard].data + m.offset, size_t(m.size));
  return 0;
}

void uwu_tar_close(void* handle) {
  auto* set = static_cast<TarSet*>(handle);
  if (!set) return;
  for (auto& sh : set->shards) {
    munmap(const_cast<uint8_t*>(sh.data), size_t(sh.size));
    ::close(sh.fd);
  }
  delete set;
}

}  // extern "C"
