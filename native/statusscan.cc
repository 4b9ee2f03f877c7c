// Native working-tree status scanner — the subprocess-free dirty check.
//
// The reference computes per-entity dirty checks through libgit2's status
// machinery (src/git_async.rs:365-418 fans one thread per submodule/worktree
// so a 25k-file submodule never blocks the parent; every check runs
// `statuses()` with exclude_submodules). Our git backend rides the git CLI,
// which costs a process spawn + full porcelain scan per check. This module
// is the native equivalent of libgit2's path: it answers "is this worktree
// dirty, and how?" by reading the repository's own on-disk formats —
//
//   * .git/index (v2/v3)           → tracked set, cached stat, conflict stages
//   * object store (loose + packs) → HEAD tree for the staged comparison
//   * lstat() walk + gitignore     → unstaged + untracked detection
//
// Honesty contract: the scanner returns a *certain* answer or refuses.
// Anything that could make the fast path disagree with `git status`
// (sha256 repos, split/sparse index v4, autocrlf, content filters via
// .gitattributes, case-insensitive mode) returns WGIT_UNCERTAIN and the
// Python caller falls back to the subprocess path. Tests fuzz the verdict
// against `git status --porcelain` ground truth (tests/test_native_and_tools.py).

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <deque>
#include <mutex>
#include <chrono>
#include <thread>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <fcntl.h>
#include <map>
#include <memory>
#include <string>
#include <string_view>
#include <unordered_map>
#include <unordered_set>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Result bits / sentinel returns (keep in sync with gitcore/native.py).
// ---------------------------------------------------------------------------
constexpr int kStaged = 1;
constexpr int kUnstaged = 2;
constexpr int kUntracked = 4;
constexpr int kConflicted = 8;
constexpr int kAllBits = kStaged | kUnstaged | kUntracked | kConflicted;
constexpr int kUncertain = -1;  // caller must fall back to `git status`
constexpr int kError = -2;      // malformed repo / IO failure

// ---------------------------------------------------------------------------
// Small helpers
// ---------------------------------------------------------------------------

bool read_file(const std::string& path, std::string* out) {
  std::FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  char buf[1 << 16];
  size_t n;
  out->clear();
  while ((n = std::fread(buf, 1, sizeof buf, f)) > 0) out->append(buf, n);
  std::fclose(f);
  return true;
}

uint32_t be32(const unsigned char* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}
uint16_t be16(const unsigned char* p) {
  return uint16_t((p[0] << 8) | p[1]);
}
uint64_t be64(const unsigned char* p) {
  return (uint64_t(be32(p)) << 32) | be32(p + 4);
}

std::string lower(std::string s) {
  for (char& c : s) c = char(std::tolower(static_cast<unsigned char>(c)));
  return s;
}

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

// ---------------------------------------------------------------------------
// SHA-1 (for re-hashing racily-modified files against their index OID)
// ---------------------------------------------------------------------------

struct Sha1 {
  uint32_t h[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu, 0x10325476u,
                   0xC3D2E1F0u};
  unsigned char block[64];
  uint64_t total = 0;
  size_t fill = 0;

  static uint32_t rol(uint32_t v, int s) { return (v << s) | (v >> (32 - s)); }

  void process(const unsigned char* p) {
    uint32_t w[80];
    for (int i = 0; i < 16; ++i) w[i] = be32(p + i * 4);
    for (int i = 16; i < 80; ++i)
      w[i] = rol(w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16], 1);
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4];
    for (int i = 0; i < 80; ++i) {
      uint32_t f, k;
      if (i < 20) { f = (b & c) | (~b & d); k = 0x5A827999u; }
      else if (i < 40) { f = b ^ c ^ d; k = 0x6ED9EBA1u; }
      else if (i < 60) { f = (b & c) | (b & d) | (c & d); k = 0x8F1BBCDCu; }
      else { f = b ^ c ^ d; k = 0xCA62C1D6u; }
      uint32_t t = rol(a, 5) + f + e + k + w[i];
      e = d; d = c; c = rol(b, 30); b = a; a = t;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d; h[4] += e;
  }

  void update(const void* data, size_t n) {
    const unsigned char* p = static_cast<const unsigned char*>(data);
    total += n;
    if (fill) {
      size_t take = std::min(n, 64 - fill);
      std::memcpy(block + fill, p, take);
      fill += take; p += take; n -= take;
      if (fill == 64) { process(block); fill = 0; }
    }
    while (n >= 64) { process(p); p += 64; n -= 64; }
    if (n) { std::memcpy(block, p, n); fill = n; }
  }

  void final(unsigned char out[20]) {
    uint64_t bits = total * 8;
    unsigned char pad = 0x80;
    update(&pad, 1);
    unsigned char zero = 0;
    while (fill != 56) update(&zero, 1);
    unsigned char len[8];
    for (int i = 0; i < 8; ++i) len[i] = (unsigned char)(bits >> (56 - 8 * i));
    update(len, 8);
    for (int i = 0; i < 5; ++i) {
      out[i * 4] = (unsigned char)(h[i] >> 24);
      out[i * 4 + 1] = (unsigned char)(h[i] >> 16);
      out[i * 4 + 2] = (unsigned char)(h[i] >> 8);
      out[i * 4 + 3] = (unsigned char)(h[i]);
    }
  }
};

struct Oid {
  unsigned char b[20] = {0};
  bool operator==(const Oid& o) const { return std::memcmp(b, o.b, 20) == 0; }
  bool operator!=(const Oid& o) const { return !(*this == o); }
  bool operator<(const Oid& o) const { return std::memcmp(b, o.b, 20) < 0; }
};

bool parse_hex_oid(const char* hex, Oid* out) {
  auto nib = [](char c) -> int {
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    if (c >= 'A' && c <= 'F') return c - 'A' + 10;
    return -1;
  };
  for (int i = 0; i < 20; ++i) {
    int hi = nib(hex[i * 2]), lo = nib(hex[i * 2 + 1]);
    if (hi < 0 || lo < 0) return false;
    out->b[i] = (unsigned char)((hi << 4) | lo);
  }
  return true;
}

// Hash a worktree file as a git blob ("blob <len>\0" + content) and compare.
bool blob_hash_matches(const std::string& file_path, uint64_t size,
                       const Oid& want) {
  std::FILE* f = std::fopen(file_path.c_str(), "rb");
  if (!f) return false;
  Sha1 sha;
  char hdr[40];
  int hl = std::snprintf(hdr, sizeof hdr, "blob %llu",
                         (unsigned long long)size);
  sha.update(hdr, size_t(hl) + 1);  // include the NUL
  char buf[1 << 16];
  size_t n;
  uint64_t seen = 0;
  while ((n = std::fread(buf, 1, sizeof buf, f)) > 0) {
    sha.update(buf, n);
    seen += n;
  }
  std::fclose(f);
  if (seen != size) return false;  // changed while reading → treat as dirty
  Oid got;
  sha.final(got.b);
  return got == want;
}

bool symlink_hash_matches(const std::string& link_path, const Oid& want) {
  char target[4096];
  ssize_t n = ::readlink(link_path.c_str(), target, sizeof target);
  if (n < 0) return false;
  Sha1 sha;
  char hdr[40];
  int hl = std::snprintf(hdr, sizeof hdr, "blob %lld", (long long)n);
  sha.update(hdr, size_t(hl) + 1);
  sha.update(target, size_t(n));
  Oid got;
  sha.final(got.b);
  return got == want;
}

// ---------------------------------------------------------------------------
// Index parser (.git/index, versions 2 and 3; v4 prefix compression and the
// split-index "link" extension bail to the subprocess path)
// ---------------------------------------------------------------------------

constexpr uint32_t kModeGitlink = 0160000;

struct IndexEntry {
  std::string_view path;  // view into IndexData::raw
  uint32_t ctime_s, ctime_ns, mtime_s, mtime_ns, size, mode;
  Oid oid;
  int stage;
  bool assume_valid, skip_worktree, intent_to_add;
};

struct IndexData {
  std::string raw;                  // the whole index file, kept alive
  std::vector<IndexEntry> entries;  // all stages, index order
  bool has_conflicts = false;
  // "TREE" cache-tree extension: when the root entry is valid, cache_tree
  // is the oid of the tree the whole index would write — comparing it with
  // HEAD's tree answers "any staged changes?" without reading a single
  // tree object (the common clean-repo case).
  bool cache_tree_valid = false;
  Oid cache_tree;
};

bool parse_index(const std::string& index_path, IndexData* out,
                 bool* uncertain) {
  std::string& data = out->raw;
  if (!read_file(index_path, &data)) {
    // No index at all = freshly-initialised repo: empty tracked set.
    return true;
  }
  if (data.size() < 12 + 20) return false;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(data.data());
  if (std::memcmp(p, "DIRC", 4) != 0) return false;
  uint32_t version = be32(p + 4);
  if (version != 2 && version != 3) {
    *uncertain = true;  // v4 prefix compression / future formats
    return false;
  }
  uint32_t count = be32(p + 8);
  size_t off = 12;
  const size_t limit = data.size() - 20;  // trailing checksum
  out->entries.reserve(count);
  for (uint32_t i = 0; i < count; ++i) {
    if (off + 62 > limit) return false;
    IndexEntry e;
    e.ctime_s = be32(p + off); e.ctime_ns = be32(p + off + 4);
    e.mtime_s = be32(p + off + 8); e.mtime_ns = be32(p + off + 12);
    e.mode = be32(p + off + 24);
    e.size = be32(p + off + 36);
    std::memcpy(e.oid.b, p + off + 40, 20);
    uint16_t flags = be16(p + off + 60);
    e.stage = (flags >> 12) & 3;
    e.assume_valid = (flags & 0x8000) != 0;
    e.skip_worktree = e.intent_to_add = false;
    size_t name_off = off + 62;
    if (flags & 0x4000) {  // extended flags (v3)
      if (version < 3 || name_off + 2 > limit) return false;
      uint16_t ext = be16(p + name_off);
      e.skip_worktree = (ext & 0x4000) != 0;
      e.intent_to_add = (ext & 0x2000) != 0;
      name_off += 2;
    }
    size_t name_len = flags & 0x0FFF;
    if (name_len == 0x0FFF) {  // long path: scan for NUL
      size_t end = name_off;
      while (end < limit && p[end] != 0) ++end;
      name_len = end - name_off;
    }
    if (name_off + name_len > limit) return false;
    e.path = std::string_view(reinterpret_cast<const char*>(p + name_off),
                              name_len);
    if (e.stage != 0) out->has_conflicts = true;
    // Entry is padded with NULs to a multiple of 8 bytes from entry start.
    size_t entry_len = (name_off - off) + name_len;
    entry_len = (entry_len / 8 + 1) * 8;
    out->entries.push_back(std::move(e));
    off += entry_len;
  }
  // Extensions: 4-byte signature + 4-byte length. "link" (split index) and
  // "sdir" (sparse directories) change entry semantics → bail. Cache-y
  // extensions (TREE, UNTR, FSMN, EOIE, IEOT, REUC) are safely skippable.
  while (off + 8 <= limit) {
    const char* sig = reinterpret_cast<const char*>(p + off);
    uint32_t ext_len = be32(p + off + 4);
    if (std::memcmp(sig, "link", 4) == 0 || std::memcmp(sig, "sdir", 4) == 0) {
      *uncertain = true;
      return false;
    }
    if (std::memcmp(sig, "TREE", 4) == 0 && off + 8 + ext_len <= limit) {
      // First entry is the root: NUL-terminated (empty) path, ASCII
      // entry_count, ' ', ASCII subtree_count, '\n', then the tree oid
      // when entry_count >= 0 (negative = invalidated).
      const char* q = sig + 8;
      const char* qe = sig + 8 + ext_len;
      if (q < qe && *q == 0) {
        ++q;
        bool neg = q < qe && *q == '-';
        if (!neg) {
          while (q < qe && *q != '\n') ++q;
          if (q < qe && qe - q > 20) {
            std::memcpy(out->cache_tree.b, q + 1, 20);
            out->cache_tree_valid = true;
          }
        }
      }
    }
    off += 8 + ext_len;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Object store: loose objects + pack files (idx v2, OFS/REF deltas),
// enough to read HEAD's commit and walk its trees.
// ---------------------------------------------------------------------------

bool zlib_inflate_all(const unsigned char* src, size_t n, std::string* out) {
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<unsigned char*>(src);
  zs.avail_in = uInt(n);
  char buf[1 << 16];
  int rc;
  do {
    zs.next_out = reinterpret_cast<unsigned char*>(buf);
    zs.avail_out = sizeof buf;
    rc = inflate(&zs, Z_NO_FLUSH);
    if (rc != Z_OK && rc != Z_STREAM_END) { inflateEnd(&zs); return false; }
    out->append(buf, sizeof buf - zs.avail_out);
    // Keep looping while the output buffer filled, even at avail_in==0:
    // zlib can hold pending output in its bit buffer after consuming
    // all input (large loose objects would otherwise fail to inflate).
  } while (rc != Z_STREAM_END && (zs.avail_in > 0 || zs.avail_out == 0));
  inflateEnd(&zs);
  return rc == Z_STREAM_END;
}

// Inflate `want` bytes from file offset `off` (compressed length unknown).
bool zlib_inflate_at(std::FILE* f, long off, size_t want, std::string* out) {
  if (std::fseek(f, off, SEEK_SET) != 0) return false;
  z_stream zs{};
  if (inflateInit(&zs) != Z_OK) return false;
  unsigned char in[1 << 15];
  char buf[1 << 15];
  int rc = Z_OK;
  out->reserve(want);
  while (out->size() < want && rc != Z_STREAM_END) {
    if (zs.avail_in == 0) {
      size_t n = std::fread(in, 1, sizeof in, f);
      if (n == 0) break;
      zs.next_in = in;
      zs.avail_in = uInt(n);
    }
    zs.next_out = reinterpret_cast<unsigned char*>(buf);
    zs.avail_out = sizeof buf;
    rc = inflate(&zs, Z_NO_FLUSH);
    if (rc != Z_OK && rc != Z_STREAM_END) { inflateEnd(&zs); return false; }
    out->append(buf, sizeof buf - zs.avail_out);
  }
  inflateEnd(&zs);
  return out->size() == want;
}

enum ObjType { kBad = 0, kCommit = 1, kTree = 2, kBlob = 3, kTag = 4,
               kOfsDelta = 6, kRefDelta = 7 };

struct PackIndex {
  std::string pack_path;
  std::string idx_data;  // whole .idx (they are small relative to packs)
  uint32_t nobj = 0;

  const unsigned char* raw() const {
    return reinterpret_cast<const unsigned char*>(idx_data.data());
  }

  bool load(const std::string& idx_path) {
    if (!read_file(idx_path, &idx_data)) return false;
    if (idx_data.size() < 8 + 256 * 4) return false;
    const unsigned char* p = raw();
    static const unsigned char magic[4] = {0xff, 0x74, 0x4f, 0x63};
    if (std::memcmp(p, magic, 4) != 0 || be32(p + 4) != 2) return false;
    nobj = be32(p + 8 + 255 * 4);
    size_t need = 8 + 256 * 4 + size_t(nobj) * (20 + 4 + 4) + 2 * 20;
    if (idx_data.size() < need) return false;
    pack_path = idx_path.substr(0, idx_path.size() - 4) + ".pack";
    return true;
  }

  // Returns byte offset of the object in the .pack, or -1 if absent.
  long long find(const Oid& oid) const {
    const unsigned char* p = raw();
    const unsigned char* fanout = p + 8;
    uint32_t lo = oid.b[0] ? be32(fanout + (oid.b[0] - 1) * 4) : 0;
    uint32_t hi = be32(fanout + oid.b[0] * 4);
    const unsigned char* shas = p + 8 + 256 * 4;
    while (lo < hi) {
      uint32_t mid = lo + (hi - lo) / 2;
      int c = std::memcmp(oid.b, shas + size_t(mid) * 20, 20);
      if (c == 0) {
        const unsigned char* offs =
            p + 8 + 256 * 4 + size_t(nobj) * 20 + size_t(nobj) * 4;
        uint32_t o = be32(offs + size_t(mid) * 4);
        if (o & 0x80000000u) {
          const unsigned char* big = offs + size_t(nobj) * 4;
          return (long long)be64(big + size_t(o & 0x7fffffffu) * 8);
        }
        return o;
      }
      if (c < 0) hi = mid; else lo = mid + 1;
    }
    return -1;
  }
};

class ObjectStore {
 public:
  explicit ObjectStore(const std::string& objects_dir) {
    dirs_.push_back(objects_dir);
    // info/alternates: one object dir per line (absolute or objects-relative).
    std::string alt;
    if (read_file(objects_dir + "/info/alternates", &alt)) {
      size_t start = 0;
      while (start < alt.size()) {
        size_t nl = alt.find('\n', start);
        std::string line = trim(alt.substr(
            start, nl == std::string::npos ? std::string::npos : nl - start));
        if (!line.empty() && line[0] != '#') {
          dirs_.push_back(line[0] == '/' ? line : objects_dir + "/" + line);
        }
        if (nl == std::string::npos) break;
        start = nl + 1;
      }
    }
  }

  bool read(const Oid& oid, int* type, std::string* content) {
    return read_depth(oid, type, content, 0);
  }

 private:
  std::vector<std::string> dirs_;
  std::vector<PackIndex> packs_;
  bool packs_loaded_ = false;

  void load_packs() {
    if (packs_loaded_) return;
    packs_loaded_ = true;
    for (const auto& dir : dirs_) {
      std::string pack_dir = dir + "/pack";
      DIR* d = ::opendir(pack_dir.c_str());
      if (!d) continue;
      while (dirent* ent = ::readdir(d)) {
        std::string name = ent->d_name;
        if (name.size() > 4 && name.substr(name.size() - 4) == ".idx") {
          PackIndex pi;
          if (pi.load(pack_dir + "/" + name)) packs_.push_back(std::move(pi));
        }
      }
      ::closedir(d);
    }
  }

  bool read_loose(const Oid& oid, int* type, std::string* content) {
    char hex[41];
    for (int i = 0; i < 20; ++i)
      std::snprintf(hex + i * 2, 3, "%02x", oid.b[i]);
    for (const auto& dir : dirs_) {
      std::string path = dir + "/" + std::string(hex, 2) + "/" + (hex + 2);
      std::string raw;
      if (!read_file(path, &raw)) continue;
      std::string full;
      if (!zlib_inflate_all(
              reinterpret_cast<const unsigned char*>(raw.data()), raw.size(),
              &full))
        return false;
      size_t nul = full.find('\0');
      if (nul == std::string::npos) return false;
      std::string hdr = full.substr(0, nul);
      if (hdr.rfind("commit ", 0) == 0) *type = kCommit;
      else if (hdr.rfind("tree ", 0) == 0) *type = kTree;
      else if (hdr.rfind("blob ", 0) == 0) *type = kBlob;
      else if (hdr.rfind("tag ", 0) == 0) *type = kTag;
      else return false;
      content->assign(full, nul + 1, std::string::npos);
      return true;
    }
    return false;
  }

  // Read a raw pack entry (possibly a delta) at `off` within pack `pi`.
  bool read_pack_entry(const PackIndex& pi, long long off, int* type,
                       std::string* content, int depth) {
    if (depth > 64) return false;
    std::FILE* f = std::fopen(pi.pack_path.c_str(), "rb");
    if (!f) return false;
    std::unique_ptr<std::FILE, int (*)(std::FILE*)> guard(f, std::fclose);
    if (std::fseek(f, long(off), SEEK_SET) != 0) return false;
    int c = std::fgetc(f);
    if (c == EOF) return false;
    int t = (c >> 4) & 7;
    uint64_t size = uint64_t(c & 15);
    int shift = 4;
    while (c & 0x80) {
      c = std::fgetc(f);
      if (c == EOF) return false;
      size |= uint64_t(c & 0x7f) << shift;
      shift += 7;
    }
    if (t == kOfsDelta) {
      c = std::fgetc(f);
      if (c == EOF) return false;
      uint64_t rel = uint64_t(c & 0x7f);
      while (c & 0x80) {
        c = std::fgetc(f);
        if (c == EOF) return false;
        rel = ((rel + 1) << 7) | uint64_t(c & 0x7f);
      }
      long data_off = std::ftell(f);
      std::string delta;
      if (!zlib_inflate_at(f, data_off, size, &delta)) return false;
      int base_type;
      std::string base;
      if (!read_pack_entry(pi, off - (long long)rel, &base_type, &base,
                           depth + 1))
        return false;
      *type = base_type;
      return apply_delta(base, delta, content);
    }
    if (t == kRefDelta) {
      Oid base_oid;
      if (std::fread(base_oid.b, 1, 20, f) != 20) return false;
      long data_off = std::ftell(f);
      std::string delta;
      if (!zlib_inflate_at(f, data_off, size, &delta)) return false;
      int base_type;
      std::string base;
      if (!read_depth(base_oid, &base_type, &base, depth + 1)) return false;
      *type = base_type;
      return apply_delta(base, delta, content);
    }
    if (t != kCommit && t != kTree && t != kBlob && t != kTag) return false;
    *type = t;
    long data_off = std::ftell(f);
    return zlib_inflate_at(f, data_off, size, content);
  }

  static bool apply_delta(const std::string& base, const std::string& delta,
                          std::string* out) {
    const unsigned char* p =
        reinterpret_cast<const unsigned char*>(delta.data());
    const unsigned char* end = p + delta.size();
    auto varint = [&](uint64_t* v) -> bool {
      *v = 0;
      int shift = 0;
      while (p < end) {
        unsigned char c = *p++;
        *v |= uint64_t(c & 0x7f) << shift;
        shift += 7;
        if (!(c & 0x80)) return true;
      }
      return false;
    };
    uint64_t src_size, dst_size;
    if (!varint(&src_size) || !varint(&dst_size)) return false;
    if (src_size != base.size()) return false;
    out->reserve(dst_size);
    while (p < end) {
      unsigned char cmd = *p++;
      if (cmd & 0x80) {  // copy from base
        uint64_t cp_off = 0, cp_size = 0;
        for (int i = 0; i < 4; ++i)
          if (cmd & (1u << i)) { if (p >= end) return false;
            cp_off |= uint64_t(*p++) << (8 * i); }
        for (int i = 0; i < 3; ++i)
          if (cmd & (0x10u << i)) { if (p >= end) return false;
            cp_size |= uint64_t(*p++) << (8 * i); }
        if (cp_size == 0) cp_size = 0x10000;
        if (cp_off + cp_size > base.size()) return false;
        out->append(base, size_t(cp_off), size_t(cp_size));
      } else if (cmd) {  // insert literal
        if (p + cmd > end) return false;
        out->append(reinterpret_cast<const char*>(p), cmd);
        p += cmd;
      } else {
        return false;  // cmd 0 is reserved
      }
    }
    return out->size() == dst_size;
  }

  bool read_depth(const Oid& oid, int* type, std::string* content, int depth) {
    if (depth > 64) return false;
    if (read_loose(oid, type, content)) return true;
    load_packs();
    for (const auto& pi : packs_) {
      long long off = pi.find(oid);
      if (off >= 0) return read_pack_entry(pi, off, type, content, depth);
    }
    return false;
  }
};

// ---------------------------------------------------------------------------
// Refs: HEAD → commit OID (loose refs, symbolic chains, packed-refs)
// ---------------------------------------------------------------------------

bool resolve_ref(const std::string& git_dir, const std::string& common_dir,
                 std::string name, Oid* out, bool* unborn) {
  for (int hops = 0; hops < 10; ++hops) {
    // Per-worktree refs (HEAD, refs/bisect, …) live in git_dir; shared refs
    // in common_dir.
    std::string content;
    bool found = read_file(git_dir + "/" + name, &content) ||
                 read_file(common_dir + "/" + name, &content);
    if (found) {
      std::string line = trim(content.substr(0, content.find('\n')));
      if (line.rfind("ref: ", 0) == 0) {
        name = line.substr(5);
        continue;
      }
      if (line.size() >= 40 && parse_hex_oid(line.c_str(), out)) return true;
      return false;
    }
    // packed-refs: "<40hex> <refname>" lines; "^{}" peel lines follow tags.
    std::string packed;
    if (read_file(common_dir + "/packed-refs", &packed)) {
      size_t start = 0;
      while (start < packed.size()) {
        size_t nl = packed.find('\n', start);
        std::string line = packed.substr(
            start, nl == std::string::npos ? std::string::npos : nl - start);
        if (!line.empty() && line[0] != '#' && line[0] != '^') {
          size_t sp = line.find(' ');
          if (sp == 40 && line.substr(41) == name) {
            return parse_hex_oid(line.c_str(), out);
          }
        }
        if (nl == std::string::npos) break;
        start = nl + 1;
      }
    }
    *unborn = true;  // ref named by HEAD does not exist yet
    return false;
  }
  return false;
}

// ---------------------------------------------------------------------------
// HEAD tree → flat path map (skipping gitlinks, matching the scanner's
// exclude-submodules semantics)
// ---------------------------------------------------------------------------

struct TreeEnt {
  uint32_t mode;
  Oid oid;
};

using TreeMap = std::unordered_map<std::string, TreeEnt>;

bool flatten_tree(ObjectStore& store, const Oid& tree_oid,
                  const std::string& prefix,
                  TreeMap* out, int depth) {
  if (depth > 256) return false;
  int type;
  std::string data;
  if (!store.read(tree_oid, &type, &data) || type != kTree) return false;
  size_t off = 0;
  while (off < data.size()) {
    size_t sp = data.find(' ', off);
    size_t nul = data.find('\0', off);
    if (sp == std::string::npos || nul == std::string::npos ||
        nul + 20 > data.size())
      return false;
    uint32_t mode = uint32_t(std::strtoul(data.substr(off, sp - off).c_str(),
                                          nullptr, 8));
    std::string name = data.substr(sp + 1, nul - sp - 1);
    Oid oid;
    std::memcpy(oid.b, data.data() + nul + 1, 20);
    off = nul + 21;
    std::string path = prefix.empty() ? name : prefix + "/" + name;
    if ((mode & 0170000) == 0040000) {  // subtree
      if (!flatten_tree(store, oid, path, out, depth + 1)) return false;
    } else if (mode == kModeGitlink) {
      // submodule pointer — excluded, mirroring --ignore-submodules=all
    } else {
      (*out)[path] = TreeEnt{mode, oid};
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// Config scan: certainty preconditions + behavioural knobs
// ---------------------------------------------------------------------------

struct ConfigFacts {
  bool filemode = true;
  bool dangerous = false;  // autocrlf / sha256 / ignorecase / symlinks=false
  bool renames = true;     // status.renames / diff.renames (default on)
  std::string excludes_file;
  std::string attributes_file;  // core.attributesFile (checked later)
};

// git's boolean grammar: true/yes/on/1 and false/no/off/0, case-insensitive
// (val arrives already lowered); empty value after '=' means false, a key
// with no '=' means true — callers pass the literal value text.
// Returns 1 true, 0 false, -1 not-a-boolean.
int git_bool(const std::string& val) {
  if (val == "true" || val == "yes" || val == "on" || val == "1") return 1;
  if (val == "false" || val == "no" || val == "off" || val == "0"
      || val.empty())
    return 0;
  return -1;
}

std::string expand_home(const std::string& p) {
  if (!p.empty() && p[0] == '~') {
    const char* home = std::getenv("HOME");
    return (home ? std::string(home) : "") + p.substr(1);
  }
  return p;
}

// `conditional` marks config reached through [includeIf]: we cannot
// evaluate the condition, so behaviour-affecting keys there force a
// refusal instead of being applied.
void scan_config_file(const std::string& path, ConfigFacts* facts,
                      int depth = 0, bool conditional = false) {
  if (depth > 8) return;
  std::string text;
  if (!read_file(path, &text)) return;
  std::string section;
  bool section_conditional = false;
  size_t start = 0;
  while (start <= text.size()) {
    size_t nl = text.find('\n', start);
    std::string line = trim(text.substr(
        start, nl == std::string::npos ? std::string::npos : nl - start));
    if (!line.empty() && line[0] == '[') {
      section = lower(trim(line.substr(1, line.find(']') - 1)));
      section_conditional = section.rfind("includeif", 0) == 0;
    } else if (!line.empty() && line[0] != '#' && line[0] != ';') {
      size_t eq = line.find('=');
      // Git grammar: a bare key with no '=' means boolean TRUE — a
      // valueless `autocrlf` line must register as dangerous, not be
      // silently skipped (certainty contract).
      {
        std::string key = lower(trim(
            eq == std::string::npos ? line : line.substr(0, eq)));
        std::string raw = eq == std::string::npos
                              ? std::string("true")
                              : trim(line.substr(eq + 1));
        std::string val = lower(raw);
        bool cond = conditional || section_conditional;
        if (section == "include" || section_conditional) {
          if (key == "path") {
            std::string inc = expand_home(raw);
            if (!inc.empty() && inc[0] != '/') {
              size_t slash = path.rfind('/');
              inc = (slash == std::string::npos ? inc
                     : path.substr(0, slash + 1) + inc);
            }
            scan_config_file(inc, facts, depth + 1, cond);
          }
        } else if (section == "core") {
          if (key == "filemode") {
            // In conditionally-included config we cannot know whether the
            // value applies — refuse rather than guess either way.
            if (cond) facts->dangerous = true;
            else facts->filemode = git_bool(val) != 0;
          }
          if (key == "autocrlf" && git_bool(val) != 0)
            facts->dangerous = true;  // true OR input OR unknown
          if (key == "ignorecase" && git_bool(val) != 0)
            facts->dangerous = true;
          if (key == "symlinks" && git_bool(val) != 1)
            facts->dangerous = true;
          if (key == "eol" && val == "crlf") facts->dangerous = true;
          if (key == "excludesfile") {
            if (cond) facts->dangerous = true;
            else facts->excludes_file = raw;
          }
          if (key == "attributesfile") {
            if (cond) facts->dangerous = true;
            else facts->attributes_file = raw;
          }
        } else if (section == "status" || section == "diff") {
          if (key == "renames") {
            if (cond) facts->dangerous = true;
            else facts->renames = git_bool(val) != 0;
          }
        } else if (section == "extensions") {
          if (key == "objectformat" && val != "sha1") facts->dangerous = true;
          if (key == "worktreeconfig" && git_bool(val) != 0)
            facts->dangerous = true;
          if (key == "refstorage" && val != "files")
            facts->dangerous = true;  // reftable: our ref reader can't see it
        }
      }
    }
    if (nl == std::string::npos) break;
    start = nl + 1;
  }
}

// An attributes file is dangerous when it can change how worktree bytes map
// to blob OIDs (filters, eol/text normalisation, ident expansion).
bool attributes_dangerous(const std::string& path) {
  std::string text;
  if (!read_file(path, &text)) return false;
  size_t start = 0;
  while (start <= text.size()) {
    size_t nl = text.find('\n', start);
    std::string line = trim(text.substr(
        start, nl == std::string::npos ? std::string::npos : nl - start));
    if (!line.empty() && line[0] != '#') {
      // Tokens after the pattern are attribute settings.
      size_t sp = line.find_first_of(" \t");
      std::string attrs = sp == std::string::npos ? "" : line.substr(sp);
      for (const char* danger :
           {"filter=", " text", "\ttext", "-text", " eol", "\teol",
            " ident", "\tident", " crlf", "\tcrlf",
            "working-tree-encoding", "export-subst"}) {
        if (attrs.find(danger) != std::string::npos) return true;
      }
    }
    if (nl == std::string::npos) break;
    start = nl + 1;
  }
  return false;
}

// ---------------------------------------------------------------------------
// gitignore engine (wildmatch with **, per-directory pattern stack)
// ---------------------------------------------------------------------------

// Match `pat` against `str` with gitignore glob semantics: `*`/`?` do not
// cross `/`, `**` does, `[...]` classes supported.
bool glob_match(const char* pat, const char* str) {
  while (*pat) {
    if (*pat == '*') {
      bool dstar = pat[1] == '*';
      if (dstar) {
        const char* p = pat + 2;
        // "a/**/b" matches "a/b" (zero dirs) — try skipping "**/" entirely.
        if (*p == '/') {
          if (glob_match(p + 1, str)) return true;
          p = pat + 2;  // and fall through to greedy matching incl. '/'
        }
        for (const char* s = str;; ++s) {
          if (glob_match(p, s)) return true;
          if (!*s) return false;
        }
      }
      ++pat;
      for (const char* s = str;; ++s) {
        if (glob_match(pat, s)) return true;
        if (!*s || *s == '/') return false;
      }
    } else if (*pat == '?') {
      if (!*str || *str == '/') return false;
      ++pat; ++str;
    } else if (*pat == '[') {
      if (!*str || *str == '/') return false;
      const char* p = pat + 1;
      bool negate = (*p == '!' || *p == '^');
      if (negate) ++p;
      bool matched = false;
      char prev = 0;
      bool first = true;
      while (*p && (*p != ']' || first)) {
        if (*p == '-' && prev && p[1] && p[1] != ']') {
          if (*str >= prev && *str <= p[1]) matched = true;
          prev = 0;
          p += 2;
        } else {
          if (*p == *str) matched = true;
          prev = *p++;
        }
        first = false;
      }
      if (*p != ']') return false;  // malformed class
      if (matched == negate) return false;
      pat = p + 1;
      ++str;
    } else if (*pat == '\\' && pat[1]) {
      if (pat[1] != *str) return false;
      pat += 2; ++str;
    } else {
      if (*pat != *str) return false;
      ++pat; ++str;
    }
  }
  return *str == 0;
}

struct IgnorePattern {
  std::string pat;
  std::string base;  // repo-relative dir of the defining .gitignore ("" root)
  bool negate = false;
  bool dir_only = false;
  bool anchored = false;
};

void parse_ignore_lines(const std::string& text, const std::string& base,
                        std::vector<IgnorePattern>* out) {
  size_t start = 0;
  while (start <= text.size()) {
    size_t nl = text.find('\n', start);
    std::string raw = text.substr(
        start, nl == std::string::npos ? std::string::npos : nl - start);
    if (!raw.empty() && raw.back() == '\r') raw.pop_back();
    // Trailing unescaped spaces are stripped; leading spaces are literal.
    while (!raw.empty() && raw.back() == ' ' &&
           (raw.size() < 2 || raw[raw.size() - 2] != '\\'))
      raw.pop_back();
    if (!raw.empty() && raw[0] != '#') {
      IgnorePattern p;
      p.base = base;
      std::string s = raw;
      if (s[0] == '!') { p.negate = true; s.erase(0, 1); }
      else if (s.rfind("\\!", 0) == 0 || s.rfind("\\#", 0) == 0) s.erase(0, 1);
      if (!s.empty() && s.back() == '/') { p.dir_only = true; s.pop_back(); }
      // A slash anywhere except the (now-removed) end anchors the pattern
      // to the .gitignore's own directory.
      if (s.find('/') != std::string::npos) {
        p.anchored = true;
        if (s[0] == '/') s.erase(0, 1);
      }
      if (!s.empty()) {
        p.pat = std::move(s);
        out->push_back(std::move(p));
      }
    }
    if (nl == std::string::npos) break;
    start = nl + 1;
  }
}

// Immutable per-directory ignore chain: each directory's .gitignore adds a
// node pointing at its parent's, so walker tasks can fan out across threads
// sharing ancestors without copying pattern vectors.
struct IgnoreNode {
  std::shared_ptr<const IgnoreNode> parent;
  std::vector<IgnorePattern> pats;
};

bool match_pattern(const IgnorePattern& p, const std::string& path,
                   bool is_dir, bool* verdict) {
  if (p.dir_only && !is_dir) return false;
  const char* rel = path.c_str();
  if (!p.base.empty()) {
    size_t bl = p.base.size();
    if (path.size() <= bl || path.compare(0, bl, p.base) != 0 ||
        path[bl] != '/')
      return false;  // pattern's directory does not contain this path
    rel = path.c_str() + bl + 1;
  }
  bool m;
  if (p.anchored) {
    m = glob_match(p.pat.c_str(), rel);
  } else {
    // Unanchored (no slash): matches the basename at any depth below the
    // defining .gitignore's directory.
    const char* bn = std::strrchr(rel, '/');
    m = glob_match(p.pat.c_str(), bn ? bn + 1 : rel);
  }
  if (m) *verdict = !p.negate;
  return m;
}

// Final verdict for repo-relative `path`: patterns apply outermost .gitignore
// first, and the last matching pattern wins.
bool is_ignored(const IgnoreNode* node, const std::string& path,
                bool is_dir) {
  const IgnoreNode* chain[128];
  int n = 0;
  for (const IgnoreNode* p = node; p && n < 128; p = p->parent.get())
    chain[n++] = p;
  bool ignored = false;
  for (int i = n - 1; i >= 0; --i)
    for (const auto& p : chain[i]->pats)
      match_pattern(p, path, is_dir, &ignored);
  return ignored;
}

// Attributes can only affect a path through .gitattributes files in its
// ancestor directories (plus info/attributes, checked up front). Verify the
// chain is filter-free before trusting a content re-hash; memoised per dir.
bool ancestors_attr_safe(const std::string& workdir, std::string_view path,
                         std::map<std::string, bool, std::less<>>* cache) {
  std::string dir;  // repo-relative ancestor, "" = root
  size_t pos = 0;
  for (;;) {
    auto it = cache->find(dir);
    bool safe;
    if (it != cache->end()) {
      safe = it->second;
    } else {
      std::string attr = dir.empty() ? workdir + "/.gitattributes"
                                     : workdir + "/" + dir + "/.gitattributes";
      safe = !attributes_dangerous(attr);
      (*cache)[dir] = safe;
    }
    if (!safe) return false;
    size_t slash = path.find('/', pos);
    if (slash == std::string_view::npos) return true;
    dir.assign(path.substr(0, slash));
    pos = slash + 1;
  }
}

// ---------------------------------------------------------------------------
// The scanner
// ---------------------------------------------------------------------------

struct Tracked {
  const IndexEntry* e;
  bool visited = false;  // set by exactly one walker (subtrees are disjoint)
};

// One full-status record: bucket 0 staged / 1 unstaged / 2 untracked /
// 3 conflicted; letter A M D R T U; orig set for staged renames.
struct StatusRecord {
  char bucket;
  char letter;
  std::string path;
  std::string orig;
};
using Collector = std::vector<StatusRecord>;

using AttrCache = std::map<std::string, bool, std::less<>>;

struct ScanCtx {
  std::string workdir;          // absolute, no trailing slash
  const IndexData* index;
  std::unordered_map<std::string_view, Tracked> tracked;  // stage-0 by path
  std::unordered_set<std::string_view> conflicted;   // paths with stage>0
  struct stat index_st {};
  bool have_index_stat = false;
  std::atomic<int> bits{0};
  bool filemode = true;
  bool collect = false;  // full-status mode: no early exits, gather records
  std::atomic<bool> uncertain{false};  // a content compare needed filters
};

// Verdict for one tracked entry against its lstat: 0 = clean, else the
// porcelain letter ('M' modified, 'T' typechange). Sets ctx->uncertain when
// a content re-hash would need attribute filters.
char classify_entry(ScanCtx* ctx, const IndexEntry* ep, std::string_view path,
                    const struct stat& st, AttrCache* attr_cache) {
  bool want_link = (ep->mode & 0170000) == 0120000;
  bool is_link = S_ISLNK(st.st_mode);
  if (S_ISDIR(st.st_mode))
    return 'D';  // porcelain: a tracked file replaced by a directory is
                 // " D" (deleted) — its contents surface as untracked
  if (want_link != is_link || (!is_link && !S_ISREG(st.st_mode)))
    return 'T';  // typechange
  std::string abs;
  abs.reserve(ctx->workdir.size() + path.size() + 1);
  abs.assign(ctx->workdir); abs += '/'; abs += path;
  if (is_link)
    return symlink_hash_matches(abs, ep->oid) ? 0 : 'M';
  if (ctx->filemode) {
    bool want_exec = (ep->mode & 0100) != 0;
    bool have_exec = (st.st_mode & 0100) != 0;
    if (want_exec != have_exec) return 'M';
  }
  bool stat_match =
      uint32_t(st.st_mtim.tv_sec) == ep->mtime_s &&
      uint32_t(st.st_mtim.tv_nsec) == ep->mtime_ns &&
      uint32_t(st.st_ctim.tv_sec) == ep->ctime_s &&
      uint32_t(st.st_ctim.tv_nsec) == ep->ctime_ns;
  // Racy-git guard: an entry stat-recorded in the same second the index was
  // written may have been modified after without changing its mtime.
  bool racy = ctx->have_index_stat &&
              ep->mtime_s >= uint32_t(ctx->index_st.st_mtim.tv_sec);
  if (stat_match && !racy && uint64_t(st.st_size) == ep->size) return 0;
  // Content comparison is only meaningful if no clean/smudge filter or
  // eol/text attribute applies to this path.
  if (!ancestors_attr_safe(ctx->workdir, path, attr_cache)) {
    ctx->uncertain = true;
    return 0;
  }
  // Git's smudged-entry convention: entries written without worktree stat
  // info (racily-clean smudge, `git apply --cached`, …) carry size 0 and
  // mean "verify content", NOT "the blob is empty" — the size shortcut
  // only applies to entries with real cached stat.
  bool smudged = ep->size == 0 && st.st_size != 0;
  if (!smudged && uint64_t(st.st_size) != ep->size) return 'M';
  uint64_t fsize = uint64_t(st.st_size);
  return blob_hash_matches(abs, fsize, ep->oid) ? 0 : 'M';
}

// Fused worktree walk (the libgit2-status shape): one pass over directories
// does tracked stat-compares (unstaged) and ignore-aware untracked detection
// together. Each directory is an independent task on a shared work queue, so
// big trees (the reference's 25k-file submodule pain case) fan out across
// cores; the immutable IgnoreNode chain gives every task its ancestor
// .gitignore context for free. Tracked entries no task reaches (deleted
// files, files under pruned ignored dirs) are settled by scan_unvisited.
struct WalkQueue {
  std::mutex mu;
  std::condition_variable cv;
  std::deque<std::pair<std::string, std::shared_ptr<const IgnoreNode>>> q;
  int active = 0;

  void push(std::string rel, std::shared_ptr<const IgnoreNode> ign) {
    {
      std::lock_guard<std::mutex> lk(mu);
      q.emplace_back(std::move(rel), std::move(ign));
    }
    cv.notify_one();
  }
};

void process_dir(ScanCtx* ctx, const std::string& rel,
                 const std::shared_ptr<const IgnoreNode>& parent_ign,
                 WalkQueue* wq, AttrCache* attr_cache, Collector* rec) {
  constexpr int kDone = kUnstaged | kUntracked;
  if ((!ctx->collect && (ctx->bits & kDone) == kDone) || ctx->uncertain)
    return;
  std::string abs = rel.empty() ? ctx->workdir : ctx->workdir + "/" + rel;
  int dirfd = ::open(abs.c_str(), O_RDONLY | O_DIRECTORY | O_NOFOLLOW |
                                      O_CLOEXEC);
  if (dirfd < 0) {
    // A vanished directory (TOCTOU during the walk) is a benign race;
    // anything else (EACCES, EMFILE, …) means this subtree was NOT
    // scanned — certifying "clean" without seeing it would violate the
    // certain-or-refuse contract.
    if (errno != ENOENT && errno != ENOTDIR) ctx->uncertain = true;
    return;
  }
  std::shared_ptr<const IgnoreNode> ign = parent_ign;
  {
    int gfd = ::openat(dirfd, ".gitignore", O_RDONLY | O_CLOEXEC);
    if (gfd >= 0) {
      std::string text;
      char buf[1 << 14];
      ssize_t n;
      while ((n = ::read(gfd, buf, sizeof buf)) > 0) text.append(buf, n);
      ::close(gfd);
      auto node = std::make_shared<IgnoreNode>();
      node->parent = parent_ign;
      parse_ignore_lines(text, rel, &node->pats);
      if (!node->pats.empty()) ign = std::move(node);
    }
  }
  DIR* d = ::fdopendir(dirfd);
  if (!d) {
    ::close(dirfd);
    ctx->uncertain = true;  // unscanned subtree: refuse, don't certify
    return;
  }
  std::string child_rel, probe;
  while (dirent* ent = ::readdir(d)) {
    const char* name = ent->d_name;
    // Paths with a ".git" component are never tracked nor untracked.
    if (name[0] == '.' &&
        (name[1] == 0 || (name[1] == '.' && name[2] == 0) ||
         std::strcmp(name + 1, "git") == 0))
      continue;
    child_rel.assign(rel);
    if (!child_rel.empty()) child_rel += '/';
    child_rel += name;
    // d_type spares a stat per entry on filesystems that report it.
    unsigned char dt = ent->d_type;
    struct stat st;
    bool have_st = false;
    if (dt == DT_UNKNOWN) {
      if (::fstatat(dirfd, name, &st, AT_SYMLINK_NOFOLLOW) != 0) continue;
      have_st = true;
      dt = S_ISDIR(st.st_mode) ? DT_DIR
           : S_ISREG(st.st_mode) ? DT_REG
           : S_ISLNK(st.st_mode) ? DT_LNK : DT_FIFO;
    }
    if (dt == DT_DIR) {
      auto it = ctx->tracked.find(std::string_view(child_rel));
      if (it != ctx->tracked.end() && it->second.e->mode == kModeGitlink) {
        it->second.visited = true;  // submodule — excluded entirely
        continue;
      }
      probe.assign(name); probe += "/.git";
      struct stat g;
      if (::fstatat(dirfd, probe.c_str(), &g, AT_SYMLINK_NOFOLLOW) == 0) {
        // Untracked nested repository: its directory itself is untracked
        // content (git reports "? nested/"), but its insides are not ours.
        if (!is_ignored(ign.get(), child_rel, /*is_dir=*/true)) {
          ctx->bits |= kUntracked;
          if (rec) rec->push_back({2, '?', child_rel + "/", {}});
        }
        continue;
      }
      if (is_ignored(ign.get(), child_rel, /*is_dir=*/true)) continue;
      wq->push(child_rel, ign);
    } else if (dt == DT_REG || dt == DT_LNK) {
      auto it = ctx->tracked.find(std::string_view(child_rel));
      if (it != ctx->tracked.end()) {
        it->second.visited = true;
        const IndexEntry* ep = it->second.e;
        if (!ctx->collect && (ctx->bits & kUnstaged)) continue;
        if (ep->assume_valid || ep->skip_worktree ||
            ep->mode == kModeGitlink || ep->intent_to_add)
          continue;  // i-t-a already settled at map build
        if (!have_st &&
            ::fstatat(dirfd, name, &st, AT_SYMLINK_NOFOLLOW) != 0) {
          ctx->bits |= kUnstaged;
          if (rec) rec->push_back({1, 'D', child_rel, {}});
          continue;
        }
        char cl = classify_entry(ctx, ep, it->first, st, attr_cache);
        if (ctx->uncertain) break;
        if (cl) {
          ctx->bits |= kUnstaged;
          if (rec) rec->push_back({1, cl, child_rel, {}});
        }
        continue;
      }
      if (!ctx->collect && (ctx->bits & kUntracked)) continue;
      if (ctx->conflicted.count(std::string_view(child_rel))) continue;
      if (is_ignored(ign.get(), child_rel, /*is_dir=*/false)) continue;
      ctx->bits |= kUntracked;
      if (rec) rec->push_back({2, '?', child_rel, {}});
    }
    if (!ctx->collect && (ctx->bits & kDone) == kDone) break;
  }
  ::closedir(d);  // closes dirfd
}

void walk_worker(ScanCtx* ctx, WalkQueue* wq, Collector* rec) {
  AttrCache attr_cache;  // per-thread memo of ancestor-attr safety
  std::unique_lock<std::mutex> lk(wq->mu);
  for (;;) {
    wq->cv.wait(lk, [&] { return !wq->q.empty() || wq->active == 0; });
    if (wq->q.empty()) {
      if (wq->active == 0) return;
      continue;
    }
    auto [rel, ign] = std::move(wq->q.front());
    wq->q.pop_front();
    ++wq->active;
    lk.unlock();
    process_dir(ctx, rel, ign, wq, &attr_cache, rec);
    lk.lock();
    if (--wq->active == 0 && wq->q.empty()) {
      lk.unlock();
      wq->cv.notify_all();
      lk.lock();
    }
  }
}

void run_walk(ScanCtx* ctx, std::shared_ptr<const IgnoreNode> base,
              Collector* rec) {
  WalkQueue wq;
  wq.push("", std::move(base));
  // Threads only pay off when there is real stat volume; small trees run
  // inline (a thread pool costs more than it saves below ~2k entries).
  size_t n_threads = 1;
  if (ctx->tracked.size() >= 2000) {
    unsigned hw = std::thread::hardware_concurrency();
    n_threads = std::min<size_t>(hw ? hw : 4, 8);
  }
  if (n_threads <= 1) {
    AttrCache attr_cache;
    while (!wq.q.empty()) {
      auto [rel, ign] = std::move(wq.q.front());
      wq.q.pop_front();
      process_dir(ctx, rel, ign, &wq, &attr_cache, rec);
      if (ctx->uncertain) break;
    }
    return;
  }
  std::vector<Collector> locals(rec ? n_threads : 0);
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (size_t i = 0; i < n_threads; ++i)
    threads.emplace_back(walk_worker, ctx, &wq,
                         rec ? &locals[i] : nullptr);
  for (auto& t : threads) t.join();
  for (auto& l : locals)
    rec->insert(rec->end(), std::make_move_iterator(l.begin()),
                std::make_move_iterator(l.end()));
}

// Settle tracked entries the walk never reached: deleted files, or files
// under directories the walk pruned (ignored dirs, nested repos). Each gets
// an individual lstat — exact, and empty in the common case.
void scan_unvisited(ScanCtx* ctx, Collector* rec) {
  if (!ctx->collect && (ctx->bits & kUnstaged)) return;
  AttrCache attr_cache;
  std::string abs;
  for (auto& [path, tr] : ctx->tracked) {
    if (!ctx->collect && (ctx->bits & kUnstaged)) return;
    if (ctx->uncertain) return;
    if (tr.visited) continue;
    const IndexEntry* ep = tr.e;
    if (ep->assume_valid || ep->skip_worktree || ep->mode == kModeGitlink ||
        ep->intent_to_add)
      continue;
    abs.assign(ctx->workdir); abs += '/'; abs += path;
    struct stat st;
    if (::lstat(abs.c_str(), &st) != 0) {
      ctx->bits |= kUnstaged;  // tracked file missing → deleted
      if (rec) rec->push_back({1, 'D', std::string(path), {}});
      if (!ctx->collect) return;
      continue;
    }
    char cl = classify_entry(ctx, ep, path, st, &attr_cache);
    if (cl) {
      ctx->bits |= kUnstaged;
      if (rec) rec->push_back({1, cl, std::string(path), {}});
    }
  }
}

// Shared scan. rec == nullptr → fast bitmask mode (early exits); rec set →
// full-status mode (records collected, porcelain-equivalent letters).
int scan_impl(const char* workdir_c, const char* git_dir_c,
              const char* common_dir_c, Collector* rec) {
  if (!workdir_c || !git_dir_c || !common_dir_c) return kError;
  std::string workdir = workdir_c, git_dir = git_dir_c,
              common_dir = common_dir_c;
  while (workdir.size() > 1 && workdir.back() == '/') workdir.pop_back();

  // WGIT_SCAN_PROF=1: per-phase wall times to stderr (scale-budget
  // diagnosis; zero cost when unset).
  const bool prof = std::getenv("WGIT_SCAN_PROF") != nullptr;
  auto t_prev = std::chrono::steady_clock::now();
  auto phase = [&](const char* name) {
    if (!prof) return;
    auto now = std::chrono::steady_clock::now();
    std::fprintf(stderr, "scanprof %-10s %7.2f ms\n", name,
                 std::chrono::duration<double, std::milli>(now - t_prev)
                     .count());
    t_prev = now;
  };

  // --- certainty preconditions -------------------------------------------
  ConfigFacts facts;
  const char* home = std::getenv("HOME");
  const char* xdg = std::getenv("XDG_CONFIG_HOME");
  // System tier first (git's own precedence order): a machine-wide
  // core.autocrlf in /etc/gitconfig changes blob hashing exactly like
  // the user tiers do — invisible settings would certify wrong verdicts.
  const char* sys = std::getenv("GIT_CONFIG_SYSTEM");
  if (std::getenv("GIT_CONFIG_NOSYSTEM") == nullptr) {
    scan_config_file(sys ? sys : "/etc/gitconfig", &facts);
    scan_config_file("/usr/local/etc/gitconfig", &facts);
  }
  if (xdg) scan_config_file(std::string(xdg) + "/git/config", &facts);
  else if (home) scan_config_file(std::string(home) + "/.config/git/config",
                                  &facts);
  if (home) scan_config_file(std::string(home) + "/.gitconfig", &facts);
  scan_config_file(common_dir + "/config", &facts);
  phase("config");
  if (facts.dangerous) return kUncertain;
  if (attributes_dangerous(common_dir + "/info/attributes")) return kUncertain;
  // Global attributes: core.attributesFile, else the XDG default —
  // text/eol/filter rules there change blob hashing exactly like
  // in-worktree .gitattributes do.
  {
    std::string gattr;
    if (!facts.attributes_file.empty()) {
      gattr = expand_home(facts.attributes_file);
    } else if (xdg) {
      gattr = std::string(xdg) + "/git/attributes";
    } else if (home) {
      gattr = std::string(home) + "/.config/git/attributes";
    }
    if (!gattr.empty() && attributes_dangerous(gattr)) return kUncertain;
  }
  // Belt-and-braces for ref backends our resolver cannot read (reftable
  // repos always have extensions.refstorage, but a stray layout must
  // refuse rather than misread HEAD as unborn).
  {
    struct stat rt;
    if (::stat((common_dir + "/reftable").c_str(), &rt) == 0)
      return kUncertain;
  }

  // --- index ---------------------------------------------------------------
  IndexData index;
  bool uncertain = false;
  if (!parse_index(git_dir + "/index", &index, &uncertain))
    return uncertain ? kUncertain : kError;
  phase("index");

  ScanCtx ctx;
  ctx.workdir = workdir;
  ctx.index = &index;
  ctx.filemode = facts.filemode;
  ctx.tracked.reserve(index.entries.size() * 2);
  ctx.have_index_stat =
      ::stat((git_dir + "/index").c_str(), &ctx.index_st) == 0;

  ctx.collect = rec != nullptr;
  for (const auto& e : index.entries) {
    if (e.stage != 0) {
      if (!ctx.conflicted.count(e.path)) {
        ctx.conflicted.insert(e.path);
        if (rec) rec->push_back({3, 'U', std::string(e.path), {}});
      }
      ctx.bits |= kConflicted;
      continue;
    }
    // intent-to-add is visibly pending (added-but-unstaged) whether or not
    // the file still exists in the worktree.
    if (e.intent_to_add) {
      ctx.bits |= kUnstaged;
      if (rec) rec->push_back({1, 'A', std::string(e.path), {}});
    }
    ctx.tracked[e.path] = Tracked{&e};
  }
  phase("tracked");

  // --- staged: HEAD tree vs index ------------------------------------------
  {
    ObjectStore store(common_dir + "/objects");
    Oid head;
    bool unborn = false;
    std::string head_content;
    if (!read_file(git_dir + "/HEAD", &head_content)) return kError;
    std::string head_line = trim(head_content.substr(0, head_content.find('\n')));
    bool resolved = false;
    if (head_line.rfind("ref: ", 0) == 0) {
      resolved = resolve_ref(git_dir, common_dir, head_line.substr(5), &head,
                             &unborn);
    } else if (head_line.size() >= 40) {
      resolved = parse_hex_oid(head_line.c_str(), &head);
    }
    TreeMap head_tree;
    bool compared = false;
    if (resolved) {
      int type;
      std::string commit;
      if (!store.read(head, &type, &commit) || type != kCommit)
        return kUncertain;  // shallow/partial clone edge — let git decide
      if (commit.rfind("tree ", 0) != 0 || commit.size() < 45)
        return kError;
      Oid tree_oid;
      if (!parse_hex_oid(commit.c_str() + 5, &tree_oid)) return kError;
      if (index.cache_tree_valid && index.cache_tree == tree_oid) {
        // The index's cache-tree root says the index writes exactly HEAD's
        // tree: certainly no staged changes, no tree objects to read.
        compared = true;
      } else {
        head_tree.reserve(ctx.tracked.size() * 2 + 16);
        if (!flatten_tree(store, tree_oid, "", &head_tree, 0))
          return kUncertain;
      }
    } else if (!unborn) {
      return kUncertain;
    }
    // Compare: index stage-0 (minus intent-to-add, minus gitlinks) vs tree.
    std::vector<std::pair<std::string, const IndexEntry*>> adds;
    std::vector<std::pair<std::string, TreeEnt>> dels;
    if (!compared) {
      std::string key;
      for (const auto& [path, tr] : ctx.tracked) {
        const IndexEntry* ep = tr.e;
        if (ep->intent_to_add) continue;
        if (ep->mode == kModeGitlink) continue;
        key.assign(path.data(), path.size());
        auto it = head_tree.find(key);
        if (it == head_tree.end()) {
          ctx.bits |= kStaged;
          if (rec) adds.emplace_back(key, ep);
          continue;
        }
        bool type_diff = (it->second.mode & 0170000) != (ep->mode & 0170000);
        bool mode_diff = facts.filemode ? (it->second.mode != ep->mode)
                                        : type_diff;
        if (mode_diff || it->second.oid != ep->oid) {
          ctx.bits |= kStaged;
          if (rec)
            rec->push_back({0, char(type_diff ? 'T' : 'M'), key, {}});
        }
      }
      if (rec || !(ctx.bits & kStaged)) {
        for (const auto& [path, te] : head_tree) {
          std::string_view pv(path);
          if (!ctx.tracked.count(pv) && !ctx.conflicted.count(pv)) {
            // A path present in HEAD and absent from stage-0 *without*
            // conflict stages is a staged delete.
            ctx.bits |= kStaged;
            if (!rec) break;
            dels.emplace_back(path, te);
          }
        }
      }
    }
    if (rec && (!adds.empty() || !dels.empty())) {
      if (facts.renames) {
        // git always pairs exact (identical-oid) renames; pair greedily in
        // path order, like diffcore-rename's exact pass.
        auto by_path = [](const auto& a, const auto& b) {
          return a.first < b.first;
        };
        std::sort(adds.begin(), adds.end(), by_path);
        std::sort(dels.begin(), dels.end(), by_path);
        std::vector<char> del_used(dels.size(), 0);
        std::map<Oid, std::vector<size_t>> del_by_oid;
        for (size_t i = 0; i < dels.size(); ++i)
          del_by_oid[dels[i].second.oid].push_back(i);
        std::vector<char> add_used(adds.size(), 0);
        for (size_t i = 0; i < adds.size(); ++i) {
          auto it = del_by_oid.find(adds[i].second->oid);
          if (it == del_by_oid.end() || it->second.empty()) continue;
          size_t di = it->second.front();
          it->second.erase(it->second.begin());
          add_used[i] = del_used[di] = 1;
          rec->push_back({0, 'R', adds[i].first, dels[di].first});
        }
        bool rest_adds = false, rest_dels = false;
        for (size_t i = 0; i < adds.size(); ++i)
          if (!add_used[i]) rest_adds = true;
        for (size_t i = 0; i < dels.size(); ++i)
          if (!del_used[i]) rest_dels = true;
        // Content-similarity renames are git's call, not ours: when both
        // unmatched adds and deletes remain, porcelain might pair some of
        // them — decline rather than diverge.
        if (rest_adds && rest_dels) return kUncertain;
        for (size_t i = 0; i < adds.size(); ++i)
          if (!add_used[i]) rec->push_back({0, 'A', adds[i].first, {}});
        for (size_t i = 0; i < dels.size(); ++i)
          if (!del_used[i]) rec->push_back({0, 'D', dels[i].first, {}});
      } else {
        for (auto& a : adds) rec->push_back({0, 'A', a.first, {}});
        for (auto& d : dels) rec->push_back({0, 'D', d.first, {}});
      }
    }
  }

  phase("staged");

  // --- unstaged + untracked: one fused (possibly multithreaded) walk --------
  {
    auto base = std::make_shared<IgnoreNode>();
    std::string text;
    if (!facts.excludes_file.empty()) {
      std::string p = facts.excludes_file;
      if (!p.empty() && p[0] == '~') {
        p = (home ? std::string(home) : "") + p.substr(1);
      }
      if (read_file(p, &text)) parse_ignore_lines(text, "", &base->pats);
    } else {
      std::string gi = xdg ? std::string(xdg) + "/git/ignore"
                           : (home ? std::string(home) + "/.config/git/ignore"
                                   : "");
      if (!gi.empty() && read_file(gi, &text))
        parse_ignore_lines(text, "", &base->pats);
    }
    text.clear();
    if (read_file(common_dir + "/info/exclude", &text))
      parse_ignore_lines(text, "", &base->pats);
    run_walk(&ctx, std::move(base), rec);
    phase("walk");
    if (ctx.uncertain) return kUncertain;
    scan_unvisited(&ctx, rec);
    phase("unvisited");
    if (ctx.uncertain) return kUncertain;
  }

  return ctx.bits & kAllBits;
}

}  // namespace

extern "C" {

// Subprocess-free dirty check. Returns a bitmask (1 staged | 2 unstaged |
// 4 untracked | 8 conflicted), or -1 when the repository uses features the
// scanner cannot certify (caller falls back to `git status`), or -2 on a
// malformed repository / IO error.
int wgit_quick_dirty(const char* workdir, const char* git_dir,
                     const char* common_dir) {
  try {
    return scan_impl(workdir, git_dir, common_dir, nullptr);
  } catch (...) {
    return kError;
  }
}

// Full status query: porcelain-equivalent record list. Returns a pointer to
// a thread-local buffer of `*len` bytes — records are
//   <bucket char '0'..'3'> <letter> <path> '\0' <orig> '\0'
// sorted by path within each bucket (bucket 0 staged, 1 unstaged,
// 2 untracked, 3 conflicted; letters A M D R T U ?). On refusal the return
// is NULL with *len = -1 (fall back to `git status`), on error -2.
const char* wgit_status_scan(const char* workdir, const char* git_dir,
                             const char* common_dir, long* len) {
  static thread_local std::string buf;
  if (!len) return nullptr;
  try {
    Collector rec;
    int bits = scan_impl(workdir, git_dir, common_dir, &rec);
    if (bits < 0) {
      *len = bits;
      return nullptr;
    }
    std::sort(rec.begin(), rec.end(),
              [](const StatusRecord& a, const StatusRecord& b) {
                if (a.bucket != b.bucket) return a.bucket < b.bucket;
                return a.path < b.path;
              });
    buf.clear();
    for (const auto& r : rec) {
      buf += char('0' + r.bucket);
      buf += r.letter;
      buf += r.path;
      buf += '\0';
      buf += r.orig;
      buf += '\0';
    }
    *len = long(buf.size());
    return buf.data();
  } catch (...) {
    *len = kError;
    return nullptr;
  }
}

}  // extern "C"
