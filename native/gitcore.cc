// libwgitcore — native helpers for the hot, frequently-polled git paths.
//
// The 5-second ref-fingerprint reconciliation (engine invariant #8;
// reference: src/git/mod.rs:99-127 computes it in ~0.5 ms on the frame
// thread) must stay cheap: this walks HEAD + packed-refs + the refs dir
// and hashes names + contents with FNV-1a, no subprocess, no allocation
// churn. Loaded via ctypes from whisper_git_tpu.gitcore.native.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <filesystem>
#include <string>
#include <vector>
#include <algorithm>

namespace fs = std::filesystem;

namespace {

constexpr uint64_t kFnvOffset = 1469598103934665603ull;
constexpr uint64_t kFnvPrime = 1099511628211ull;

inline void fnv_bytes(uint64_t& h, const void* data, size_t n) {
  const unsigned char* p = static_cast<const unsigned char*>(data);
  for (size_t i = 0; i < n; ++i) {
    h ^= p[i];
    h *= kFnvPrime;
  }
}

void hash_file(uint64_t& h, const fs::path& path) {
  std::FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return;
  const std::string name = path.string();
  fnv_bytes(h, name.data(), name.size());
  fnv_bytes(h, "\0", 1);
  char buf[4096];
  size_t n;
  while ((n = std::fread(buf, 1, sizeof buf, f)) > 0) {
    fnv_bytes(h, buf, n);
  }
  std::fclose(f);
  fnv_bytes(h, "\0", 1);
}

}  // namespace

extern "C" {

// Writes a hex fingerprint (two independent FNV streams, 32 hex chars)
// into `out`. Returns 0 on success, nonzero on failure.
int wgit_ref_fingerprint(const char* git_dir, const char* common_dir,
                         char* out, size_t out_len) {
  if (!git_dir || !common_dir || !out || out_len < 33) return 1;
  uint64_t h1 = kFnvOffset;
  std::error_code ec;

  hash_file(h1, fs::path(git_dir) / "HEAD");
  hash_file(h1, fs::path(common_dir) / "packed-refs");

  std::vector<std::string> files;
  const fs::path refs_root = fs::path(common_dir) / "refs";
  if (fs::exists(refs_root, ec)) {
    for (auto it = fs::recursive_directory_iterator(
             refs_root, fs::directory_options::skip_permission_denied, ec);
         it != fs::recursive_directory_iterator(); it.increment(ec)) {
      if (ec) break;
      if (it->is_regular_file(ec)) files.push_back(it->path().string());
    }
  }
  std::sort(files.begin(), files.end());
  uint64_t h2 = kFnvOffset ^ files.size();
  for (const auto& f : files) hash_file(h2, fs::path(f));

  std::snprintf(out, out_len, "%016llx%016llx",
                static_cast<unsigned long long>(h1),
                static_cast<unsigned long long>(h2));
  return 0;
}

// Resolve HEAD: writes either the symbolic target ("refs/heads/main") or
// the raw OID into `out`. Returns 0 on success.
int wgit_read_head(const char* git_dir, char* out, size_t out_len) {
  if (!git_dir || !out || out_len < 2) return 1;
  std::FILE* f = std::fopen((fs::path(git_dir) / "HEAD").c_str(), "rb");
  if (!f) return 2;
  char buf[512];
  size_t n = std::fread(buf, 1, sizeof buf - 1, f);
  std::fclose(f);
  buf[n] = 0;
  // Trim trailing whitespace.
  while (n > 0 && (buf[n - 1] == '\n' || buf[n - 1] == '\r' ||
                   buf[n - 1] == ' ')) {
    buf[--n] = 0;
  }
  const char* s = buf;
  if (std::strncmp(s, "ref: ", 5) == 0) s += 5;
  std::snprintf(out, out_len, "%s", s);
  return 0;
}

}  // extern "C"
