// Shared helpers for the native tools: FASTA IO, minimizers, RNG.
//
// These are the in-repo replacements for the external C++ tools the
// reference shells out to (seqrequester, pipeline.py:140-143; Raven,
// pipeline.py:177-181) — same roles, same file contracts, built as one
// shared library with C entry points (see api.cpp).
#pragma once

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <sys/mman.h>
#include <vector>

namespace gn {

struct FastaRecord {
  std::string header;  // full header line without '>'
  std::string seq;
};

inline std::vector<FastaRecord> read_fasta(const std::string& path) {
  std::vector<FastaRecord> records;
  std::ifstream in(path);
  if (!in) return records;
  std::string line;
  FastaRecord cur;
  bool have = false;
  while (std::getline(in, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty()) continue;
    if (line[0] == '>') {
      if (have) records.push_back(std::move(cur));
      cur = FastaRecord{line.substr(1), ""};
      have = true;
    } else if (have) {
      for (char c : line) cur.seq.push_back(std::toupper(c));
    }
  }
  if (have) records.push_back(std::move(cur));
  return records;
}

inline void write_fasta_record(std::FILE* f, const std::string& header,
                               const std::string& seq, int width = 80) {
  std::fprintf(f, ">%s\n", header.c_str());
  for (size_t i = 0; i < seq.size(); i += width) {
    std::fwrite(seq.data() + i, 1, std::min<size_t>(width, seq.size() - i), f);
    std::fputc('\n', f);
  }
}

inline char complement(char c) {
  switch (c) {
    case 'A': return 'T';
    case 'C': return 'G';
    case 'G': return 'C';
    case 'T': return 'A';
    default: return 'N';
  }
}

inline std::string reverse_complement(const std::string& s) {
  std::string out(s.size(), 'N');
  for (size_t i = 0; i < s.size(); ++i)
    out[s.size() - 1 - i] = complement(s[i]);
  return out;
}

// Thomas Wang 64-bit mix — the invertible minimizer hash (same function as
// the Python spec in gnnome_tpu/data/builder.py).
inline uint64_t hash64(uint64_t x) {
  x = (~x) + (x << 21);
  x = x ^ (x >> 24);
  x = (x + (x << 3)) + (x << 8);
  x = x ^ (x >> 14);
  x = (x + (x << 2)) + (x << 4);
  x = x ^ (x >> 28);
  x = x + (x << 31);
  return x;
}

struct Minimizer {
  uint64_t hash;
  int32_t pos;
  uint8_t strand;  // 0 = forward k-mer canonical, 1 = reverse
};

// Allocator that populates large allocations eagerly (MAP_POPULATE).
// On this class of kernels/VMs, per-page minor faults in a process that
// has ever run an OpenMP parallel region cost ~120us each (measured; ~2us
// before the first parallel region) — first-touching a GB-scale buffer
// through malloc took 40-130s. One populated mmap fills the same range in
// ~1-2s. Used for the builder's index / overlap arrays.
template <class T>
struct PopAlloc {
  using value_type = T;
  PopAlloc() = default;
  template <class U>
  PopAlloc(const PopAlloc<U>&) {}
  static constexpr size_t kMmapBytes = 1u << 20;
  T* allocate(size_t n) {
    const size_t bytes = n * sizeof(T);
    if (bytes >= kMmapBytes) {
      void* p = ::mmap(nullptr, bytes, PROT_READ | PROT_WRITE,
                       MAP_PRIVATE | MAP_ANONYMOUS | MAP_POPULATE, -1, 0);
      if (p != MAP_FAILED) return (T*)p;
    }
    return (T*)::operator new(bytes);
  }
  void deallocate(T* p, size_t n) {
    const size_t bytes = n * sizeof(T);
    if (bytes >= kMmapBytes)
      ::munmap(p, bytes);
    else
      ::operator delete(p);
  }
  template <class U>
  bool operator==(const PopAlloc<U>&) const { return true; }
  template <class U>
  bool operator!=(const PopAlloc<U>&) const { return false; }
};

// Grow-only scratch slabs reused across builder invocations. Profiling a
// chr19-scale run showed the *populate itself* dominating: fresh GB-scale
// MAP_POPULATE mmaps ran at single-digit MB/s on this hypervisor (the
// index allocation alone cost 200-1300s per graph, >half the sort stage),
// while the data passes over the populated memory ran at full bandwidth.
// A pipeline run builds 15+ graphs in one process; keeping the slabs
// alive makes every graph after the first skip the populate entirely.
// Not thread-safe by design: the builder entry points are serial per
// process (the Python bridge holds the GIL across calls).
inline void* scratch_slab(int slot, size_t bytes) {
  constexpr int kSlots = 8;
  static void* ptr[kSlots] = {};
  static size_t cap[kSlots] = {};
  if (cap[slot] < bytes) {
    if (ptr[slot]) ::munmap(ptr[slot], cap[slot]);
    size_t want = bytes + bytes / 4;  // headroom: reads vary ~1% per graph
    void* p = ::mmap(nullptr, want, PROT_READ | PROT_WRITE,
                     MAP_PRIVATE | MAP_ANONYMOUS | MAP_POPULATE, -1, 0);
    if (p == MAP_FAILED) {
      ptr[slot] = nullptr;
      cap[slot] = 0;
      return nullptr;
    }
    ptr[slot] = p;
    cap[slot] = want;
  }
  return ptr[slot];
}

template <class T>
inline T* scratch(int slot, size_t count) {
  return (T*)scratch_slab(slot, count * sizeof(T));
}

inline int base_code(char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    default: return -1;
  }
}

// Window-minimum canonical minimizers (k<=31), matching the Python spec.
//
// Streaming O(n) monotonic-deque window minimum. The previous version
// materialized an O(n) kmer vector per call; at scale those >128KB
// temporaries were mmap'd and returned to the OS on every free, and the
// resulting page-fault storm (kernel time, serialized on mmap) made this
// stage ~40x slower than the arithmetic itself. The deque is w+1 entries,
// allocator-free after the first call via thread_local scratch.
//
// The scan is a template over the emit sink so the two-pass arena build
// (count, then fill) runs the IDENTICAL dedup/window logic in both passes.
template <class EmitFn>
inline void minimizer_scan(const std::string& seq, int k, int w, EmitFn&& sink) {
  const int n = (int)seq.size();
  if (n < k) return;
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  const int shift = 2 * (k - 1);
  uint64_t fwd = 0, rev = 0;
  int valid = 0;

  auto less = [](const Minimizer& a, const Minimizer& b) {
    return a.hash != b.hash ? a.hash < b.hash
                            : (a.pos != b.pos ? a.pos < b.pos : a.strand < b.strand);
  };

  // monotonic deque over the last w kmers (by kmer-list index, exactly the
  // windows the previous implementation scanned)
  struct Cand { Minimizer m; int idx; };
  static thread_local std::vector<Cand> dq_store;
  if ((int)dq_store.size() < w + 1) dq_store.resize(w + 1);
  Cand* dq = dq_store.data();
  int head = 0, tail = 0;  // [head, tail) live candidates
  auto dq_empty = [&]() { return head == tail; };

  uint64_t last_hash = ~0ULL;
  int last_pos = -1;
  auto emit = [&](const Minimizer& best) {
    if (best.hash != last_hash || best.pos != last_pos) {
      sink(best);
      last_hash = best.hash;
      last_pos = best.pos;
    }
  };

  int m = 0;  // kmer-list index
  for (int i = 0; i < n; ++i) {
    int code = base_code(seq[i]);
    if (code < 0) {
      valid = 0;
      fwd = rev = 0;
      continue;
    }
    fwd = ((fwd << 2) | (uint64_t)code) & mask;
    rev = (rev >> 2) | ((uint64_t)(3 - code) << shift);
    if (++valid < k) continue;
    const int pos = i - k + 1;
    Minimizer cur = (fwd <= rev) ? Minimizer{hash64(fwd), pos, 0}
                                 : Minimizer{hash64(rev), pos, 1};
    while (!dq_empty() && less(cur, dq[(tail - 1) % (w + 1)].m)) --tail;
    dq[tail % (w + 1)] = {cur, m};
    ++tail;
    while (dq[head % (w + 1)].idx <= m - w) ++head;
    if (m >= w - 1) emit(dq[head % (w + 1)].m);
    ++m;
  }
  // fewer than w kmers total: one partial window over all of them
  if (m > 0 && m < w && !dq_empty()) emit(dq[head % (w + 1)].m);
}

inline size_t minimizer_count(const std::string& seq, int k, int w) {
  size_t c = 0;
  minimizer_scan(seq, k, w, [&](const Minimizer&) { ++c; });
  return c;
}

inline void minimizers_into(const std::string& seq, int k, int w,
                            std::vector<Minimizer>& out) {
  minimizer_scan(seq, k, w, [&](const Minimizer& m) { out.push_back(m); });
}

inline std::vector<Minimizer> minimizers(const std::string& seq, int k, int w) {
  std::vector<Minimizer> out;
  const int n = (int)seq.size();
  if (n >= k)
    out.reserve((size_t)(2 * (n - k + 1)) / (size_t)(w + 1) + 8);
  minimizers_into(seq, k, w, out);
  return out;
}

// splitmix64 RNG — deterministic, seedable.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed + 0x9E3779B97F4A7C15ULL) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  int64_t below(int64_t n) { return n > 0 ? (int64_t)(next() % (uint64_t)n) : 0; }
};

}  // namespace gn
