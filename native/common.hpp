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
inline std::vector<Minimizer> minimizers(const std::string& seq, int k, int w) {
  std::vector<Minimizer> out;
  const int n = (int)seq.size();
  if (n < k) return out;
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  const int shift = 2 * (k - 1);
  uint64_t fwd = 0, rev = 0;
  int valid = 0;
  std::vector<Minimizer> kmers;
  kmers.reserve(n);
  for (int i = 0; i < n; ++i) {
    int code = base_code(seq[i]);
    if (code < 0) {
      valid = 0;
      fwd = rev = 0;
      continue;
    }
    fwd = ((fwd << 2) | (uint64_t)code) & mask;
    rev = (rev >> 2) | ((uint64_t)(3 - code) << shift);
    if (++valid >= k) {
      int pos = i - k + 1;
      if (fwd <= rev)
        kmers.push_back({hash64(fwd), pos, 0});
      else
        kmers.push_back({hash64(rev), pos, 1});
    }
  }
  auto less = [](const Minimizer& a, const Minimizer& b) {
    return a.hash != b.hash ? a.hash < b.hash
                            : (a.pos != b.pos ? a.pos < b.pos : a.strand < b.strand);
  };
  uint64_t last_hash = ~0ULL;
  int last_pos = -1;
  const int m = (int)kmers.size();
  for (int start = 0; start <= std::max(m - w, 0) && start < m; ++start) {
    const Minimizer* best = &kmers[start];
    for (int j = 1; j < w && start + j < m; ++j)
      if (less(kmers[start + j], *best)) best = &kmers[start + j];
    if (best->hash != last_hash || best->pos != last_pos) {
      out.push_back(*best);
      last_hash = best->hash;
      last_pos = best->pos;
    }
  }
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
