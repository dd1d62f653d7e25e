// Read simulator — native counterpart of seqrequester
// (`seqrequester simulate -genome ... -genomesize ... -coverage ...
// -distribution ...`, pipeline.py:167-168), emitting headers in the final
// post-change_description format (pipeline.py:46-61):
//   ><idx> strand=±, start=<s>, end=<e>
// Lengths are drawn from an empirical distribution file (one observed
// length per line, data/references/lengths/chr*.txt); without a file, a
// HiFi-like clipped normal (mean 18kb, sd 4kb) is used.
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

#include "common.hpp"

// Per-base sequencing errors (HiFi-like mix: 90% substitution, 5%
// insertion, 5% deletion). seqrequester itself is error-free; this extends
// it so the noisy-read leg Raven handles in the reference is exercisable.
static std::string inject_errors(const std::string& seq, double rate,
                                 gn::Rng& rng) {
  static const char kBases[4] = {'A', 'C', 'G', 'T'};
  std::string out;
  out.reserve(seq.size() + 16);
  for (char c : seq) {
    if (rng.uniform() >= rate) {
      out.push_back(c);
      continue;
    }
    double kind = rng.uniform();
    if (kind < 0.90) {  // substitution with a different base
      char b;
      do {
        b = kBases[rng.below(4)];
      } while (b == c);
      out.push_back(b);
    } else if (kind < 0.95) {  // insertion: base + random extra
      out.push_back(c);
      out.push_back(kBases[rng.below(4)]);
    }  // else deletion: drop the base
  }
  return out;
}

extern "C" long long gn_simulate_reads(const char* genome_path,
                                       const char* out_path, double coverage,
                                       const char* distribution_path,
                                       long long seed, double error_rate) {
  auto records = gn::read_fasta(genome_path);
  if (records.empty()) return -1;
  std::string genome;
  for (auto& r : records) genome += r.seq;
  const int64_t g_len = (int64_t)genome.size();
  if (g_len == 0) return -1;

  std::vector<int64_t> lengths;
  if (distribution_path && distribution_path[0]) {
    std::ifstream in(distribution_path);
    int64_t v;
    while (in >> v) lengths.push_back(v);
  }

  gn::Rng rng((uint64_t)seed);
  std::FILE* out = std::fopen(out_path, "w");
  if (!out) return -2;

  const double target = coverage * (double)g_len;
  double total = 0;
  long long idx = 0;
  std::string header;
  while (total < target) {
    int64_t length;
    if (!lengths.empty()) {
      length = lengths[rng.below((int64_t)lengths.size())];
    } else {
      // Box-Muller clipped normal, mean 18kb sd 4kb, floor 1kb
      double u1 = rng.uniform(), u2 = rng.uniform();
      double z = std::sqrt(-2.0 * std::log(std::max(u1, 1e-12))) *
                 std::cos(6.283185307179586 * u2);
      length = (int64_t)(18000.0 + 4000.0 * z);
      if (length < 1000) length = 1000;
    }
    if (length > g_len) length = g_len;
    int64_t start = rng.below(g_len - length + 1);
    int64_t end = start + length;
    bool fwd = rng.uniform() < 0.5;
    std::string seq = genome.substr((size_t)start, (size_t)length);
    if (!fwd) seq = gn::reverse_complement(seq);
    if (error_rate > 0.0) seq = inject_errors(seq, error_rate, rng);
    char buf[128];
    std::snprintf(buf, sizeof(buf), "%lld strand=%c, start=%lld, end=%lld",
                  idx, fwd ? '+' : '-', (long long)start, (long long)end);
    header = buf;
    gn::write_fasta_record(out, header, seq);
    total += (double)length;
    ++idx;
  }
  std::fclose(out);
  return idx;
}
