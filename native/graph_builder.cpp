// Overlap-graph builder: minimizer overlap detection, containment removal,
// transitive reduction, CSV/GFA emission.
//
// Native counterpart of the role Raven plays for the reference
// (graph_dataset.py:120: `raven --identity 0.99 -k29 -w9 -t32 -p0` with the
// print_graphs branch dumping graph_1.csv/graph_1.gfa). Same algorithmic
// pipeline as the Python spec in gnnome_tpu/data/builder.py, OpenMP-threaded
// and index-filtered for chromosome-scale inputs:
//
//   1. canonical (k,w)-minimizers per read; global index sorted by hash,
//      hashes above an occurrence cap dropped (repeat filter, the role of
//      Raven's frequency threshold);
//   2. per-read candidate matches -> per (pair, orientation) offset votes;
//      median offset + support -> suffix/prefix overlap or containment;
//   3. Myers-style transitive reduction;
//   4. CSV/GFA emission in the exact reference parser contract
//      (graph_parser.py:187-200): node pairs 2i/2i+1, edge rows
//      "edge_id prefix_len weight similarity", GFA S-lines with 5 fields.
#ifdef _OPENMP
#include <omp.h>
#ifdef _OPENMP
#include <parallel/algorithm>
#endif
#endif

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <map>
#include <string>
#include <unordered_map>
#include <vector>
#include <chrono>
#include <cstdio>

#include "common.hpp"

namespace gn {

struct IndexEntry {  // packed to 16B: halves index memory + sort bandwidth
  uint64_t hash;
  int32_t pos;
  uint32_t rs;  // read << 1 | strand
  int32_t read() const { return (int32_t)(rs >> 1); }
  uint8_t strand() const { return (uint8_t)(rs & 1); }
};

struct Overlap {
  int64_t u, v;  // oriented node ids (2r / 2r+1)
  int64_t prefix_len;
  int64_t overlap_len;
  float similarity;
};

using OverlapVec = std::vector<Overlap, PopAlloc<Overlap>>;

struct BuilderResult {
  OverlapVec overlaps;
  std::vector<char> contained;
};

static BuilderResult find_overlaps(const std::vector<std::string>& reads,
                                   int k, int w, int min_overlap,
                                   int min_matches, int offset_tol,
                                   int occ_cap, int threads) {
  const int n_reads = (int)reads.size();
  auto t0 = std::chrono::steady_clock::now();
  auto lap = [&t0](const char* stage) {
    auto now = std::chrono::steady_clock::now();
    std::fprintf(stderr, "[builder] %s: %.1fs\n", stage,
                 std::chrono::duration<double>(now - t0).count());
    t0 = now;
  };
  std::vector<int64_t> lens(n_reads);
  for (int i = 0; i < n_reads; ++i) lens[i] = (int64_t)reads[i].size();

  // 1. minimizers + global sorted index
  std::vector<std::vector<Minimizer>> mins(n_reads);
#pragma omp parallel for schedule(dynamic, 16) num_threads(threads)
  for (int i = 0; i < n_reads; ++i) mins[i] = minimizers(reads[i], k, w);

  std::vector<size_t> offsets(n_reads + 1, 0);
  for (int r = 0; r < n_reads; ++r) offsets[r + 1] = offsets[r] + mins[r].size();
  const size_t total = offsets[n_reads];
  std::vector<IndexEntry, PopAlloc<IndexEntry>> index(total);
  // parallel direct-write fill: single-threaded first-touch after a
  // parallel region costs ~120us/page on this kernel class (see PopAlloc);
  // threaded writes into the populated mapping stay on the fast path
#pragma omp parallel for schedule(static) num_threads(threads)
  for (int r = 0; r < n_reads; ++r) {
    IndexEntry* out = index.data() + offsets[r];
    for (auto& m : mins[r])
      *out++ = {m.hash, m.pos, ((uint32_t)r << 1) | m.strand};
  }
  lap("minimizers+index-fill");
  // total-order comparator: deterministic even under an unstable /
  // parallel sort. (__gnu_parallel::sort hung here historically when the
  // requested thread count oversubscribed the machine; the entry point
  // now clamps threads to the core count, and the parallel sort is ~3x
  // on 4 cores.)
  auto index_less = [](const IndexEntry& a, const IndexEntry& b) {
    if (a.hash != b.hash) return a.hash < b.hash;
    if (a.rs != b.rs) return a.rs < b.rs;
    return a.pos < b.pos;
  };
#ifdef _OPENMP
  omp_set_num_threads(threads);
  __gnu_parallel::sort(index.begin(), index.end(), index_less);
#else
  std::sort(index.begin(), index.end(), index_less);
#endif

  lap("index-sort");
  // flat bucket table over the hash-sorted index (top bits -> range
  // start). Replaces an unordered_map whose ~15M node allocations were
  // the dominant cost of the matching stage on slow-fault kernels.
  constexpr int kBucketBits = 24;
  constexpr int kBucketShift = 64 - kBucketBits;
  std::vector<uint32_t, PopAlloc<uint32_t>> bucket_start((1u << kBucketBits) + 1, 0);
  {
    // counting pass: bucket_start[b+1] = #entries in bucket b, then scan
    for (auto& e : index) ++bucket_start[(e.hash >> kBucketShift) + 1];
    uint32_t acc = 0;
    for (size_t b = 1; b < bucket_start.size(); ++b) {
      acc += bucket_start[b];
      bucket_start[b] = acc;
    }
    bucket_start[0] = 0;
  }
  // equal-hash range of h among index[s0, s1), or empty if over occ_cap
  auto hash_range = [&](uint64_t h) -> std::pair<uint32_t, uint32_t> {
    const uint32_t b = (uint32_t)(h >> kBucketShift);
    const IndexEntry* lo = index.data() + bucket_start[b];
    const IndexEntry* hi = index.data() + bucket_start[b + 1];
    const IndexEntry* s = std::lower_bound(
        lo, hi, h, [](const IndexEntry& e, uint64_t x) { return e.hash < x; });
    const IndexEntry* e = s;
    while (e < hi && e->hash == h && (int)(e - s) <= occ_cap) ++e;
    if ((int)(e - s) > occ_cap) return {0, 0};  // over-frequent hash: drop
    return {(uint32_t)(s - index.data()), (uint32_t)(e - index.data())};
  };
  lap("bucket-table");

  struct Match {
    int32_t other;
    uint8_t orient;
    int32_t diff;
  };

  BuilderResult res;
  res.contained.assign(n_reads, 0);
  std::vector<OverlapVec> per_thread(std::max(threads, 1));

#pragma omp parallel num_threads(threads)
  {
#ifdef _OPENMP
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    std::vector<Match> matches;
#pragma omp for schedule(dynamic, 8)
    for (int a = 0; a < n_reads; ++a) {
      matches.clear();
      for (auto& m : mins[a]) {
        auto [rs_lo, rs_hi] = hash_range(m.hash);
        for (uint32_t s = rs_lo; s < rs_hi; ++s) {
          const IndexEntry& o = index[s];
          const int32_t oread = o.read();
          if (oread <= a) continue;  // each unordered pair handled once
          uint8_t orient = m.strand ^ o.strand();
          int32_t diff = orient == 0
                             ? m.pos - o.pos
                             : m.pos - (int32_t)(lens[oread] - k - o.pos);
          matches.push_back({oread, orient, diff});
        }
      }
      std::sort(matches.begin(), matches.end(),
                [](const Match& x, const Match& y) {
                  if (x.other != y.other) return x.other < y.other;
                  if (x.orient != y.orient) return x.orient < y.orient;
                  return x.diff < y.diff;
                });
      for (size_t s = 0; s < matches.size();) {
        size_t e = s + 1;
        while (e < matches.size() && matches[e].other == matches[s].other &&
               matches[e].orient == matches[s].orient)
          ++e;
        const int b = matches[s].other;
        const uint8_t orient = matches[s].orient;
        const size_t cnt = e - s;
        if ((int)cnt >= min_matches) {
          int64_t t = matches[s + cnt / 2].diff;  // median (sorted by diff)
          int support = 0;
          for (size_t i = s; i < e; ++i)
            if (std::abs((int64_t)matches[i].diff - t) <= offset_tol) ++support;
          if (support >= min_matches) {
            const int64_t la = lens[a], lb = lens[b];
            auto similarity = [&](int64_t ovl) {
              double expected = 2.0 * (double)ovl / ((double)k * w);
              double sim = support / std::max(1.0, expected);
              return (float)std::min(1.0, sim);
            };
            if (t >= 0) {
              if (t + lb <= la) {
#pragma omp critical(contained)
                res.contained[b] = 1;
              } else if (la - t >= min_overlap) {
                int64_t ovl = la - t;
                int64_t u = 2 * (int64_t)a, v = 2 * (int64_t)b + orient;
                per_thread[tid].push_back({u, v, t, ovl, similarity(ovl)});
                per_thread[tid].push_back(
                    {v ^ 1, u ^ 1, lb - ovl, ovl, similarity(ovl)});
              }
            } else {
              int64_t t2 = -t;
              if (t2 + la <= lb) {
#pragma omp critical(contained)
                res.contained[a] = 1;
              } else if (lb - t2 >= min_overlap) {
                int64_t ovl = lb - t2;
                int64_t u = 2 * (int64_t)b + orient, v = 2 * (int64_t)a;
                per_thread[tid].push_back({u, v, t2, ovl, similarity(ovl)});
                per_thread[tid].push_back(
                    {v ^ 1, u ^ 1, la - ovl, ovl, similarity(ovl)});
              }
            }
          }
        }
        s = e;
      }
    }
  }
  lap("matching");
  size_t n_ovl = 0;
  for (auto& v : per_thread) n_ovl += v.size();
  res.overlaps.reserve(n_ovl);
  for (auto& v : per_thread)
    res.overlaps.insert(res.overlaps.end(), v.begin(), v.end());
  // Deterministic output: which thread produced an overlap depends on the
  // dynamic schedule, so the concatenation order above varies run to run.
  // A total-order sort makes the emitted graph (edge ids, transitive-
  // reduction tie-breaks) identical across runs and thread counts.
  std::sort(res.overlaps.begin(), res.overlaps.end(),
            [](const Overlap& x, const Overlap& y) {
              if (x.u != y.u) return x.u < y.u;
              if (x.v != y.v) return x.v < y.v;
              return x.prefix_len < y.prefix_len;
            });
  return res;
}

// Myers transitive reduction with fuzz (same as the Python spec).
static OverlapVec transitive_reduction(
    const OverlapVec& overlaps, int64_t fuzz) {
  std::unordered_map<int64_t, std::vector<const Overlap*>> adj;
  adj.reserve(overlaps.size());
  for (auto& o : overlaps) adj[o.u].push_back(&o);
  for (auto& kv : adj)
    std::sort(kv.second.begin(), kv.second.end(),
              [](const Overlap* x, const Overlap* y) {
                return x->prefix_len != y->prefix_len
                           ? x->prefix_len < y->prefix_len
                           : x->v < y->v;  // total order: deterministic ties
              });
  OverlapVec keep;
  keep.reserve(overlaps.size());
  for (auto& o : overlaps) {
    bool reduced = false;
    for (const Overlap* mid : adj[o.u]) {
      if (mid->v == o.v || mid->prefix_len >= o.prefix_len) continue;
      auto it = adj.find(mid->v);
      if (it == adj.end()) continue;
      for (const Overlap* far : it->second) {
        if (far->v == o.v &&
            std::llabs(mid->prefix_len + far->prefix_len - o.prefix_len) <=
                fuzz) {
          reduced = true;
          break;
        }
      }
      if (reduced) break;
    }
    if (!reduced) keep.push_back(o);
  }
  return keep;
}

static int emit_graph(const std::vector<FastaRecord>& records,
                      const OverlapVec& overlaps_in,
                      const std::vector<char>& contained,
                      const std::string& csv_path) {
  // keep non-contained reads appearing in >=1 overlap
  std::vector<char> used(records.size(), 0);
  for (auto& o : overlaps_in) {
    used[o.u / 2] = 1;
    used[o.v / 2] = 1;
  }
  std::vector<int32_t> used_reads;
  for (size_t r = 0; r < records.size(); ++r)
    if (used[r] && !contained[r]) used_reads.push_back((int32_t)r);
  std::vector<int64_t> read_to_line(records.size(), -1);
  for (size_t g = 0; g < used_reads.size(); ++g)
    read_to_line[used_reads[g]] = (int64_t)g;

  OverlapVec overlaps;
  overlaps.reserve(overlaps_in.size());
  for (auto& o : overlaps_in)
    if (read_to_line[o.u / 2] >= 0 && read_to_line[o.v / 2] >= 0)
      overlaps.push_back(o);

  std::string gfa_path = csv_path.substr(0, csv_path.size() - 3) + "gfa";
  std::FILE* gfa = std::fopen(gfa_path.c_str(), "w");
  if (!gfa) return 2;
  for (int32_t r : used_reads) {
    std::string rid = records[r].header.substr(0, records[r].header.find(' '));
    std::fprintf(gfa, "S\t%s\t%s\tLN:i:%zu\tRC:i:1\n", rid.c_str(),
                 records[r].seq.c_str(), records[r].seq.size());
  }
  std::fclose(gfa);

  auto node_field = [&](int64_t node, std::string& out) {
    int64_t g = node / 2;
    char buf[64];
    std::snprintf(buf, sizeof(buf), "%lld [%lld] LN:i:%zu", (long long)node,
                  (long long)g, records[used_reads[g]].seq.size());
    out = buf;
  };

  std::FILE* csv = std::fopen(csv_path.c_str(), "w");
  if (!csv) return 2;
  std::string fu, fv;
  for (size_t g = 0; g < used_reads.size(); ++g) {
    node_field(2 * (int64_t)g, fu);
    node_field(2 * (int64_t)g + 1, fv);
    std::fprintf(csv, "%s,%s,0,-\n", fu.c_str(), fv.c_str());
  }
  int64_t eid = 0;
  for (auto& o : overlaps) {
    int64_t u = 2 * read_to_line[o.u / 2] + (o.u & 1);
    int64_t v = 2 * read_to_line[o.v / 2] + (o.v & 1);
    node_field(u, fu);
    node_field(v, fv);
    std::fprintf(csv, "%s,%s,1,%lld %lld %lld %.4f\n", fu.c_str(), fv.c_str(),
                 (long long)eid, (long long)o.prefix_len,
                 (long long)o.overlap_len, o.similarity);
    ++eid;
  }
  std::fclose(csv);
  return 0;
}

}  // namespace gn

extern "C" int gn_build_overlap_graph(const char* reads_path,
                                      const char* csv_path, int threads,
                                      double identity, int k, int w,
                                      int min_overlap) {
  (void)identity;  // reads are error-free simulations; kept for API parity
  auto records = gn::read_fasta(reads_path);
  if (records.empty()) return 1;
  std::vector<std::string> reads;
  reads.reserve(records.size());
  for (auto& r : records) reads.push_back(r.seq);

#ifdef _OPENMP
  threads = std::min(std::max(threads, 1), omp_get_num_procs());
#endif
  auto res = gn::find_overlaps(reads, k, w, min_overlap,
                               /*min_matches=*/4, /*offset_tol=*/128,
                               /*occ_cap=*/256, std::max(threads, 1));
  auto reduced = gn::transitive_reduction(res.overlaps, /*fuzz=*/500);
  return gn::emit_graph(records, reduced, res.contained, csv_path);
}
