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
#include <cstring>
#include <cstdint>
#include <cstdio>
#include <map>
#include <tuple>
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

// span-verified (and identity-gated) overlap candidate; classification
// into overlap vs containment happens after pile trimming, in trimmed
// coordinates (mirrors gnnome_tpu/data/builder.py find_overlaps pass 2)
struct Candidate {
  int32_t a, b;
  uint8_t orient;
  int64_t t;  // oriented-b start offset in a-forward coordinates
  float sim;
};

struct PileIv {
  int32_t read, lo, hi;
};

struct BuilderResult {
  OverlapVec overlaps;
  std::vector<char> contained;
  // per-read pile trim (t0, t1); (-1, -1) = read dropped by trimming
  std::vector<std::pair<int32_t, int32_t>> trims;
};

// Longest per-read region covered by >= min_cov span-verified overlap
// windows (Raven's pile-o-gram trim; data/builder.py _pile_trims).
static void pile_trims(std::vector<PileIv>& ivs, const std::vector<int64_t>& lens,
                       int min_cov, int min_len, int threads,
                       std::vector<std::pair<int32_t, int32_t>>& trims) {
  const int n_reads = (int)lens.size();
  std::sort(ivs.begin(), ivs.end(), [](const PileIv& x, const PileIv& y) {
    return x.read != y.read ? x.read < y.read
                            : (x.lo != y.lo ? x.lo < y.lo : x.hi < y.hi);
  });
  std::vector<size_t> starts(n_reads + 1, 0);
  for (const auto& iv : ivs) ++starts[iv.read + 1];
  for (int r = 0; r < n_reads; ++r) starts[r + 1] += starts[r];
#pragma omp parallel num_threads(std::max(threads, 1))
  {
    std::vector<std::pair<int32_t, int32_t>> ev;  // (pos, delta)
#pragma omp for schedule(dynamic, 256)
    for (int r = 0; r < n_reads; ++r) {
      const size_t lo = starts[r], hi = starts[r + 1];
      if (lo == hi) {
        trims[r] = {-1, -1};
        continue;
      }
      ev.clear();
      for (size_t i = lo; i < hi; ++i) {
        ev.push_back({ivs[i].lo, 1});
        ev.push_back({ivs[i].hi, -1});
      }
      std::sort(ev.begin(), ev.end());
      int cov = 0;
      int32_t run_start = -1, best_lo = 0, best_hi = 0;
      for (auto& [pos, delta] : ev) {
        int was = cov;
        cov += delta;
        if (was < min_cov && cov >= min_cov) {
          run_start = pos;
        } else if (cov < min_cov && was >= min_cov && run_start >= 0) {
          if (pos - run_start > best_hi - best_lo) {
            best_lo = run_start;
            best_hi = pos;
          }
          run_start = -1;
        }
      }
      trims[r] = (best_hi - best_lo < min_len)
                     ? std::make_pair((int32_t)-1, (int32_t)-1)
                     : std::make_pair(best_lo, best_hi);
    }
  }
}

static BuilderResult find_overlaps(const std::vector<std::string>& reads,
                                   int k, int w, int min_overlap,
                                   int min_matches, int offset_tol,
                                   int occ_cap, int max_gap, int threads,
                                   double identity, int trim_min_cov) {
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

  // 1. minimizers into one flat read-major arena (two-pass: count, fill).
  // A vector-of-vectors at chromosome scale is ~6 GB of small mallocs
  // whose first-touch faults cost ~120us/page on this kernel class (see
  // PopAlloc); the arena is one populated mapping, written in parallel.
  // The second minimizer computation is cheaper than the faults it saves.
  std::vector<size_t> offsets(n_reads + 1, 0);
#pragma omp parallel for schedule(dynamic, 64) num_threads(threads)
  for (int r = 0; r < n_reads; ++r)
    offsets[r + 1] = minimizer_count(reads[r], k, w);
  for (int r = 0; r < n_reads; ++r) offsets[r + 1] += offsets[r];
  const size_t total = offsets[n_reads];
  // GB-scale buffers come from the process-lifetime scratch pool: fresh
  // MAP_POPULATE mmaps cost 100s+ of seconds per GB on this hypervisor
  // (profiled; see common.hpp scratch_slab) and a pipeline run calls the
  // builder 15+ times in one process.
  std::vector<IndexEntry, PopAlloc<IndexEntry>> arena_fb;
  IndexEntry* arena = scratch<IndexEntry>(0, total);
  if (!arena) {
    arena_fb.resize(total);
    arena = arena_fb.data();
  }
#pragma omp parallel num_threads(threads)
  {
    std::vector<Minimizer> scratch;
#pragma omp for schedule(dynamic, 64)
    for (int r = 0; r < n_reads; ++r) {
      scratch.clear();
      minimizers_into(reads[r], k, w, scratch);
      IndexEntry* out = arena + offsets[r];
      for (auto& m : scratch)
        *out++ = {m.hash, m.pos, ((uint32_t)r << 1) | m.strand};
    }
  }
  lap("minimizers+arena-fill");

  // 2. hash-sorted index by parallel radix scatter: 24-bit top-bits
  // counting sort (per-thread histograms -> global offsets -> scatter)
  // then per-bucket comparison sorts. One linear write pass instead of a
  // multi-pass merge sort over the full 16B x total array; the per-bucket
  // total-order sort keeps the result deterministic regardless of thread
  // count or scatter interleaving.
  // bucket count scaled to the input: ~4+ entries/bucket expected. The
  // fixed 24-bit table cost ~90s of page-faulted histogram traffic on
  // sub-megabase inputs (T x 16M counters) for zero sort benefit.
  int bucket_bits = 24;
  while (bucket_bits > 8 && ((size_t)1 << bucket_bits) > total / 4 + 1)
    --bucket_bits;
  const int kBucketShift = 64 - bucket_bits;
  const size_t kNB = (size_t)1 << bucket_bits;
  const int T = std::max(threads, 1);
  std::vector<IndexEntry, PopAlloc<IndexEntry>> index_fb;
  IndexEntry* index = scratch<IndexEntry>(1, total);
  if (!index) {
    index_fb.resize(total);
    index = index_fb.data();
  }
  std::vector<uint32_t, PopAlloc<uint32_t>> bucket_start_fb;
  uint32_t* bucket_start = scratch<uint32_t>(2, kNB + 1);
  if (!bucket_start) {
    bucket_start_fb.resize(kNB + 1);
    bucket_start = bucket_start_fb.data();
  }
  {
    // hist is the only pooled buffer needing zero-init (bucket_start and
    // index are fully overwritten); memset over already-resident pages is
    // bandwidth-bound, not fault-bound.
    std::vector<uint32_t, PopAlloc<uint32_t>> hist_fb;
    uint32_t* hist = scratch<uint32_t>(3, (size_t)T * kNB);
    if (!hist) {
      hist_fb.resize((size_t)T * kNB);
      hist = hist_fb.data();
    }
    std::memset(hist, 0, (size_t)T * kNB * sizeof(uint32_t));
    const size_t chunk = (total + T - 1) / T;
#pragma omp parallel num_threads(T)
    {
#ifdef _OPENMP
      const int tid = omp_get_thread_num();
#else
      const int tid = 0;
#endif
      uint32_t* h = hist + (size_t)tid * kNB;
      const size_t lo = std::min(chunk * tid, total);
      const size_t hi = std::min(lo + chunk, total);
      for (size_t i = lo; i < hi; ++i)
        ++h[arena[i].hash >> kBucketShift];
    }
    // global bucket offsets + per-thread write cursors (sequential scan
    // over 16M x T counters, bandwidth-bound, ~fractions of a second)
    uint32_t acc = 0;
    for (size_t b = 0; b < kNB; ++b) {
      bucket_start[b] = acc;
      for (int t = 0; t < T; ++t) {
        uint32_t c = hist[(size_t)t * kNB + b];
        hist[(size_t)t * kNB + b] = acc;  // becomes thread t's cursor
        acc += c;
      }
    }
    bucket_start[kNB] = acc;
#pragma omp parallel num_threads(T)
    {
#ifdef _OPENMP
      const int tid = omp_get_thread_num();
#else
      const int tid = 0;
#endif
      uint32_t* cur = hist + (size_t)tid * kNB;
      const size_t lo = std::min(chunk * tid, total);
      const size_t hi = std::min(lo + chunk, total);
      for (size_t i = lo; i < hi; ++i)
        index[cur[arena[i].hash >> kBucketShift]++] = arena[i];
    }
  }
  auto index_less = [](const IndexEntry& a, const IndexEntry& b) {
    if (a.hash != b.hash) return a.hash < b.hash;
    if (a.rs != b.rs) return a.rs < b.rs;
    return a.pos < b.pos;
  };
#pragma omp parallel for schedule(dynamic, 4096) num_threads(threads)
  for (size_t b = 0; b < kNB; ++b)
    std::sort(index + bucket_start[b], index + bucket_start[b + 1],
              index_less);
  lap("index-radix-sort");
  // equal-hash range of h among index[s0, s1), or empty if over occ_cap
  auto hash_range = [&](uint64_t h) -> std::pair<uint32_t, uint32_t> {
    const uint32_t b = (uint32_t)(h >> kBucketShift);
    const IndexEntry* lo = index + bucket_start[b];
    const IndexEntry* hi = index + bucket_start[b + 1];
    const IndexEntry* s = std::lower_bound(
        lo, hi, h, [](const IndexEntry& e, uint64_t x) { return e.hash < x; });
    const IndexEntry* e = s;
    while (e < hi && e->hash == h && (int)(e - s) <= occ_cap) ++e;
    if ((int)(e - s) > occ_cap) return {0, 0};  // over-frequent hash: drop
    return {(uint32_t)(s - index), (uint32_t)(e - index)};
  };

  struct Match {
    int32_t other;
    uint8_t orient;
    int32_t diff;
    int32_t pos;  // minimizer position in read a (overlap verification)
  };

  BuilderResult res;
  res.contained.assign(n_reads, 0);
  const bool need_ident = identity > 0.0;
  const bool need_trim = trim_min_cov > 0;
  const int T2 = std::max(threads, 1);
  std::vector<std::vector<Candidate>> per_thread_cands(T2);
  std::vector<std::vector<PileIv>> per_thread_piles(T2);

#pragma omp parallel num_threads(threads)
  {
#ifdef _OPENMP
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    std::vector<Match> matches;
    std::vector<int32_t> cpos;  // in-cluster positions (verification scratch)
    std::vector<int32_t> avalid;  // a's indexable minimizer positions (sorted)
#pragma omp for schedule(dynamic, 8)
    for (int a = 0; a < n_reads; ++a) {
      matches.clear();
      avalid.clear();
      for (size_t mi = offsets[a]; mi < offsets[a + 1]; ++mi) {
        const IndexEntry& m = arena[mi];
        auto [rs_lo, rs_hi] = hash_range(m.hash);
        // arena is in scan order, so positions arrive sorted; hashes over
        // occ_cap (empty range) are excluded from the identity denominator
        if (need_ident && rs_hi > rs_lo) avalid.push_back(m.pos);
        for (uint32_t s = rs_lo; s < rs_hi; ++s) {
          const IndexEntry& o = index[s];
          const int32_t oread = o.read();
          if (oread <= a) continue;  // each unordered pair handled once
          uint8_t orient = m.strand() ^ o.strand();
          int32_t diff = orient == 0
                             ? m.pos - o.pos
                             : m.pos - (int32_t)(lens[oread] - k - o.pos);
          matches.push_back({oread, orient, diff, m.pos});
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
          // strongest offset cluster (max votes within a 2*tol window over
          // the sorted diffs), not the global median: tandem repeats and
          // (later) noisy reads produce multi-modal vote distributions
          // whose median can land between clusters and fail support.
          size_t best_i = s, best_j = s;
          for (size_t i = s, j = s; i < e; ++i) {
            if (j < i) j = i;
            while (j < e && (int64_t)matches[j].diff - (int64_t)matches[i].diff
                                <= 2 * (int64_t)offset_tol)
              ++j;
            if (j - i > best_j - best_i) { best_i = i; best_j = j; }
          }
          int64_t t = matches[best_i + (best_j - best_i) / 2].diff;
          const int64_t la = lens[a], lb = lens[b];
          // overlap verification: in-cluster matched positions must span
          // the claimed overlap window [max(0,t), min(la, t+lb)) in read-a
          // coordinates — ends reached and no internal gap over max_gap.
          // Interspersed-repeat interiors vote consistent offsets between
          // distant loci; unverified, those cross-locus edges form
          // exactly-summing phantom paths that make transitive reduction
          // delete the TRUE local edges (see data/builder.py docstring).
          cpos.clear();
          for (size_t i = s; i < e; ++i)
            if (std::llabs((int64_t)matches[i].diff - t) <= offset_tol)
              cpos.push_back(matches[i].pos);
          const int support = (int)cpos.size();
          if (support >= min_matches) {
            std::sort(cpos.begin(), cpos.end());
            const int64_t wa_lo = std::max<int64_t>(0, t);
            const int64_t wa_hi = std::min<int64_t>(la, t + lb);
            bool spanned = (int64_t)cpos.front() <= wa_lo + max_gap &&
                           (int64_t)cpos.back() + k >= wa_hi - max_gap;
            for (size_t i = 1; spanned && i < cpos.size(); ++i)
              if ((int64_t)cpos[i] - (int64_t)cpos[i - 1] > max_gap)
                spanned = false;
            if (spanned) {
              const int64_t ovl_w = wa_hi - wa_lo;
              float sim;
              bool pass = true;
              if (need_ident) {
                // k-mer identity estimate: the fraction of a's indexable
                // minimizers in the overlap window with an offset-
                // consistent match in b is ~ I^k for pairwise alignment
                // identity I (k-mer survival), so I_est = frac^(1/k).
                // Mirrors data/builder.py find_overlaps; the role of
                // Raven's --identity (graph_dataset.py:120).
                const int denom = (int)(std::upper_bound(avalid.begin(),
                                                         avalid.end(),
                                                         (int32_t)(wa_hi - 1)) -
                                        std::lower_bound(avalid.begin(),
                                                         avalid.end(),
                                                         (int32_t)wa_lo));
                int matched = 0;
                for (size_t i = 0; i < cpos.size(); ++i)
                  if (i == 0 || cpos[i] != cpos[i - 1]) ++matched;
                const double frac =
                    std::min(1.0, (double)matched / std::max(denom, 1));
                const double est = std::pow(frac, 1.0 / k);
                pass = est >= identity;
                sim = (float)est;
              } else {
                sim = (float)std::min(
                    1.0, support / std::max(1.0, 2.0 * (double)ovl_w / (w + 1)));
              }
              if (pass) {
                if (need_trim) {
                  per_thread_piles[tid].push_back(
                      {a, (int32_t)wa_lo, (int32_t)wa_hi});
                  int64_t wb_lo = std::max<int64_t>(0, -t);
                  int64_t wb_hi = std::min<int64_t>(lb, la - t);
                  if (orient == 1) {
                    int64_t tmp = wb_lo;
                    wb_lo = lb - wb_hi;
                    wb_hi = lb - tmp;
                  }
                  per_thread_piles[tid].push_back(
                      {b, (int32_t)wb_lo, (int32_t)wb_hi});
                }
                per_thread_cands[tid].push_back({a, b, orient, t, sim});
              }
            }
          }
        }
        s = e;
      }
    }
  }
  lap("matching");

  // deterministic candidate order (one candidate per (pair, orient))
  std::vector<Candidate> cands;
  {
    size_t n_c = 0;
    for (auto& v : per_thread_cands) n_c += v.size();
    cands.reserve(n_c);
    for (auto& v : per_thread_cands) {
      cands.insert(cands.end(), v.begin(), v.end());
      v.clear();
      v.shrink_to_fit();
    }
    std::sort(cands.begin(), cands.end(),
              [](const Candidate& x, const Candidate& y) {
                if (x.a != y.a) return x.a < y.a;
                if (x.b != y.b) return x.b < y.b;
                return x.orient < y.orient;
              });
  }

  // pile trims (Raven's pile-o-gram; no-op full-read trims when disabled)
  res.trims.assign(n_reads, {0, 0});
  if (need_trim) {
    std::vector<PileIv> ivs;
    size_t n_iv = 0;
    for (auto& v : per_thread_piles) n_iv += v.size();
    ivs.reserve(n_iv);
    for (auto& v : per_thread_piles) {
      ivs.insert(ivs.end(), v.begin(), v.end());
      v.clear();
      v.shrink_to_fit();
    }
    pile_trims(ivs, lens, trim_min_cov, min_overlap, threads, res.trims);
    lap("pile-trims");
  } else {
    for (int r = 0; r < n_reads; ++r)
      res.trims[r] = {0, (int32_t)lens[r]};
  }
  for (int r = 0; r < n_reads; ++r)
    if (res.trims[r].first < 0) res.contained[r] = 1;  // dropped by trim

  // classification in trimmed coordinates (data/builder.py pass 2):
  // serial over the deterministic candidate order, so overlaps come out
  // with strand mirrors adjacent in a reproducible sequence
  for (const Candidate& c : cands) {
    const auto& [ta0, ta1] = res.trims[c.a];
    const auto& [tb0, tb1] = res.trims[c.b];
    if (ta0 < 0 || tb0 < 0) continue;
    const int64_t lb = lens[c.b];
    // oriented-b trim window (reverse complement flips intervals)
    const int64_t ob0 = c.orient == 0 ? tb0 : lb - tb1;
    const int64_t ob1 = c.orient == 0 ? tb1 : lb - tb0;
    const int64_t t2 = (c.t + ob0) - ta0;
    const int64_t la2 = ta1 - ta0, lb2 = ob1 - ob0;
    const int64_t ovl = std::min(la2, t2 + lb2) - std::max<int64_t>(0, t2);
    if (ovl <= 0) continue;
    if (t2 >= 0) {
      if (t2 + lb2 <= la2) {
        res.contained[c.b] = 1;
      } else if (ovl >= min_overlap) {
        int64_t u = 2 * (int64_t)c.a, v = 2 * (int64_t)c.b + c.orient;
        res.overlaps.push_back({u, v, t2, ovl, c.sim});
        res.overlaps.push_back({v ^ 1, u ^ 1, lb2 - ovl, ovl, c.sim});
      }
    } else {
      const int64_t t3 = -t2;
      if (t3 + la2 <= lb2) {
        res.contained[c.a] = 1;
      } else if (ovl >= min_overlap) {
        int64_t u = 2 * (int64_t)c.b + c.orient, v = 2 * (int64_t)c.a;
        res.overlaps.push_back({u, v, t3, ovl, c.sim});
        res.overlaps.push_back({v ^ 1, u ^ 1, la2 - ovl, ovl, c.sim});
      }
    }
  }
  // Deterministic output: which thread produced an overlap depends on the
  // dynamic schedule, so the concatenation order above varies run to run.
  // A total-order sort makes the emitted graph (edge ids, transitive-
  // reduction tie-breaks) identical across runs and thread counts. The
  // sort key is the strand-mirror pair's canonical member (the lexico-
  // graphically smaller of {(u,v), (v^1,u^1)}) so each overlap stays
  // ADJACENT to its mirror — transitive_reduction symmetrizes over
  // adjacent (2k, 2k+1) pairs. Distinct pairs never share a canonical
  // key (one overlap per oriented read pair; u/2 != v/2 rules out
  // self-mirrors), so the order is total.
  auto pair_key = [](const Overlap& o) {
    int64_t mu = o.v ^ 1, mv = o.u ^ 1;  // the mirror's (u, v)
    bool canon = (o.u != mu) ? (o.u < mu) : (o.v <= mv);
    return std::tuple<int64_t, int64_t, int>(
        canon ? o.u : mu, canon ? o.v : mv, canon ? 0 : 1);
  };
  std::sort(res.overlaps.begin(), res.overlaps.end(),
            [&](const Overlap& x, const Overlap& y) {
              return pair_key(x) < pair_key(y);
            });
  return res;
}

// Myers transitive reduction with fuzz (same as the Python spec).
// Parallel: the adjacency is read-only and each overlap's keep/drop
// decision is independent; a flag array + sequential collect keeps the
// output order (and thus the emitted graph) deterministic.
//
// Decisions are symmetrized over strand-mirror pairs (drop the pair when
// EITHER orientation is explained, as Raven marks an edge and its pair
// together): Myers' mid-node order is start-order on one strand but
// END-order on the mirror, which differ for variable-length reads — an
// asymmetric drop would break the u->v => v^1->u^1 invariant the oracle
// and decoder rely on. find_overlaps pushes each overlap and its mirror
// adjacently (and the containment filter keeps/drops both), so pair k is
// indices (2k, 2k+1).
static OverlapVec transitive_reduction(
    const OverlapVec& overlaps, int64_t fuzz, int threads) {
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
  std::vector<char> drop(overlaps.size(), 0);
#pragma omp parallel for schedule(dynamic, 256) num_threads(std::max(threads, 1))
  for (size_t i = 0; i < overlaps.size(); ++i) {
    const Overlap& o = overlaps[i];
    bool reduced = false;
    auto au = adj.find(o.u);
    for (const Overlap* mid : au->second) {
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
    drop[i] = reduced;
  }
  OverlapVec keep;
  keep.reserve(overlaps.size());
  for (size_t i = 0; i + 1 < overlaps.size(); i += 2) {
    const Overlap& o = overlaps[i];
    const Overlap& m = overlaps[i + 1];
    if (o.u != (m.v ^ 1) || o.v != (m.u ^ 1)) {
      std::fprintf(stderr, "[builder] mirror pairs not adjacent at %zu\n", i);
      std::abort();
    }
    if (!drop[i] && !drop[i + 1]) {
      keep.push_back(o);
      keep.push_back(m);
    }
  }
  return keep;
}

static int emit_graph(const std::vector<FastaRecord>& records,
                      const OverlapVec& overlaps_in,
                      const std::vector<char>& contained,
                      const std::vector<std::pair<int32_t, int32_t>>& trims,
                      const std::string& csv_path) {
  auto trim_of = [&](size_t r) -> std::pair<int64_t, int64_t> {
    if (r < trims.size() && trims[r].first >= 0 &&
        !(trims[r].first == 0 && trims[r].second == 0))
      return {trims[r].first, trims[r].second};
    return {0, (int64_t)records[r].seq.size()};
  };
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
    // the GFA carries the TRIMMED sequence — the reference parser reads
    // sequences from the GFA because "they are already trimmed"
    // (graph_parser.py:123)
    auto [t0, t1] = trim_of(r);
    std::string seq = records[r].seq.substr((size_t)t0, (size_t)(t1 - t0));
    std::fprintf(gfa, "S\t%s\t%s\tLN:i:%zu\tRC:i:1\n", rid.c_str(),
                 seq.c_str(), seq.size());
  }
  std::fclose(gfa);

  auto node_field = [&](int64_t node, std::string& out) {
    int64_t g = node / 2;
    auto [t0, t1] = trim_of(used_reads[g]);
    char buf[64];
    std::snprintf(buf, sizeof(buf), "%lld [%lld] LN:i:%lld", (long long)node,
                  (long long)g, (long long)(t1 - t0));
    out = buf;
  };

  std::FILE* csv = std::fopen(csv_path.c_str(), "w");
  if (!csv) return 2;
  std::string fu, fv;
  for (size_t g = 0; g < used_reads.size(); ++g) {
    node_field(2 * (int64_t)g, fu);
    node_field(2 * (int64_t)g + 1, fv);
    // trimmed node rows carry the "t0 t1" payload the parser applies to
    // the simulator headers' genome coordinates (graph_parser.py:241-250)
    auto [t0, t1] = trim_of(used_reads[g]);
    if (t0 == 0 && t1 == (int64_t)records[used_reads[g]].seq.size())
      std::fprintf(csv, "%s,%s,0,-\n", fu.c_str(), fv.c_str());
    else
      std::fprintf(csv, "%s,%s,0,%lld %lld\n", fu.c_str(), fv.c_str(),
                   (long long)t0, (long long)t1);
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
                                      int min_overlap, int trim_min_cov) {
  // identity <= 0 disables the k-mer identity gate (error-free legacy
  // behavior, bit-identical output); trim_min_cov <= 0 disables pile
  // trimming. Both on = the noisy-read front end (Raven's role on real
  // HiFi reads, graph_dataset.py:118-122).
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
                               /*occ_cap=*/256, /*max_gap=*/1000,
                               std::max(threads, 1), identity, trim_min_cov);
  // Remove contained reads BEFORE transitive reduction (Raven's order):
  // reducing first can delete an edge as "explained" by a path through a
  // read that containment-removal then deletes, leaving spurious dead
  // ends where the genome is perfectly covered. Also ~25x less reduction
  // work at 30x coverage (most reads are contained).
  {
    gn::OverlapVec filtered;
    filtered.reserve(res.overlaps.size());
    for (auto& o : res.overlaps)
      if (!res.contained[o.u / 2] && !res.contained[o.v / 2])
        filtered.push_back(o);
    res.overlaps.swap(filtered);
  }
  auto reduced = gn::transitive_reduction(res.overlaps, /*fuzz=*/500,
                                          std::max(threads, 1));
  return gn::emit_graph(records, reduced, res.contained, res.trims, csv_path);
}
