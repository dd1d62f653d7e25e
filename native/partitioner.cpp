// Balanced edge-cut graph partitioner — the role METIS plays for the
// reference (dgl.dataloading.ClusterGCNSampler, train.py:291-293), also
// used to place graph shards on devices with small halo cuts.
//
// Algorithm: undirected BFS locality ordering + contiguous chunking,
// followed by boundary label-propagation refinement (moves a node to the
// neighboring part holding the majority of its neighbors when the balance
// constraint allows). Assembly graphs are near-linear overlap chains, so
// BFS order alone is already close to optimal; refinement trims the
// remaining cut.
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" int gn_partition_graph(const int* src, const int* dst,
                                  long long n_edges, long long n_nodes,
                                  int n_parts, int* out_parts) {
  if (n_parts <= 1 || n_nodes <= 0) {
    std::memset(out_parts, 0, sizeof(int) * (size_t)std::max(n_nodes, 0LL));
    return 0;
  }
  const int64_t n = n_nodes, e = n_edges;

  // undirected CSR
  std::vector<int64_t> deg(n + 1, 0);
  for (int64_t i = 0; i < e; ++i) {
    ++deg[src[i] + 1];
    ++deg[dst[i] + 1];
  }
  for (int64_t i = 0; i < n; ++i) deg[i + 1] += deg[i];
  std::vector<int32_t> adj(2 * e);
  std::vector<int64_t> fill(deg.begin(), deg.end() - 1);
  for (int64_t i = 0; i < e; ++i) {
    adj[fill[src[i]]++] = dst[i];
    adj[fill[dst[i]]++] = src[i];
  }

  // BFS locality order over all components
  std::vector<int32_t> order;
  order.reserve(n);
  std::vector<char> visited(n, 0);
  std::queue<int32_t> q;
  for (int64_t root = 0; root < n; ++root) {
    if (visited[root]) continue;
    visited[root] = 1;
    q.push((int32_t)root);
    while (!q.empty()) {
      int32_t x = q.front();
      q.pop();
      order.push_back(x);
      for (int64_t j = deg[x]; j < deg[x + 1]; ++j) {
        int32_t y = adj[j];
        if (!visited[y]) {
          visited[y] = 1;
          q.push(y);
        }
      }
    }
  }

  // contiguous chunks
  const int64_t chunk = (n + n_parts - 1) / n_parts;
  std::vector<int64_t> size(n_parts, 0);
  for (int64_t i = 0; i < n; ++i) {
    int p = (int)std::min<int64_t>(i / chunk, n_parts - 1);
    out_parts[order[i]] = p;
    ++size[p];
  }

  // label-propagation refinement on boundary nodes
  const int64_t max_size = chunk + chunk / 8 + 1;
  std::vector<int32_t> count(n_parts, 0);
  for (int iter = 0; iter < 3; ++iter) {
    int64_t moved = 0;
    for (int64_t v = 0; v < n; ++v) {
      const int pv = out_parts[v];
      int best = pv;
      int best_cnt = 0, own_cnt = 0;
      // count neighbor parts (sparse reset)
      std::vector<int32_t> touched;
      for (int64_t j = deg[v]; j < deg[v + 1]; ++j) {
        int p = out_parts[adj[j]];
        if (count[p]++ == 0) touched.push_back(p);
      }
      for (int p : touched) {
        if (p == pv)
          own_cnt = count[p];
        else if (count[p] > best_cnt)
          best_cnt = count[p], best = p;
        count[p] = 0;
      }
      if (best != pv && best_cnt > own_cnt && size[best] < max_size &&
          size[pv] > 1) {
        out_parts[v] = best;
        --size[pv];
        ++size[best];
        ++moved;
      }
    }
    if (moved == 0) break;
  }
  return 0;
}
