// Native host-side graph-compiler kernels.
//
// The reference computes virtual edges with networkx all-pairs shortest paths
// (graph.py:791-797) — the dominant host cost per DeepNets-1M sample. This
// C++ implementation runs one BFS per source over CSR adjacency, O(V*(V+E)),
// with flat arrays and no allocation in the inner loop. Exposed through a
// plain C ABI and loaded via ctypes (ghn3_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// All-pairs shortest path lengths of a DAG/digraph.
//   adj:  n*n int32 row-major; nonzero = edge i->j
//   out:  n*n int32; out[i*n+j] = dist(i,j) in [1, cutoff], 0 otherwise
//         (diagonal 0)
void apsp(const int32_t* adj, int32_t n, int32_t cutoff, int32_t* out) {
    // CSR build
    std::vector<int32_t> offs(n + 1, 0);
    for (int32_t i = 0; i < n; ++i)
        for (int32_t j = 0; j < n; ++j)
            if (adj[i * n + j] != 0) offs[i + 1]++;
    for (int32_t i = 0; i < n; ++i) offs[i + 1] += offs[i];
    std::vector<int32_t> cols(offs[n]);
    {
        std::vector<int32_t> cur(offs.begin(), offs.end() - 1);
        for (int32_t i = 0; i < n; ++i)
            for (int32_t j = 0; j < n; ++j)
                if (adj[i * n + j] != 0) cols[cur[i]++] = j;
    }

    std::memset(out, 0, sizeof(int32_t) * (size_t)n * (size_t)n);
    std::vector<int32_t> queue(n);
    std::vector<int32_t> dist(n);
    for (int32_t s = 0; s < n; ++s) {
        std::fill(dist.begin(), dist.end(), -1);
        int32_t head = 0, tail = 0;
        queue[tail++] = s;
        dist[s] = 0;
        int32_t* row = out + (size_t)s * n;
        while (head < tail) {
            int32_t u = queue[head++];
            int32_t du = dist[u];
            if (du >= cutoff) continue;
            for (int32_t k = offs[u]; k < offs[u + 1]; ++k) {
                int32_t v = cols[k];
                if (dist[v] < 0) {
                    dist[v] = du + 1;
                    row[v] = du + 1;
                    queue[tail++] = v;
                }
            }
        }
        row[s] = 0;
    }
}

// Virtual-edge augmentation in place: adj (binary-ish) -> shortest-path values.
void add_virtual_edges(int32_t* adj, int32_t n, int32_t cutoff, int32_t* scratch) {
    apsp(adj, n, cutoff, scratch);
    for (size_t i = 0; i < (size_t)n * n; ++i)
        if (adj[i] == 0 && scratch[i] > 0) adj[i] = scratch[i];
}

}  // extern "C"
