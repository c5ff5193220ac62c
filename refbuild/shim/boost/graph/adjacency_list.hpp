// Minimal Boost.Graph shim for the parity harness — just the surface the
// reference binaries use: adjacency_list<vecS,vecS,undirectedS> constructed
// with a vertex count, add_edge(u,v,g), num_vertices(g)
// (see /root/reference/src/layout/hinging.cpp:40,1338,1420,1644).
#pragma once
#include <cstddef>
#include <utility>
#include <vector>

namespace boost {

struct vecS {};
struct undirectedS {};
struct directedS {};

template <typename OutEdgeListS = vecS, typename VertexListS = vecS,
          typename DirectedS = undirectedS>
struct adjacency_list {
    explicit adjacency_list(std::size_t n = 0) : n_vertices(n) {}
    std::size_t n_vertices;
    std::vector<std::pair<std::size_t, std::size_t>> edges;
};

template <typename O, typename V, typename D>
inline void add_edge(std::size_t u, std::size_t v, adjacency_list<O, V, D> &g) {
    if (u >= g.n_vertices) g.n_vertices = u + 1;
    if (v >= g.n_vertices) g.n_vertices = v + 1;
    g.edges.emplace_back(u, v);
}

template <typename O, typename V, typename D>
inline std::size_t num_vertices(const adjacency_list<O, V, D> &g) {
    return g.n_vertices;
}

} // namespace boost
