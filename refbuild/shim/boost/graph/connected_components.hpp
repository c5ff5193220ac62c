// connected_components shim: union-find + relabel so component ids are
// assigned in order of first appearance by vertex index — the same numbering
// Boost's DFS-based implementation produces (components discovered in vertex
// index order get increasing ids). hinging.cpp only uses per-component sizes
// (/root/reference/src/layout/hinging.cpp:1644-1675), but we match the ids
// anyway so any future diff of debug output stays clean.
#pragma once
#include <cstddef>
#include <numeric>
#include <vector>

#include "boost/graph/adjacency_list.hpp"

namespace boost {

namespace detail {
inline std::size_t uf_find(std::vector<std::size_t> &parent, std::size_t x) {
    while (parent[x] != x) {
        parent[x] = parent[parent[x]];
        x = parent[x];
    }
    return x;
}
} // namespace detail

template <typename O, typename V, typename D, typename ComponentIt>
int connected_components(const adjacency_list<O, V, D> &g, ComponentIt component) {
    const std::size_t n = g.n_vertices;
    std::vector<std::size_t> parent(n);
    std::iota(parent.begin(), parent.end(), std::size_t(0));
    for (const auto &e : g.edges) {
        std::size_t ru = detail::uf_find(parent, e.first);
        std::size_t rv = detail::uf_find(parent, e.second);
        if (ru != rv) parent[rv] = ru;
    }
    std::vector<int> label(n, -1);
    int next = 0;
    for (std::size_t v = 0; v < n; ++v) {
        std::size_t r = detail::uf_find(parent, v);
        if (label[r] < 0) label[r] = next++;
        component[v] = label[r];
    }
    return next;
}

} // namespace boost
