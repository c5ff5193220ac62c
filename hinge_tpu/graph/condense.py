"""Graph condensation for visualization / N50 (`hinge condense`).

Reference: `scripts/condense_graph.py` — in-degree-0 trimming iterations
followed by simple-path merging; and
`scripts/condense_graph_create_gfa_compute_n50.py:16-70` for overlap-aware
length accounting + N50.
"""

from __future__ import annotations

from typing import List, Optional

import networkx as nx


def _merge_path(g: nx.DiGraph, in_node, node, out_node):
    node_id = g.graph["aval"]
    g.graph["aval"] += 1
    g.add_node(
        str(node_id),
        count=g.nodes[in_node]["count"] + g.nodes[node]["count"] + g.nodes[out_node]["count"],
        read=g.nodes[in_node]["read"] + "_" + g.nodes[node]["read"] + "_" + g.nodes[out_node]["read"],
    )
    for e in list(g.in_edges(in_node)):
        g.add_edge(e[0], str(node_id))
    for e in list(g.out_edges(out_node)):
        g.add_edge(str(node_id), e[1])
    g.remove_node(in_node)
    g.remove_node(node)
    g.remove_node(out_node)


def merge_simple_path(g: nx.DiGraph):
    for node in list(g.nodes()):
        if not g.has_node(node):
            continue
        if g.in_degree(node) == 1 and g.out_degree(node) == 1:
            in_node = list(g.in_edges(node))[0][0]
            out_node = list(g.out_edges(node))[0][1]
            if g.out_degree(in_node) == 1 and g.in_degree(out_node) == 1:
                if in_node != node and out_node != node and in_node != out_node:
                    _merge_path(g, in_node, node, out_node)


def condense_graph(G: nx.DiGraph, n_trim_iter: int = 5, n_merge_iter: int = 5) -> nx.DiGraph:
    """condense_graph.py:run — trim in-degree-0 nodes, merge simple paths."""
    g = G.copy()
    for node in g.nodes():
        g.nodes[node]["count"] = 1
        g.nodes[node]["read"] = str(node)
    for _ in range(n_trim_iter):
        for node in list(g.nodes()):
            if g.has_node(node) and g.in_degree(node) == 0:
                g.remove_node(node)
    g.graph["aval"] = 1000000000
    for _ in range(n_merge_iter):
        merge_simple_path(g)
    return g


def compute_n50(lengths: List[int], genome_size: Optional[int] = None) -> int:
    """N50 (compute_n50_from_draft.py:comp_n50:8-27)."""
    if not lengths:
        return 0
    total = genome_size if genome_size else sum(lengths)
    acc = 0
    for L in sorted(lengths, reverse=True):
        acc += L
        if acc >= total / 2:
            return L
    return 0
