"""Small pipeline utilities mirroring the reference's scripts/ directory.

- `clip_ends`: drop graph edges touching reads mapped near chromosome ends
  (scripts/clip_ends.py — ground-truth file rows `read chr left right`,
  kill reads within CHR_THR of either chromosome end).
- `create_bandage_file`: edges file -> Bandage LastGraph-style NODE/ARC file
  (scripts/create_bandage_file.py).
"""

from __future__ import annotations

from typing import Set

CHR_THR = 20000


def clip_ends(ground_truth_path: str, edges_path: str, out_path: str | None = None,
              chr_thr: int = CHR_THR) -> int:
    """Filter an edges file, removing every line whose first two columns
    name a read mapping within `chr_thr` of a chromosome end
    (clip_ends.py:9-36). Returns the number of surviving lines."""
    out_path = out_path or edges_path + ".clipped"
    chr_lengths: dict = {}
    rows = []
    with open(ground_truth_path) as f:
        for line in f:
            m = list(map(int, line.strip().split()))
            rows.append(m)
            chr_lengths[m[1]] = max(chr_lengths.get(m[1], 0), max(m[2], m[3]))
    reads_to_kill: Set[int] = set()
    for m in rows:
        read_left, read_right = min(m[2], m[3]), max(m[2], m[3])
        if read_left < chr_thr:
            reads_to_kill.add(m[0])
        if read_right > chr_lengths[m[1]] - chr_thr:
            reads_to_kill.add(m[0])
    kept = 0
    with open(edges_path) as f, open(out_path, "w") as g:
        for line in f:
            cols = line.split()
            if int(cols[0]) in reads_to_kill or int(cols[1]) in reads_to_kill:
                continue
            g.write(line)
            kept += 1
    return kept


def create_bandage_file(edges_path: str, out_path: str) -> int:
    """Emit a Bandage-loadable LastGraph skeleton (NODE/ARC records with
    dummy sequence) from a two-column edges file
    (create_bandage_file.py:8-50). Returns the node count."""
    nodes: dict = {}
    arcs: dict = {}
    with open(edges_path) as f:
        for line in f:
            cols = line.split()
            if len(cols) < 2:
                continue
            node0, node1 = int(cols[0]), int(cols[1])
            nodes[node0] = 1
            nodes[node1] = 1
            arcs[(node0, node1) if node0 < node1 else (node1, node0)] = 1
    with open(out_path, "w") as fout:
        for node in nodes:
            fout.write("NODE " + str(node) + " 0 0 0 0 0\n")
            fout.write("AAA\n")
            fout.write("AAA\n")
        for arc in arcs:
            fout.write("ARC " + str(arc[0]) + " " + str(arc[1]) + " 0\n")
    return len(nodes)
