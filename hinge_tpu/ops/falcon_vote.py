"""FALCON-style align-tag MSA consensus.

Reference: vendored `src/lib/falcon.c` (`get_align_tags`:69-130,
`get_cns_from_align_tags`:270-520) — the per-ladder consensus kernel of the
draft stage.  Semantics replicated:

* each alignment column becomes a tag (t_pos, delta, q_base) with a link to
  its predecessor tag,
* tags accumulate into per-(t_pos, delta, base) columns with per-link counts,
* a forward DP scores each column as max over links of
  (prev score + link_count - coverage[t_pos]/2),
* backtracking from the global best yields the consensus; bases at
  coverage <= min_cov are emitted lowercase (we return a mask instead).

Inputs are uint8 code rows (0..3 bases, 4 = gap) from hinge_tpu.ops.myers.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

GAP = 4


def get_align_tags(
    q_row: np.ndarray, t_row: np.ndarray, q_id: int, t_offset: int = 0
) -> np.ndarray:
    """Tag list for one aligned pair (falcon.c:69-130).

    Returns int32 array (L, 6): t_pos, delta, p_t_pos, p_delta, p_q_base,
    q_base (bases 0..4, 4 = gap; p_q_base 5 = '.' start sentinel)."""
    L = len(q_row)
    out = np.zeros((L, 6), dtype=np.int32)
    i = -1
    j = -1
    jj = 0
    p_j = -1
    p_jj = 0
    p_qb = 5
    n = 0
    for k in range(L):
        if q_row[k] != GAP:
            i += 1
            jj += 1
        if t_row[k] != GAP:
            j += 1
            jj = 0
        if j + t_offset >= 0 and jj < 255 and p_jj < 255:
            out[n] = (j + t_offset, jj, p_j + t_offset, p_jj, p_qb, q_row[k])
            p_j = j
            p_jj = jj
            p_qb = int(q_row[k])
            n += 1
    return out[:n]


def get_cns_from_align_tags(
    tag_seqs: List[np.ndarray], t_len: int, min_cov: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Consensus via the MSA link DP (falcon.c:270-520).

    Returns (consensus codes uint8, low_coverage bool mask per emitted base).
    """
    coverage = np.zeros(t_len, dtype=np.int64)
    # column store: (t_pos, delta, base) -> {"links": {(pt,pd,pb): count},
    #                                        "score": float, "best": (pt,pd,pb)}
    cols: Dict[Tuple[int, int, int], dict] = {}
    max_delta: Dict[int, int] = {}

    for tags in tag_seqs:
        t_pos = 0
        for row in tags:
            tp, delta, ptp, pdl, pqb, qb = (int(v) for v in row)
            if delta == 0:
                t_pos = tp
                if 0 <= t_pos < t_len:
                    coverage[t_pos] += 1
            if delta > max_delta.get(t_pos, 0):
                max_delta[t_pos] = delta
            base = qb if qb <= 4 else 4
            key = (t_pos, delta, base)
            col = cols.get(key)
            if col is None:
                col = {"links": {}, "score": -1.0, "best": None}
                cols[key] = col
            lk = (ptp, pdl, pqb if pqb <= 4 else 4)
            col["links"][lk] = col["links"].get(lk, 0) + 1

    g_best_score = -1.0
    g_best_key = None
    # iterate in (t_pos, delta, base) order like the reference's triple loop
    for key in sorted(cols.keys()):
        i = key[0]
        col = cols[key]
        best_score = -1.0
        best_link = None
        for (pi, pj, pb), cnt in col["links"].items():
            if pi == -1:
                score = cnt - coverage[i] * 0.5
            else:
                prev = cols.get((pi, pj, pb))
                prev_score = prev["score"] if prev is not None else 0.0
                score = prev_score + cnt - coverage[i] * 0.5
            if score > best_score:
                best_score = score
                best_link = (pi, pj, pb)
        col["score"] = best_score
        col["best"] = best_link
        if best_score > g_best_score:
            g_best_score = best_score
            g_best_key = key

    if g_best_key is None:
        return np.zeros(0, np.uint8), np.zeros(0, bool)

    # backtrack (falcon.c:442-500): walk from the global best, emitting each
    # column's base before stepping to its predecessor; the column linked
    # from -1 (the caller's prepended sentinel) is never emitted.
    seq: List[int] = []
    low: List[bool] = []
    key = g_best_key
    while True:
        i, _, bb = key
        col = cols[key]
        nxt = col["best"]
        if nxt is None or nxt[0] == -1 or len(seq) >= t_len * 2:
            break
        if bb != GAP:
            seq.append(bb)
            low.append(bool(coverage[i] <= min_cov))
        key = (nxt[0], nxt[1], nxt[2])
    seq.reverse()
    low.reverse()
    return np.array(seq, dtype=np.uint8), np.array(low, dtype=bool)
