"""Per-(A,B)-pair candidate selection and batched ProcessAlignment.

Reference flow (`maximal.cpp:65-134` ProcessAlignment, `:769-847` top-2
selection; reused verbatim by `hinging.cpp:78-147,528-597`): group overlaps
by (a_id, b_id), sort each group by descending summed match length
(compare_overlap), take the top one or two, then trim + classify each.

Vectorized: one lexsort over (pair key, -match length) ranks every overlap
within its group in a single pass; ProcessAlignment becomes the batched
trim/classify kernels over just the selected rows.

Tie-breaking: std::sort is unstable on equal match lengths (SURVEY.md §7
"hard parts"); we pin ties to input (.las) order for determinism.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from hinge_tpu.data.overlaps import OverlapStore
from hinge_tpu.ops import classify as CL


def top_k_per_pair(ov: OverlapStore, k: int = 2) -> np.ndarray:
    """Row indices of the top-k overlaps per (a_id, b_id) pair, ordered by
    (a_id asc, first-occurrence of b in las order, rank)."""
    n = ov.n
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    key = ov.a_id.astype(np.int64) * (int(ov.b_id.max()) + 1) + ov.b_id
    mlen = ov.match_len().astype(np.int64)
    order = np.lexsort((np.arange(n), -mlen, key))
    sk = key[order]
    first = np.ones(n, dtype=bool)
    first[1:] = sk[1:] != sk[:-1]
    grp_id = np.cumsum(first) - 1
    grp_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    rank = np.arange(n) - grp_start
    # group emission order: reference iterates an unordered_map (not
    # reproducible); we pin groups to first-occurrence (.las) order
    n_grp = int(grp_id[-1]) + 1
    min_las = np.full(n_grp, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(min_las, grp_id, order)
    keep_mask = rank < k
    out = np.lexsort((rank[keep_mask], min_las[grp_id[keep_mask]]))
    return order[keep_mask][out]


@dataclasses.dataclass
class ProcessedAlignments:
    """Batched ProcessAlignment outputs for selected overlap rows."""

    rows: np.ndarray  # indices into the source OverlapStore
    eff_a_match_start: np.ndarray
    eff_a_match_end: np.ndarray
    eff_b_match_start: np.ndarray
    eff_b_match_end: np.ndarray
    match_type: np.ndarray  # int32 MatchType codes
    active: np.ndarray  # bool
    weight: np.ndarray  # int32
    length: np.ndarray  # int32
    # effective read ranges (mask values) gathered per candidate, kept for
    # the layout stage's edge printing
    _ears: np.ndarray = None
    _eare: np.ndarray = None
    _ebrs: np.ndarray = None
    _ebre: np.ndarray = None


def process_alignments(
    ov: OverlapStore,
    rows: np.ndarray,
    eff_read_start: np.ndarray,  # int32 [n_reads] from .mas
    eff_read_end: np.ndarray,
    aln_threshold: int,
    theta: int,
    theta2: int,
    trim: bool,
) -> ProcessedAlignments:
    """Batched ProcessAlignment (maximal.cpp:65-134)."""
    sub = ov.take(rows)
    ears = eff_read_start[sub.a_id].astype(np.int32)
    eare = eff_read_end[sub.a_id].astype(np.int32)
    ebrs = eff_read_start[sub.b_id].astype(np.int32)
    ebre = eff_read_end[sub.b_id].astype(np.int32)

    if trim:
        tw = CL.build_trace_walk(sub)
        seg_id, k_local, _ = CL.make_point_index(tw.npairs)
        eams, eame, ebms, ebme, act = (
            np.asarray(x)
            for x in CL.trim_overlaps(
                jnp.asarray(sub.a_start), jnp.asarray(sub.a_end),
                jnp.asarray(sub.b_start), jnp.asarray(sub.b_end), jnp.asarray(sub.rc),
                jnp.asarray(ears), jnp.asarray(eare), jnp.asarray(ebrs), jnp.asarray(ebre),
                jnp.asarray(tw.npairs), jnp.asarray(tw.pair_off),
                jnp.asarray(tw.cum), jnp.asarray(seg_id), jnp.asarray(k_local),
                tspace=ov.tspace,
            )
        )
    else:
        eams, eame = sub.a_start.copy(), sub.a_end.copy()
        ebms, ebme = sub.b_start.copy(), sub.b_end.copy()
        act = np.ones(len(rows), dtype=bool)

    too_short = ((ebme - ebms) < aln_threshold) | ((eame - eams) < aln_threshold)
    active = act & ~too_short
    mtype = np.asarray(
        CL.add_types_asymmetric(
            jnp.asarray(eams), jnp.asarray(eame), jnp.asarray(ebms), jnp.asarray(ebme),
            jnp.asarray(ears), jnp.asarray(eare), jnp.asarray(ebrs), jnp.asarray(ebre),
            jnp.asarray(sub.rc), theta, theta2,
        )
    )
    mtype = np.where(active, mtype, CL.NOT_ACTIVE).astype(np.int32)
    weight = (eame - eams) + (ebme - ebms)
    length = (sub.a_end - sub.a_start) + (sub.b_end - sub.b_start)
    return ProcessedAlignments(
        rows=rows,
        eff_a_match_start=eams.astype(np.int32),
        eff_a_match_end=eame.astype(np.int32),
        eff_b_match_start=ebms.astype(np.int32),
        eff_b_match_end=ebme.astype(np.int32),
        match_type=mtype,
        active=active,
        weight=weight.astype(np.int32),
        length=length.astype(np.int32),
        _ears=ears,
        _eare=eare,
        _ebrs=ebrs,
        _ebre=ebre,
    )
