"""Minimizer-based read-to-reference mapper — fully vectorized.

The reference pipeline delegates alignment discovery to external tools
(DALIGNER / minimap; `demo/*/run.sh`, `pipeline_consensus.py:41-64` runs
HPC.daligner to map raw reads onto the draft).  This module provides a
built-in equivalent so the framework is standalone.

Pipeline (no per-hit Python):
  1. (w,k)-minimizer extraction per sequence (numpy rolling hash),
  2. query->index join as one `searchsorted` against the sorted index hash
     array (buckets > 64 entries dropped as repetitive),
  3. chaining = diagonal-band histogram per (read, strand, target) group via
     one lexsort + segment counting; best adjacent band pair wins,
  4. spans from segment min/max over the banded hits; trace-point
     displacements interpolated from the anchors every tspace bases.

Output: OverlapStore records (A = target/contig, B = read) with the
DALIGNER/getOverlap coordinate convention, consumable by the consensus
stage exactly like `.las` input.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from hinge_tpu.data.overlaps import INT, OverlapStore, ReadStore, revcomp_codes


def _kmer_hash(codes: np.ndarray, k: int) -> np.ndarray:
    n = len(codes)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    v = np.zeros(n - k + 1, dtype=np.uint64)
    for i in range(k):
        v = (v << np.uint64(2)) | codes[i : n - k + 1 + i].astype(np.uint64)
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def minimizers(codes: np.ndarray, k: int = 15, w: int = 10) -> Tuple[np.ndarray, np.ndarray]:
    """(positions, hashes) of window minimizers. Uses the native C core when
    available (bit-identical hash), numpy otherwise."""
    native = _native_minimizers(codes, k, w)
    if native is not None:
        return native
    h = _kmer_hash(codes, k)
    n = len(h)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    if n <= w:
        p = int(np.argmin(h))
        return np.array([p]), h[[p]]
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(h, w)
    idx = np.argmin(win, axis=1) + np.arange(len(win))
    keep = np.unique(idx)
    return keep, h[keep]


def _native_minimizers(codes: np.ndarray, k: int, w: int):
    import ctypes

    from hinge_tpu.native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "minimizers"):
        return None
    n = len(codes)
    if n < k:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    cap = n - k + 1
    pos = np.zeros(cap, dtype=np.int64)
    hsh = np.zeros(cap, dtype=np.uint64)
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    cnt = lib.minimizers(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(k), ctypes.c_int32(w),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hsh.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if cnt < 0:
        return None
    return pos[:cnt], hsh[:cnt]


@dataclasses.dataclass
class MapperIndex:
    k: int
    w: int
    hashes: np.ndarray  # sorted uint64
    packed: np.ndarray  # uint64 (tid << 40 | pos), bucket-aligned with hashes
    t_len: np.ndarray


def build_index(targets: List[np.ndarray], k: int = 15, w: int = 10,
                max_bucket: int = 64) -> MapperIndex:
    hs, ps = [], []
    for tid, t in enumerate(targets):
        pos, h = minimizers(t, k, w)
        hs.append(h)
        ps.append((np.uint64(tid) << np.uint64(40)) | pos.astype(np.uint64))
    allh = np.concatenate(hs) if hs else np.zeros(0, np.uint64)
    allp = np.concatenate(ps) if ps else np.zeros(0, np.uint64)
    order = np.argsort(allh, kind="stable")
    allh, allp = allh[order], allp[order]
    if len(allh):
        # drop repetitive buckets
        uniq, inv, counts = np.unique(allh, return_inverse=True, return_counts=True)
        keep = counts[inv] <= max_bucket
        allh, allp = allh[keep], allp[keep]
    return MapperIndex(
        k=k, w=w, hashes=allh, packed=allp,
        t_len=np.array([len(t) for t in targets], dtype=np.int64),
    )


def map_reads_to_targets(
    targets: List[np.ndarray],
    rs: ReadStore,
    k: int = 15,
    w: int = 10,
    min_span: int = 1000,
    min_hits: int = 4,
    band_width: int = 500,
    tspace: int = 100,
) -> OverlapStore:
    index = build_index(targets, k, w)
    n_targets = len(targets)

    # ---- 1. all query minimizers ----
    q_hash: List[np.ndarray] = []
    q_pos: List[np.ndarray] = []
    q_rid: List[np.ndarray] = []
    q_str: List[np.ndarray] = []
    read_codes = []
    for rid in range(rs.n_reads):
        read = rs.get_bases(rid)
        read_codes.append(read)
        for strand in (0, 1):
            codes = read if strand == 0 else revcomp_codes(read)
            pos, h = minimizers(codes, k, w)
            q_hash.append(h)
            q_pos.append(pos)
            q_rid.append(np.full(len(h), rid, dtype=np.int64))
            q_str.append(np.full(len(h), strand, dtype=np.int64))
    if not q_hash:
        return OverlapStore.from_arrays(tspace=tspace, a_id=np.zeros(0, INT), b_id=np.zeros(0, INT),
                                        a_len=np.zeros(0, INT), b_len=np.zeros(0, INT),
                                        a_start=np.zeros(0, INT), a_end=np.zeros(0, INT),
                                        b_start=np.zeros(0, INT), b_end=np.zeros(0, INT),
                                        rc=np.zeros(0, INT))
    qh = np.concatenate(q_hash)
    qp = np.concatenate(q_pos)
    qr = np.concatenate(q_rid)
    qs = np.concatenate(q_str)

    # ---- 2. join against the sorted index ----
    lo = np.searchsorted(index.hashes, qh, side="left")
    hi = np.searchsorted(index.hashes, qh, side="right")
    cnt = hi - lo
    tot = int(cnt.sum())
    if tot == 0:
        return _empty(tspace)
    # flat bucket indices: repeat(lo) + intra-bucket arange
    rep = np.repeat(np.arange(len(qh)), cnt)
    base = np.repeat(lo, cnt)
    intra = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    packed = index.packed[base + intra]
    h_tid = (packed >> np.uint64(40)).astype(np.int64)
    h_tpos = (packed & np.uint64((1 << 40) - 1)).astype(np.int64)
    h_qpos = qp[rep]
    h_rid = qr[rep]
    h_str = qs[rep]

    # ---- 3. diagonal-band histogram per (read, strand, target) ----
    group = (h_rid * 2 + h_str) * n_targets + h_tid
    diag = h_tpos - h_qpos  # can be negative
    band = (diag + (1 << 30)) // band_width
    order = np.lexsort((band, group))
    g_s, b_s = group[order], band[order]
    gb_new = np.ones(tot, dtype=bool)
    gb_new[1:] = (g_s[1:] != g_s[:-1]) | (b_s[1:] != b_s[:-1])
    gb_start = np.nonzero(gb_new)[0]
    gb_count = np.diff(np.append(gb_start, tot))
    gb_group = g_s[gb_start]
    gb_band = b_s[gb_start]
    # adjacent-band merge: count(b) + count(b+1) when same group
    nxt_same = np.zeros(len(gb_start), dtype=bool)
    nxt_same[:-1] = (gb_group[1:] == gb_group[:-1]) & (gb_band[1:] == gb_band[:-1] + 1)
    pair_count = gb_count.copy()
    pair_count[:-1] += np.where(nxt_same[:-1], gb_count[1:], 0)
    # best band pair per group
    grp_new = np.ones(len(gb_start), dtype=bool)
    grp_new[1:] = gb_group[1:] != gb_group[:-1]
    grp_idx = np.cumsum(grp_new) - 1
    n_grp = int(grp_idx[-1]) + 1
    best_count = np.zeros(n_grp, dtype=np.int64)
    np.maximum.at(best_count, grp_idx, pair_count)
    # first gb achieving the best count per group
    is_best = pair_count == best_count[grp_idx]
    first_best = np.full(n_grp, 1 << 60, dtype=np.int64)
    np.minimum.at(first_best, grp_idx[is_best], np.nonzero(is_best)[0].astype(np.int64))

    keep_groups = best_count >= min_hits
    cols = {key: [] for key in "a_id b_id a_len b_len a_start a_end b_start b_end rc diffs tlen".split()}
    trace_chunks: List[np.ndarray] = []

    for g in np.nonzero(keep_groups)[0]:
        gb = int(first_best[g])
        grp = int(gb_group[gb])
        b0 = int(gb_band[gb])
        # hits of this group in bands {b0, b0+1}
        s = gb_start[gb]
        e = s + gb_count[gb]
        if gb + 1 < len(gb_start) and nxt_same[gb]:
            e = gb_start[gb + 1] + gb_count[gb + 1]
        idxs = order[s:e]
        tq = h_qpos[idxs]
        tt = h_tpos[idxs]
        o2 = np.argsort(tq, kind="stable")
        tq, tt = tq[o2], tt[o2]
        # enforce monotone t (greedy)
        keep = np.maximum.accumulate(tt) == tt
        tq, tt = tq[keep], tt[keep]
        if len(tq) < min_hits:
            continue
        rid = grp // (2 * n_targets)
        strand = (grp // n_targets) % 2
        tid = grp % n_targets
        blen = len(read_codes[rid])
        alen = int(index.t_len[tid])
        q0, q1 = int(tq[0]), int(tq[-1]) + k
        t0, t1 = int(tt[0]), int(tt[-1]) + k
        if q1 - q0 < min_span or t1 - t0 < min_span:
            continue
        if strand == 0:
            b_start, b_end = q0, q1
        else:
            b_start, b_end = blen - q1, blen - q0
        # trace displacements from anchor interpolation over A positions
        bounds = [t0]
        nb = t0
        while True:
            nb = (nb // tspace + 1) * tspace
            if nb >= t1:
                break
            bounds.append(nb)
        bounds.append(t1)
        ba = np.interp(bounds, tt, tq)
        ba[0], ba[-1] = q0, q1
        disp = np.diff(np.round(ba).astype(np.int64))
        disp = np.clip(disp, 0, 65534).astype(np.int64)
        span = q1 - q0
        delta = span - int(disp.sum())
        if len(disp) and 0 <= int(disp[-1]) + delta < 65535:
            disp[-1] += delta
        tr = np.zeros(2 * len(disp), dtype=np.uint16)
        tr[1::2] = disp
        cols["a_id"].append(tid)
        cols["b_id"].append(rid)
        cols["a_len"].append(alen)
        cols["b_len"].append(blen)
        cols["a_start"].append(t0)
        cols["a_end"].append(t1)
        cols["b_start"].append(b_start)
        cols["b_end"].append(b_end)
        cols["rc"].append(strand)
        cols["diffs"].append(0)
        cols["tlen"].append(2 * len(disp))
        trace_chunks.append(tr)

    trace = np.concatenate(trace_chunks) if trace_chunks else np.zeros(0, np.uint16)
    if not cols["a_id"]:
        return _empty(tspace)
    return OverlapStore.from_arrays(
        tspace=tspace, trace=trace,
        **{kk: np.asarray(v, dtype=np.int64) for kk, v in cols.items()},
    ).sort_by_a()


def _empty(tspace):
    z = np.zeros(0, INT)
    return OverlapStore.from_arrays(
        tspace=tspace, a_id=z, b_id=z, a_len=z, b_len=z, a_start=z, a_end=z,
        b_start=z, b_end=z, rc=z,
    )



def overlap_reads(
    rs: ReadStore,
    k: int = 15,
    w: int = 8,
    min_span: int = 1000,
    min_hits: int = 4,
    band_width: int = 500,
    tspace: int = 100,
) -> OverlapStore:
    """All-vs-all read overlapping: the read set mapped against itself.

    Replaces the reference's external DALIGNER run (L0 in SURVEY.md §1) for
    fasta-only pipelines. Like a merged `.las`, every overlap appears as an
    exactly coordinate-mirrored (i,j)/(j,i) record pair (the downstream
    draft stage matches records by summed length, draft.cpp:163-177, so the
    two directions must agree byte-for-byte); trivial self matches (same
    read, forward strand, near-zero diagonal) are dropped.
    """
    targets = [rs.get_bases(i) for i in range(rs.n_reads)]
    ov = map_reads_to_targets(
        targets, rs, k=k, w=w, min_span=min_span, min_hits=min_hits,
        band_width=band_width, tspace=tspace,
    )
    diag = ov.a_start.astype(np.int64) - ov.b_start.astype(np.int64)
    trivial = (ov.a_id == ov.b_id) & (ov.rc == 0) & (np.abs(diag) < band_width)
    ov = ov.take(np.nonzero(~trivial)[0])

    # keep one canonical record per unordered pair (largest summed length,
    # then lowest ids) and synthesize its exact mirror
    mlen = ov.match_len()
    lo = np.minimum(ov.a_id, ov.b_id)
    hi = np.maximum(ov.a_id, ov.b_id)
    span_key = np.minimum(ov.a_start, ov.b_start)  # separate repeat intervals
    order = np.lexsort((ov.a_id, -mlen, span_key // (4 * band_width), lo, hi))
    seen = set()
    keep_rows = []
    for r in order:
        key = (int(lo[r]), int(hi[r]), int(ov.rc[r]),
               (int(span_key[r]) // (4 * band_width)))
        if key in seen:
            continue
        seen.add(key)
        keep_rows.append(int(r))
    keep_rows.sort()
    base = ov.take(np.asarray(keep_rows, dtype=np.int64))

    cols = {kk: [] for kk in "a_id b_id a_len b_len a_start a_end b_start b_end rc diffs tlen".split()}
    trace_chunks: List[np.ndarray] = []
    for r in range(base.n):
        rec, tr = _record_cols(base, r)
        for kk, v in rec.items():
            cols[kk].append(v)
        trace_chunks.append(tr)
        rec, tr = _mirror_record(base, r, tspace)
        for kk, v in rec.items():
            cols[kk].append(v)
        trace_chunks.append(tr)
    trace = np.concatenate(trace_chunks) if trace_chunks else np.zeros(0, np.uint16)
    return OverlapStore.from_arrays(
        tspace=tspace, trace=trace,
        **{kk: np.asarray(v, dtype=np.int64) for kk, v in cols.items()},
    ).sort_by_a()


def _record_cols(ov: OverlapStore, r: int):
    tr = ov.trace[ov.trace_off[r] : ov.trace_off[r] + ov.tlen[r]].copy()
    rec = dict(
        a_id=int(ov.a_id[r]), b_id=int(ov.b_id[r]),
        a_len=int(ov.a_len[r]), b_len=int(ov.b_len[r]),
        a_start=int(ov.a_start[r]), a_end=int(ov.a_end[r]),
        b_start=int(ov.b_start[r]), b_end=int(ov.b_end[r]),
        rc=int(ov.rc[r]), diffs=int(ov.diffs[r]), tlen=int(ov.tlen[r]),
    )
    return rec, tr


def _lattice(ov: OverlapStore, r: int, tspace: int):
    """(A_pts, W_pts) lattice coordinates of record r (W = B fwd strand)."""
    a0, a1 = int(ov.a_start[r]), int(ov.a_end[r])
    rc = int(ov.rc[r])
    pairs = ov.trace_pairs(r)
    A = [a0]
    nb = a0
    while True:
        nb = (nb // tspace + 1) * tspace
        if nb >= a1:
            break
        A.append(nb)
    A.append(a1)
    sign = -1 if rc else 1
    w0 = int(ov.b_end[r]) if rc else int(ov.b_start[r])
    W = [w0]
    for j in range(len(A) - 2):
        W.append(W[-1] + sign * int(pairs[j][1]))
    W.append(int(ov.b_start[r]) if rc else int(ov.b_end[r]))
    return np.asarray(A, np.int64), np.asarray(W, np.int64)


def _mirror_record(ov: OverlapStore, r: int, tspace: int):
    """The exact (j,i) twin of record r: swapped roles, B-grid trace points
    interpolated along the SAME lattice, so summed lengths agree exactly."""
    A, W = _lattice(ov, r, tspace)
    rc = int(ov.rc[r])
    b0, b1 = int(ov.b_start[r]), int(ov.b_end[r])
    Bnds = [b0]
    nb = b0
    while True:
        nb = (nb // tspace + 1) * tspace
        if nb >= b1:
            break
        Bnds.append(nb)
    Bnds.append(b1)
    Bnds = np.asarray(Bnds, np.int64)
    if rc == 0:
        a_at = np.interp(Bnds, W, A)
    else:
        a_at = np.interp(Bnds, W[::-1], A[::-1])
    a_at = np.round(a_at).astype(np.int64)
    disp = np.abs(np.diff(a_at)).astype(np.int64)
    # telescoping correction so displacements sum to the A span exactly
    delta = (int(ov.a_end[r]) - int(ov.a_start[r])) - int(disp.sum())
    if len(disp):
        disp[-1] = max(0, disp[-1] + delta)
    tr = np.zeros(2 * len(disp), dtype=np.uint16)
    tr[1::2] = np.clip(disp, 0, 65534)
    rec = dict(
        a_id=int(ov.b_id[r]), b_id=int(ov.a_id[r]),
        a_len=int(ov.b_len[r]), b_len=int(ov.a_len[r]),
        a_start=b0, a_end=b1,
        b_start=int(ov.a_start[r]), b_end=int(ov.a_end[r]),
        rc=rc, diffs=int(ov.diffs[r]), tlen=2 * len(disp),
    )
    return rec, tr
