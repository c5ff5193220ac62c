"""Minimizer-based read-to-reference mapper.

The reference pipeline delegates all alignment discovery to external tools
(DALIGNER / minimap; `demo/*/run.sh`, `pipeline_consensus.py:41-64` runs
HPC.daligner to map raw reads onto the draft).  This module provides a
built-in equivalent so the framework is standalone: (w,k)-minimizer seeding
(numpy rolling hash), per-(target, strand, diagonal-band) chaining, and
trace-point emission by interpolating the chained anchors every tspace bases
— producing OverlapStore records (A = target/contig, B = read) that the
consensus stage consumes exactly like DALIGNER `.las` input.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from hinge_tpu.data.overlaps import INT, OverlapStore, ReadStore, revcomp_codes


def _kmer_hash(codes: np.ndarray, k: int) -> np.ndarray:
    """2-bit packed k-mers with an invertible mixer (positions 0..n-k)."""
    n = len(codes)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    v = np.zeros(n - k + 1, dtype=np.uint64)
    for i in range(k):
        v = (v << np.uint64(2)) | codes[i : n - k + 1 + i].astype(np.uint64)
    # 64-bit finalizer (splitmix-style) for uniformity
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def minimizers(codes: np.ndarray, k: int = 15, w: int = 10) -> Tuple[np.ndarray, np.ndarray]:
    """(positions, hashes) of window minimizers."""
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


@dataclasses.dataclass
class MapperIndex:
    k: int
    w: int
    table: Dict[int, np.ndarray]  # hash -> packed (tid << 40 | pos)
    t_len: np.ndarray


def build_index(targets: List[np.ndarray], k: int = 15, w: int = 10) -> MapperIndex:
    hashes = []
    packed = []
    for tid, t in enumerate(targets):
        pos, hs = minimizers(t, k, w)
        hashes.append(hs)
        packed.append((np.uint64(tid) << np.uint64(40)) | pos.astype(np.uint64))
    allh = np.concatenate(hashes) if hashes else np.zeros(0, np.uint64)
    allp = np.concatenate(packed) if packed else np.zeros(0, np.uint64)
    order = np.argsort(allh, kind="stable")
    allh, allp = allh[order], allp[order]
    # bucketize
    table: Dict[int, np.ndarray] = {}
    if len(allh):
        starts = np.nonzero(np.concatenate([[True], allh[1:] != allh[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(allh)]])
        for s, e in zip(starts, ends):
            if e - s <= 64:  # drop ultra-repetitive seeds
                table[int(allh[s])] = allp[s:e]
    return MapperIndex(
        k=k, w=w, table=table,
        t_len=np.array([len(t) for t in targets], dtype=np.int64),
    )


def _chain_hits(qpos: np.ndarray, tpos: np.ndarray, qlen: int, tlen: int, bw: int = 500):
    """Best diagonal band by hit count; returns span or None."""
    diag = tpos - qpos
    band = diag // bw
    vals, counts = np.unique(band, return_counts=True)
    # merge adjacent bands
    best_n = 0
    best = None
    for v in vals:
        m = (band == v) | (band == v + 1)
        n = int(m.sum())
        if n > best_n:
            best_n = n
            best = m
    if best is None or best_n < 4:
        return None
    q = qpos[best]
    t = tpos[best]
    o = np.argsort(q, kind="stable")
    q, t = q[o], t[o]
    # enforce monotone t (longest non-decreasing subsequence approximation:
    # greedy filter)
    keep = np.ones(len(t), bool)
    last = -1
    for i in range(len(t)):
        if t[i] >= last:
            last = t[i]
        else:
            keep[i] = False
    q, t = q[keep], t[keep]
    if len(q) < 4:
        return None
    return q, t


def map_read(
    index: MapperIndex,
    read: np.ndarray,
    min_span: int = 1000,
    tspace: int = 100,
):
    """Map one read against the index. Yields per-hit dicts."""
    out = []
    for strand in (0, 1):
        codes = read if strand == 0 else revcomp_codes(read)
        qpos, qh = minimizers(codes, index.k, index.w)
        if len(qh) == 0:
            continue
        # gather target hits
        hits_q: List[np.ndarray] = []
        hits_p: List[np.ndarray] = []
        for i in range(len(qh)):
            bucket = index.table.get(int(qh[i]))
            if bucket is not None:
                hits_q.append(np.full(len(bucket), qpos[i], dtype=np.int64))
                hits_p.append(bucket)
        if not hits_q:
            continue
        hq = np.concatenate(hits_q)
        hp = np.concatenate(hits_p)
        tids = (hp >> np.uint64(40)).astype(np.int64)
        tpos = (hp & np.uint64((1 << 40) - 1)).astype(np.int64)
        for tid in np.unique(tids):
            m = tids == tid
            chained = _chain_hits(hq[m], tpos[m], len(codes), int(index.t_len[tid]))
            if chained is None:
                continue
            q, t = chained
            q0, q1 = int(q[0]), int(q[-1]) + index.k
            t0, t1 = int(t[0]), int(t[-1]) + index.k
            if q1 - q0 < min_span or t1 - t0 < min_span:
                continue
            out.append(
                dict(tid=int(tid), strand=strand, q0=q0, q1=q1, t0=t0, t1=t1,
                     anchors_q=q, anchors_t=t, qlen=len(codes))
            )
    return out


def map_reads_to_targets(
    targets: List[np.ndarray],
    rs: ReadStore,
    k: int = 15,
    w: int = 10,
    min_span: int = 1000,
    tspace: int = 100,
) -> OverlapStore:
    """Produce contig-vs-read overlap records: A = contig (target), B = read.

    Coordinates follow the DALIGNER/getOverlap convention: A coords on the
    contig, B coords forward-strand on the read; trace-point displacements
    interpolated from the chained anchors every tspace bases of A.
    """
    index = build_index(targets, k, w)
    cols = {key: [] for key in "a_id b_id a_len b_len a_start a_end b_start b_end rc diffs tlen".split()}
    trace_chunks: List[np.ndarray] = []
    for rid in range(rs.n_reads):
        read = rs.get_bases(rid)
        for h in map_read(index, read, min_span, tspace):
            tid, strand = h["tid"], h["strand"]
            alen = int(index.t_len[tid])
            blen = len(read)
            a0, a1 = h["t0"], h["t1"]
            # q coords are on the (possibly rc'd) read; convert to fwd strand
            if strand == 0:
                b0, b1 = h["q0"], h["q1"]
            else:
                b0, b1 = blen - h["q1"], blen - h["q0"]
            # interpolated b positions at A lattice points (match frame)
            bounds = [a0]
            nb = a0
            while True:
                nb = (nb // tspace + 1) * tspace
                if nb >= a1:
                    break
                bounds.append(nb)
            bounds.append(a1)
            ba = np.interp(bounds, h["anchors_t"], h["anchors_q"])
            ba[0], ba[-1] = h["q0"], h["q1"]
            disp = np.diff(np.round(ba).astype(np.int64))
            disp = np.clip(disp, 0, None).astype(np.uint16)
            tr = np.zeros(2 * len(disp), dtype=np.uint16)
            tr[1::2] = disp
            # fix telescoping: adjust last disp so sum == q span
            span = h["q1"] - h["q0"]
            delta = span - int(disp.sum())
            if len(disp) and 0 <= int(disp[-1]) + delta < 65535:
                tr[-1] = int(disp[-1]) + delta
            cols["a_id"].append(tid)
            cols["b_id"].append(rid)
            cols["a_len"].append(alen)
            cols["b_len"].append(blen)
            cols["a_start"].append(a0)
            cols["a_end"].append(a1)
            cols["b_start"].append(b0)
            cols["b_end"].append(b1)
            cols["rc"].append(strand)
            cols["diffs"].append(0)
            cols["tlen"].append(2 * len(disp))
            trace_chunks.append(tr)
    trace = np.concatenate(trace_chunks) if trace_chunks else np.zeros(0, np.uint16)
    return OverlapStore.from_arrays(
        tspace=tspace, trace=trace,
        **{kk: np.asarray(v, dtype=np.int64) for kk, v in cols.items()},
    ).sort_by_a()
