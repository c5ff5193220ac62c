"""Exact DALIGNER trace-window alignment (recoverAlignment parity).

The reference recovers full alignments from trace points by running a
private O(nd) wavefront aligner inside every trace-point window
(LAInterface::computeTracePTS -> iter_np, LAInterface.cpp:3410/3152) and
then emitting padded alignment strings (getAlignmentTags,
LAInterface.cpp:3709-3915).  Byte parity of X.draft.fasta/X.consensus.fasta
requires reproducing that specific optimal path — its wave move preference
and "uppermost" traceback normalization — not just any minimal-edit path.

Context: the wave's diagonal slides can read one byte BEFORE a window
(frontier diagonals enter the slide at j=-1) and the traceback one byte past
its end.  The reference aligns inside Load_Subread buffers spanning
[abpos-10, aepos+10) with 4-sentinels on both sides (DB.c:1449-1459,
recoverAlignment LAInterface.cpp:4183-4205), so this module builds the same
padded context per alignment and aligns windows at offsets into it.

Provides:
  - align_overlap_rows(...): exact full rows for one overlap (all windows).
  - iter_np_script / script_to_rows: pure-Python transcription (oracle +
    fallback when the native kernel is unavailable).

Row convention: base codes 0..3, gap code 4 (the reference uses 7 -> '-').
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

GAP = np.uint8(4)
BORDER = 10  # recoverAlignment's subread border (LAInterface.cpp:4149)
_OOB = 0x7F  # below-context reads: never equal (reference reads malloc junk)


def make_context(seq: np.ndarray, start: int, end: int) -> Tuple[np.ndarray, int, int]:
    """Load_Subread-equivalent context for a match span [start, end):
    bases [max(start-10,0), min(end+10,len)) framed by 4-sentinels.

    Returns (ctx bytes, index of position `start` in ctx, lowest represented
    position's ctx index == 1 ... i.e. (ctx, off0, amin) where ctx[off0]
    corresponds to seq[start] and ctx[0] is the sentinel at amin-1)."""
    amin = max(start - BORDER, 0)
    amax = min(end + BORDER, len(seq))
    ctx = np.empty(amax - amin + 2, dtype=np.uint8)
    ctx[0] = 4
    ctx[1:-1] = seq[amin:amax]
    ctx[-1] = 4
    return ctx, start - amin + 1, amin


def window_bounds(a_start: int, a_end: int, b_start: int, b_end: int,
                  trace_pairs: np.ndarray, tspace: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-window [bound_i, bound_i+1) coordinates along A and B
    (computeTracePTS' loop, LAInterface.cpp:3479-3502)."""
    interior = np.arange((a_start // tspace + 1) * tspace, a_end, tspace,
                         dtype=np.int64)
    a_bounds = np.concatenate([[a_start], interior, [a_end]])
    b_bounds = np.empty(len(a_bounds), dtype=np.int64)
    b_bounds[0] = b_start
    if len(a_bounds) > 2:
        b_bounds[1:-1] = b_start + np.cumsum(
            trace_pairs[: len(a_bounds) - 2, 1].astype(np.int64))
    b_bounds[-1] = b_end
    return a_bounds, b_bounds


def iter_np_script(ctx_a: np.ndarray, off_a: int, M: int,
                   ctx_b: np.ndarray, off_b: int, N: int) -> List[int]:
    """Pure-Python transcription of the wave (LAInterface.cpp:3152-3407),
    window-local: returns signed 1-based script entries (+p insertion in B
    at B position p; -p deletion at A position p)."""
    if M == 0 and N == 0:
        return []
    dele = M - N

    def A(x):
        xi = off_a + x
        return int(ctx_a[xi]) if xi >= 0 else _OOB

    def B(x):
        return int(ctx_b[off_b + x])

    koff = N + 2
    span = M + N + 6
    rows = M + N + 4
    PVF = np.zeros((rows, span), dtype=np.int64)
    PHF = np.zeros((rows, span), dtype=np.int64)

    def V(d):
        return PVF[d + 2]

    def H(d):
        return PHF[d + 2]

    if dele >= 0:
        low, hgh = 0, dele
    else:
        low, hgh = dele, 0

    F1 = V(-2)
    F0 = V(-1)
    for d in range(low - 1, hgh + 2):
        F1[d + koff] = F0[d + koff] = -2
    F0[0 + koff] = -1

    low += 1
    hgh -= 1

    D = 0
    while True:
        F2 = F1
        F1 = F0
        F0 = V(D)
        HF = H(D)

        if (D & 1) == 0:
            low -= 1
            hgh += 1
        F0[hgh + 1 + koff] = F0[low - 1 + koff] = -2

        def fs_move(k, i, aoff, am, ap, mdir, pdir):
            ac = int(F1[k + koff]) + 1
            if ac < am:
                if ap < am:
                    HF[k + koff] = mdir
                    j = am
                else:
                    HF[k + koff] = pdir
                    j = ap
            else:
                if ap < ac:
                    HF[k + koff] = 0
                    j = ac
                else:
                    HF[k + koff] = pdir
                    j = ap
            lim = N if N < i else i
            while j < lim and B(j) == A(aoff + j):
                j += 1
            F0[k + koff] = j
            return j

        j = -2
        aoff = hgh
        i = M - hgh
        for k in range(hgh, dele, -1):
            ap = j + 1
            am = int(F2[k - 1 + koff])
            j = fs_move(k, i, aoff, am, ap, -1, 4)
            aoff -= 1
            i += 1

        j = -2
        aoff = low
        i = M - low
        for k in range(low, dele):
            ap = int(F2[k + 1 + koff]) + 1
            am = j
            j = fs_move(k, i, aoff, am, ap, 2, 1)
            aoff += 1
            i -= 1

        ap = int(F0[dele + 1 + koff]) + 1
        am = j
        fs_move(dele, i, aoff, am, ap, 2, 4)

        if F0[dele + koff] >= N:
            break
        D += 1

    # uppermost traceback re-threading (LAInterface.cpp:3286-3351)
    H(0)[0 + koff] = 3

    c = N
    k = dele
    Dd = D
    e = int(H(Dd)[k + koff])
    H(Dd)[k + koff] = 3
    while e != 3:
        h = k + e
        if e > 1:
            h -= 3
        elif e == 0:
            Dd -= 1
        else:
            Dd -= 2
        if h < k:
            m = -k if k < 0 else 0
            if V(Dd)[h + koff] <= c:
                c = int(V(Dd)[h + koff]) - 1
            while c >= m and A(k + c) == B(c):
                c -= 1
            if e < 1:
                if c <= V(Dd + 2)[k + 1 + koff]:
                    e = 4
                    h = k + 1
                    Dd = Dd + 2
                elif c == V(Dd + 1)[k + koff]:
                    e = 0
                    h = k
                    Dd = Dd + 1
                else:
                    V(Dd)[h + koff] = c + 1
            else:
                m = Dd if k == dele else Dd - 2
                if c <= V(m)[k + 1 + koff]:
                    e = 4 if k == dele else 1
                    h = k + 1
                    Dd = m
                elif c == V(Dd - 1)[k + koff]:
                    e = 0
                    h = k
                    Dd = Dd - 1
                else:
                    V(Dd)[h + koff] = c + 1
        m = int(H(Dd)[h + koff])
        H(Dd)[h + koff] = e
        e = m
        k = h

    # forward walk emitting the script (LAInterface.cpp:3353-3374)
    script: List[int] = []
    k = Dd = 0
    e = int(H(Dd)[k + koff])
    while e != 3:
        h = k - e
        c = int(V(Dd)[k + koff])
        if e > 1:
            h += 3
        elif e == 0:
            Dd += 1
        else:
            Dd += 2
        if h > k:
            script.append(1 + c)
        elif h < k:
            script.append(-1 - (c + k))
        k = h
        e = int(H(Dd)[h + koff])
    return script


def script_to_rows(wa: np.ndarray, wb: np.ndarray,
                   script: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """getAlignmentTags' column emission (LAInterface.cpp:3829-3871) for one
    window-local script.  wa/wb are the window base slices."""
    M = len(wa)
    ra = np.empty(M + len(wb), dtype=np.uint8)
    rb = np.empty(M + len(wb), dtype=np.uint8)
    i = j = 1
    o = 0
    for p in script:
        if p < 0:
            p = -p
            while i != p:
                ra[o] = wa[i - 1]
                rb[o] = wb[j - 1]
                o += 1
                i += 1
                j += 1
            ra[o] = GAP
            rb[o] = wb[j - 1]
            o += 1
            j += 1
        else:
            while j != p:
                ra[o] = wa[i - 1]
                rb[o] = wb[j - 1]
                o += 1
                i += 1
                j += 1
            ra[o] = wa[i - 1]
            rb[o] = GAP
            o += 1
            i += 1
    while i <= M:
        ra[o] = wa[i - 1]
        rb[o] = wb[j - 1]
        o += 1
        i += 1
        j += 1
    return ra[:o].copy(), rb[:o].copy()


class _WindowBatch:
    """Accumulates windows (with their padded contexts) across many overlaps
    and aligns them in one native call."""

    def __init__(self):
        self.ctx_a: List[np.ndarray] = []
        self.ctx_b: List[np.ndarray] = []
        # per-RECORD numpy chunks (per-window python appends were a top
        # host cost at the 10^5-read scale), concatenated once in _flat
        self._a_ptr: List[np.ndarray] = []
        self._b_ptr: List[np.ndarray] = []
        self._a_len: List[np.ndarray] = []
        self._b_len: List[np.ndarray] = []
        self._a_avail: List[np.ndarray] = []
        self._b_avail: List[np.ndarray] = []
        self._owner: List[np.ndarray] = []
        self._abase = 0
        self._bbase = 0
        self._n = 0

    def __len__(self) -> int:
        return self._n

    @property
    def owner(self) -> np.ndarray:
        return (np.concatenate(self._owner)
                if self._owner else np.zeros(0, np.int64))

    def add_overlap(self, owner: int, a_seq: np.ndarray, b_frame: np.ndarray,
                    a_start: int, a_end: int, b_start: int, b_end: int,
                    trace_pairs: np.ndarray, tspace: int) -> None:
        ctx_a, off_a0, _ = make_context(a_seq, a_start, a_end)
        ctx_b, off_b0, _ = make_context(b_frame, b_start, b_end)
        ab, bb = window_bounds(a_start, a_end, b_start, b_end,
                               trace_pairs, tspace)
        self.ctx_a.append(ctx_a)
        self.ctx_b.append(ctx_b)
        ab = np.asarray(ab, dtype=np.int64)
        bb = np.asarray(bb, dtype=np.int64)
        pa = off_a0 + (ab[:-1] - a_start)
        pb = off_b0 + (bb[:-1] - b_start)
        self._a_ptr.append(self._abase + pa)
        self._b_ptr.append(self._bbase + pb)
        self._a_len.append(np.diff(ab))
        self._b_len.append(np.diff(bb))
        self._a_avail.append(pa)
        self._b_avail.append(pb)
        self._owner.append(np.full(len(ab) - 1, owner, dtype=np.int64))
        self._n += len(ab) - 1
        self._abase += len(ctx_a)
        self._bbase += len(ctx_b)

    def _flat(self):
        abuf = np.concatenate(self.ctx_a)
        bbuf = np.concatenate(self.ctx_b)
        return (
            abuf, bbuf,
            np.concatenate(self._a_ptr).astype(np.int64),
            np.concatenate(self._b_ptr).astype(np.int64),
            np.concatenate(self._a_len).astype(np.int32),
            np.concatenate(self._b_len).astype(np.int32),
            np.concatenate(self._a_avail).astype(np.int32),
            np.concatenate(self._b_avail).astype(np.int32),
        )

    def align(self) -> List[Tuple[np.ndarray, np.ndarray]]:
        n = self._n
        if n == 0:
            return []
        abuf, bbuf, a_ptr, b_ptr, a_len, b_len, a_avail, b_avail = self._flat()

        rows = _native_rows(abuf, bbuf, a_ptr, a_len, a_avail,
                            b_ptr, b_len, b_avail)
        if rows is None:
            rows = []
            for w in range(n):
                script = iter_np_script(abuf, int(a_ptr[w]), int(a_len[w]),
                                        bbuf, int(b_ptr[w]), int(b_len[w]))
                wa = abuf[a_ptr[w] : a_ptr[w] + a_len[w]]
                wb = bbuf[b_ptr[w] : b_ptr[w] + b_len[w]]
                rows.append(script_to_rows(wa, wb, script))
        return rows

    def align_flat(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All window rows as flat (flat_a, flat_b, win_len) in window order —
        no per-window array materialization (the per-window list in align()
        dominated the host profile at 10^5-read consensus scale)."""
        n = self._n
        z = np.zeros(0, np.uint8)
        if n == 0:
            return z, z, np.zeros(0, np.int64)
        abuf, bbuf, a_ptr, b_ptr, a_len, b_len, a_avail, b_avail = self._flat()
        raw = _native_rows_raw(abuf, bbuf, a_ptr, a_len, a_avail,
                               b_ptr, b_len, b_avail)
        if raw is None:
            rows = []
            for w in range(n):
                script = iter_np_script(abuf, int(a_ptr[w]), int(a_len[w]),
                                        bbuf, int(b_ptr[w]), int(b_len[w]))
                wa = abuf[a_ptr[w] : a_ptr[w] + a_len[w]]
                wb = bbuf[b_ptr[w] : b_ptr[w] + b_len[w]]
                rows.append(script_to_rows(wa, wb, script))
            flat_a = np.concatenate([ra for ra, _ in rows]) if rows else z
            flat_b = np.concatenate([rb for _, rb in rows]) if rows else z
            win_len = np.array([len(ra) for ra, _ in rows], np.int64)
            return flat_a, flat_b, win_len
        out_a, out_b, out_off, out_len = raw
        # compact the capacity-strided native buffers into dense flat rows
        win_len = out_len.astype(np.int64)
        tot = _native_compact(out_a, out_b, out_off, out_len)
        if tot is not None:
            return out_a[:tot], out_b[:tot], win_len
        # numpy fallback: one gather (out_len <= capacity per window)
        tot = int(win_len.sum())
        dst_off = np.zeros(n, np.int64)
        np.cumsum(win_len[:-1], out=dst_off[1:])
        within = np.arange(tot, dtype=np.int64) - np.repeat(dst_off, win_len)
        src = np.repeat(out_off, win_len) + within
        return out_a[src], out_b[src], win_len

    def diffs(self) -> np.ndarray:
        """Per-window mismatch-column counts of the exact alignments —
        computed natively WITHOUT materializing rows when possible."""
        n = self._n
        if n == 0:
            return np.zeros(0, np.int32)
        abuf, bbuf, a_ptr, b_ptr, a_len, b_len, a_avail, b_avail = self._flat()
        d = _native_diffs(abuf, bbuf, a_ptr, a_len, a_avail,
                          b_ptr, b_len, b_avail)
        if d is not None:
            return d
        rows = self.align()
        return np.array([int((ra != rb).sum()) for ra, rb in rows], np.int32)


def _native_rows(abuf, bbuf, a_ptr, a_len, a_avail, b_ptr, b_len, b_avail):
    raw = _native_rows_raw(abuf, bbuf, a_ptr, a_len, a_avail,
                           b_ptr, b_len, b_avail)
    if raw is None:
        return None
    out_a, out_b, out_off, out_len = raw
    return [
        (out_a[o : o + L].copy(), out_b[o : o + L].copy())
        for o, L in zip(out_off, out_len)
    ]


def _native_compact(out_a, out_b, out_off, out_len):
    """In-place dense compaction of capacity-strided row buffers (C memmove
    pass); returns the dense total or None when the native lib is missing."""
    from hinge_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "dalign_compact_rows"):
        return None
    import ctypes as c

    return int(lib.dalign_compact_rows(
        out_a.ctypes.data_as(c.POINTER(c.c_uint8)),
        out_b.ctypes.data_as(c.POINTER(c.c_uint8)),
        out_off.ctypes.data_as(c.POINTER(c.c_int64)),
        out_len.ctypes.data_as(c.POINTER(c.c_int32)),
        c.c_int64(len(out_len)),
    ))


def _native_rows_raw(abuf, bbuf, a_ptr, a_len, a_avail, b_ptr, b_len, b_avail):
    import os as _os

    from hinge_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "dalign_rows_batch"):
        return None
    import ctypes as c

    n = len(a_ptr)
    caps = a_len.astype(np.int64) + b_len
    out_off = np.zeros(n, dtype=np.int64)
    np.cumsum(caps[:-1], out=out_off[1:])
    total = int(caps.sum())
    out_a = np.empty(max(total, 1), dtype=np.uint8)
    out_b = np.empty(max(total, 1), dtype=np.uint8)
    out_len = np.zeros(n, dtype=np.int32)

    p8 = c.POINTER(c.c_uint8)
    p32 = c.POINTER(c.c_int32)
    p64 = c.POINTER(c.c_int64)
    if hasattr(lib, "dalign_rows_batch_mt"):
        rc = lib.dalign_rows_batch_mt(
            abuf.ctypes.data_as(p8), bbuf.ctypes.data_as(p8),
            a_ptr.ctypes.data_as(p64), a_len.ctypes.data_as(p32),
            a_avail.ctypes.data_as(p32),
            b_ptr.ctypes.data_as(p64), b_len.ctypes.data_as(p32),
            b_avail.ctypes.data_as(p32),
            c.c_int64(n),
            out_a.ctypes.data_as(p8), out_b.ctypes.data_as(p8),
            out_off.ctypes.data_as(p64), out_len.ctypes.data_as(p32),
            c.c_int32(_os.cpu_count() or 1),
        )
    else:
        rc = lib.dalign_rows_batch(
            abuf.ctypes.data_as(p8), bbuf.ctypes.data_as(p8),
            a_ptr.ctypes.data_as(p64), a_len.ctypes.data_as(p32),
            a_avail.ctypes.data_as(p32),
            b_ptr.ctypes.data_as(p64), b_len.ctypes.data_as(p32),
            b_avail.ctypes.data_as(p32),
            c.c_int(n),
            out_a.ctypes.data_as(p8), out_b.ctypes.data_as(p8),
            out_off.ctypes.data_as(p64), out_len.ctypes.data_as(p32),
        )
    if rc != 0:
        return None
    return out_a, out_b, out_off, out_len


def _native_diffs(abuf, bbuf, a_ptr, a_len, a_avail, b_ptr, b_len, b_avail):
    import os as _os

    from hinge_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "dalign_diffs_batch"):
        return None
    import ctypes as c

    n = len(a_ptr)
    out = np.zeros(n, dtype=np.int32)
    p8 = c.POINTER(c.c_uint8)
    p32 = c.POINTER(c.c_int32)
    p64 = c.POINTER(c.c_int64)
    rc = lib.dalign_diffs_batch(
        abuf.ctypes.data_as(p8), bbuf.ctypes.data_as(p8),
        a_ptr.ctypes.data_as(p64), a_len.ctypes.data_as(p32),
        a_avail.ctypes.data_as(p32),
        b_ptr.ctypes.data_as(p64), b_len.ctypes.data_as(p32),
        b_avail.ctypes.data_as(p32),
        c.c_int64(n), out.ctypes.data_as(p32),
        c.c_int32(_os.cpu_count() or 1),
    )
    if rc != 0:
        return None
    return out


def fill_window_diffs(ov, get_a_bases, get_b_bases) -> None:
    """Populate an OverlapStore's per-window trace diffs + record diffs from
    the EXACT window alignments, in place.

    DALIGNER consumers size their wave arrays from the recorded per-window
    diff counts (computeTracePTS, LAInterface.cpp:3444-3456: dmax = max
    points[2w]); a trace whose diffs understate the true edit count makes
    the reference binaries overflow those arrays and crash.  Our minimizer
    mapper interpolates trace b-displacements without aligning, so this pass
    fills the diffs the same way DALIGNER would: the edit count of the
    optimal window alignment (>= the wave's D by construction).
    """
    batch = _WindowBatch()
    for r in range(ov.n):
        a_seq = get_a_bases(int(ov.a_id[r]))
        b_seq = get_b_bases(int(ov.b_id[r]))
        blen = int(ov.b_len[r])
        if int(ov.rc[r]):
            from hinge_tpu.data.overlaps import revcomp_codes

            b_frame = revcomp_codes(b_seq)
            b0, b1 = blen - int(ov.b_end[r]), blen - int(ov.b_start[r])
        else:
            b_frame = b_seq
            b0, b1 = int(ov.b_start[r]), int(ov.b_end[r])
        batch.add_overlap(r, np.asarray(a_seq, np.uint8),
                          np.asarray(b_frame, np.uint8),
                          int(ov.a_start[r]), int(ov.a_end[r]), b0, b1,
                          ov.trace_pairs(r), int(ov.tspace))
    d = batch.diffs().astype(np.int64)  # no row materialization
    owner = np.asarray(batch.owner, dtype=np.int64)
    if len(owner) == 0:
        ov.diffs[:] = 0
        return
    # windows were appended per record in order: local slot = index - first
    first = np.zeros(ov.n + 1, dtype=np.int64)
    np.add.at(first, owner + 1, 1)
    np.cumsum(first, out=first)
    win_local = np.arange(len(owner), dtype=np.int64) - first[owner]
    ov.trace[ov.trace_off[owner] + 2 * win_local] = np.minimum(d, 65535)
    ov.diffs[:] = np.bincount(owner, weights=d, minlength=ov.n).astype(
        ov.diffs.dtype)


def align_overlap_rows_exact_flat(
    items: Sequence[Tuple],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact full alignment rows for many overlaps, flat: returns
    (flat_a, flat_b, item_len) where item i's rows occupy the flat slice
    [sum(item_len[:i]), sum(item_len[:i+1])).  Windows are appended per
    item in item order, so the flat window order IS item order.

    items: sequence of (a_seq, b_frame, a_start, a_end, b_start, b_end,
    trace_pairs, tspace) — same tuple shape as
    batch_align.align_overlap_rows_bulk."""
    batch = _WindowBatch()
    for idx, (a_seq, b_frame, a0, a1, b0, b1, tp, tspace) in enumerate(items):
        batch.add_overlap(idx, np.asarray(a_seq, np.uint8),
                          np.asarray(b_frame, np.uint8),
                          int(a0), int(a1), int(b0), int(b1), tp, int(tspace))
    flat_a, flat_b, win_len = batch.align_flat()
    owner = batch.owner
    item_len = np.zeros(len(items), np.int64)
    if len(owner):
        np.add.at(item_len, owner, win_len)
    return flat_a, flat_b, item_len


def align_overlap_rows_exact(
    items: Sequence[Tuple],
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Exact full alignment rows for many overlaps (the reference's
    recoverAlignment + getAlignmentTags, batched).  Returns per-item
    (row_a, row_b) VIEWS into one flat buffer — copy anything mutated."""
    flat_a, flat_b, item_len = align_overlap_rows_exact_flat(items)
    off = np.zeros(len(items) + 1, np.int64)
    np.cumsum(item_len, out=off[1:])
    return [
        (flat_a[off[i] : off[i + 1]], flat_b[off[i] : off[i + 1]])
        for i in range(len(items))
    ]
