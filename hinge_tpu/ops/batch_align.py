"""Batched global alignment of fixed-width sequence windows.

The draft/consensus stages align one ~tspace-bp window per trace point —
millions of tiny independent alignments per genome.  The scalar Myers
aligner (hinge_tpu.ops.myers) does one window at a time in Python; this
module fills the DP matrices of a whole *batch* of windows as one XLA
computation:

    row recurrence  D[i,j] = min(D[i-1,j]+1, D[i,j-1]+1, D[i-1,j-1]+sub)

with the within-row left-to-right dependency resolved by the min-plus
prefix trick  D[i,j] = j + cummin_k<=j (E[i,k] - k)  where
E[i,j] = min(D[i-1,j]+1, D[i-1,j-1]+sub).  One lax.scan over rows,
vmapped over the batch, everything (8,128)-shaped for the VPU.

Traceback runs lock-step across the batch in numpy: all windows walk their
move matrices together, one vectorized step per iteration (<= 2W steps
total) — no per-window Python loops.

Windows are padded to W (default 128, fits tspace=100 + indel slack); the
DP is exact for the unpadded lengths because padded cells simply extend the
band and the traceback starts at (m, n).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GAP = 4
BIG = np.int32(1 << 20)


@functools.partial(jax.jit, static_argnames=("w",))
def _fill_batch(q: jnp.ndarray, t: jnp.ndarray, m: jnp.ndarray, n: jnp.ndarray, *, w: int):
    """DP cost matrices for a batch.

    q, t: uint8 [B, W]; m, n: int32 [B] true lengths.
    Returns D: int32 [B, W+1, W+1] (cost of aligning q[:i] with t[:j]).
    """
    B = q.shape[0]
    jj = jnp.arange(w + 1, dtype=jnp.int32)

    def row_step(prev_row, qi):
        # prev_row: [B, W+1] D[i-1, :]; qi: [B] query base of row i
        sub = jnp.where(t == qi[:, None], 0, 1).astype(jnp.int32)  # [B, W]
        diag = prev_row[:, :-1] + sub
        up = prev_row[:, 1:] + 1
        e = jnp.minimum(diag, up)  # E[i, j] for j = 1..W
        # D[i, 0] = i  (gap prefix) — fold into the prefix-min
        first = prev_row[:, :1] + 1  # = i
        e_full = jnp.concatenate([first, e], axis=1)  # [B, W+1]
        g = e_full - jj[None, :]
        gmin = jax.lax.associative_scan(jnp.minimum, g, axis=1)
        row = jnp.minimum(e_full, gmin + jj[None, :])
        return row, row.astype(jnp.int16)

    row0 = jnp.broadcast_to(jj[None, :], (B, w + 1)).astype(jnp.int32)
    _, rows = jax.lax.scan(row_step, row0, jnp.swapaxes(q, 0, 1).astype(jnp.int32))
    D = jnp.concatenate(
        [row0[:, None, :].astype(jnp.int16), jnp.swapaxes(rows, 0, 1)], axis=1
    )
    return D


@functools.partial(jax.jit, static_argnames=("w",))
def _fill_traceback(q: jnp.ndarray, t: jnp.ndarray, m: jnp.ndarray,
                    n: jnp.ndarray, *, w: int):
    """DP fill + lock-step traceback entirely on device.

    Returns (moves int8 [B, 2W] back-to-front: 0 diag / 1 up / 2 left,
    -1 once finished; cnt int32 [B]).  Only ~2W bytes per window leave the
    device instead of the (W+1)^2 int16 cost matrix."""
    B = q.shape[0]
    D = _fill_batch(q, t, m, n, w=w).astype(jnp.int32)  # [B, W+1, W+1]
    Dflat = D.reshape(B, (w + 1) * (w + 1))
    qi32 = q.astype(jnp.int32)
    ti32 = t.astype(jnp.int32)

    def at(i, j):
        return jnp.take_along_axis(
            Dflat, (i * (w + 1) + j)[:, None], axis=1
        )[:, 0]

    def step(state, _):
        i, j = state
        active = (i > 0) | (j > 0)
        im1 = jnp.maximum(i - 1, 0)
        jm1 = jnp.maximum(j - 1, 0)
        cur = at(i, j)
        qb = jnp.take_along_axis(qi32, im1[:, None], axis=1)[:, 0]
        tb = jnp.take_along_axis(ti32, jm1[:, None], axis=1)[:, 0]
        sub = jnp.where(qb == tb, 0, 1)
        diag_ok = (i > 0) & (j > 0) & (at(im1, jm1) + sub == cur)
        up_ok = (i > 0) & (at(im1, j) + 1 == cur)
        move = jnp.where(diag_ok, 0, jnp.where(up_ok, 1, 2))
        move = jnp.where(active, move, -1).astype(jnp.int8)
        i = jnp.where(active & (move != 2), i - 1, i)
        j = jnp.where(active & (move != 1), j - 1, j)
        return (i, j), move

    (_, _), moves = jax.lax.scan(
        step, (m.astype(jnp.int32), n.astype(jnp.int32)), None, length=2 * w
    )
    moves = jnp.swapaxes(moves, 0, 1)  # [B, 2W]
    cnt = jnp.sum(moves >= 0, axis=1).astype(jnp.int32)
    return moves, cnt


def align_batch(
    qs: Sequence[np.ndarray], ts: Sequence[np.ndarray], w: int = 128
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Globally align each (q, t) pair; returns [(q_row, t_row)] with gap
    code 4, consuming both sequences entirely (like myers.align_full)."""
    B = len(qs)
    if B == 0:
        return []
    # pad the batch to a power-of-two bucket so jit compiles once per bucket
    Bp = 1
    while Bp < B:
        Bp *= 2
    q = np.zeros((Bp, w), dtype=np.uint8)
    t = np.zeros((Bp, w), dtype=np.uint8)
    m = np.zeros(Bp, dtype=np.int32)
    n = np.zeros(Bp, dtype=np.int32)
    overflow = []
    for k in range(B):
        if len(qs[k]) > w or len(ts[k]) > w:
            overflow.append(k)
            continue
        m[k] = len(qs[k])
        n[k] = len(ts[k])
        q[k, : m[k]] = qs[k]
        t[k, : n[k]] = ts[k]

    mv_d, cnt_d = _fill_traceback(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(m), jnp.asarray(n), w=w
    )
    mv = np.asarray(mv_d)[:B]
    cnt = np.asarray(cnt_d)[:B]
    q, t, m, n = q[:B], t[:B], m[:B], n[:B]

    out: List[Tuple[np.ndarray, np.ndarray]] = []
    from hinge_tpu.ops.myers import align_full as _scalar_align_full

    overflow_set = set(overflow)
    for k in range(B):
        if k in overflow_set:
            out.append(_scalar_align_full(qs[k], ts[k]))
            continue
        seq = mv[k, : cnt[k]][::-1]
        L = len(seq)
        q_row = np.full(L, GAP, dtype=np.uint8)
        t_row = np.full(L, GAP, dtype=np.uint8)
        qpos = np.cumsum(seq != 2) - (seq != 2)
        tpos = np.cumsum(seq != 1) - (seq != 1)
        qc = seq != 2
        tc = seq != 1
        q_row[qc] = qs[k][qpos[qc]]
        t_row[tc] = ts[k][tpos[tc]]
        out.append((q_row, t_row))
    return out


def align_overlap_rows_bulk(
    items: Sequence[Tuple],
    w: int = 128,
    chunk: int = 1024,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Full alignment rows for MANY overlaps in one pass.

    items: sequence of (a_seq, b_frame, a_start, a_end, b_start_raw,
    b_end_raw, trace_pairs, tspace). All trace windows across all items are
    pooled into fixed-size align_batch calls (one jit dispatch per `chunk`
    windows instead of one per overlap), then reassembled per item.
    """
    qs: List[np.ndarray] = []
    ts: List[np.ndarray] = []
    owner: List[int] = []
    for idx, (a_seq, b_seq, a0, a1, b0, b1, tp, tspace) in enumerate(items):
        interior = np.arange((a0 // tspace + 1) * tspace, a1, tspace, dtype=np.int64)
        a_bounds = np.concatenate([[a0], interior, [a1]])
        b_bounds = np.empty(len(a_bounds), dtype=np.int64)
        b_bounds[0] = b0
        if len(a_bounds) > 2:
            b_bounds[1:-1] = b0 + np.cumsum(tp[: len(a_bounds) - 2, 1].astype(np.int64))
        b_bounds[-1] = b1
        for k in range(len(a_bounds) - 1):
            qs.append(a_seq[a_bounds[k] : a_bounds[k + 1]])
            ts.append(b_seq[b_bounds[k] : b_bounds[k + 1]])
            owner.append(idx)

    # identity short-circuit (clean-data windows are byte-equal), then the
    # batched DP on accelerators / scalar Myers on the CPU backend where the
    # O(ND) scalar path beats the O(W^2) fill for low-divergence windows
    rows: List[Tuple[np.ndarray, np.ndarray]] = [None] * len(qs)
    todo: List[int] = []
    for k in range(len(qs)):
        if len(qs[k]) == len(ts[k]) and np.array_equal(qs[k], ts[k]):
            rows[k] = (qs[k], ts[k])
        else:
            todo.append(k)
    if todo:
        import jax

        if jax.default_backend() == "cpu":
            from hinge_tpu.ops.myers import align_full_batch

            for k, r in zip(todo, align_full_batch([qs[k] for k in todo],
                                                   [ts[k] for k in todo])):
                rows[k] = r
        else:
            for base in range(0, len(todo), chunk):
                sel = todo[base : base + chunk]
                sub = align_batch([qs[k] for k in sel], [ts[k] for k in sel], w=w)
                for k, r in zip(sel, sub):
                    rows[k] = r

    out_a: List[List[np.ndarray]] = [[] for _ in items]
    out_b: List[List[np.ndarray]] = [[] for _ in items]
    for k, (qr, tr) in enumerate(rows):
        out_a[owner[k]].append(qr)
        out_b[owner[k]].append(tr)
    return [
        (np.concatenate(a) if a else np.zeros(0, np.uint8),
         np.concatenate(b) if b else np.zeros(0, np.uint8))
        for a, b in zip(out_a, out_b)
    ]


def align_with_trace_batch(
    a_seq: np.ndarray,
    b_seq: np.ndarray,
    a_start: int,
    a_end: int,
    b_start_raw: int,
    b_end_raw: int,
    trace_pairs: np.ndarray,
    tspace: int = 100,
    w: int = 128,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched drop-in for myers.align_with_trace: all windows of one
    overlap aligned in a single batch."""
    interior = np.arange((a_start // tspace + 1) * tspace, a_end, tspace, dtype=np.int64)
    a_bounds = np.concatenate([[a_start], interior, [a_end]])
    b_bounds = np.empty(len(a_bounds), dtype=np.int64)
    b_bounds[0] = b_start_raw
    if len(a_bounds) > 2:
        b_bounds[1:-1] = b_start_raw + np.cumsum(
            trace_pairs[: len(a_bounds) - 2, 1].astype(np.int64)
        )
    b_bounds[-1] = b_end_raw

    qs = [a_seq[a_bounds[k] : a_bounds[k + 1]] for k in range(len(a_bounds) - 1)]
    ts = [b_seq[b_bounds[k] : b_bounds[k + 1]] for k in range(len(b_bounds) - 1)]
    rows = align_batch(qs, ts, w=w)
    a_chunks = [r[0] for r in rows]
    b_chunks = [r[1] for r in rows]
    return np.concatenate(a_chunks), np.concatenate(b_chunks)
