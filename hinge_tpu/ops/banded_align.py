"""Banded batched global alignment for ladder-scale segments.

The draft stage aligns ~tspace_draft(=900)bp ladder segments against a
template (draft.cpp:636 uses the banded Myers `_align` with tolerance 150).
Full NW on 900bp is 810k cells; with anchors every segment the optimal path
stays near the diagonal, so a band of +/-B cells suffices:

    D[i, d]  with  d = j - i + B  in [0, 2B]
    diag (i-1, j-1): D[i-1, d] + sub
    up   (i-1, j):   D[i-1, d+1] + 1
    left (i,   j-1): D[i, d-1] + 1  — resolved by the same min-plus cummin
                                      prefix as the full-matrix kernel.

One lax.scan over rows, vmapped over the batch; storage is rows x (2B+1)
int16.  Windows whose length difference exceeds the band fall back to the
scalar Myers aligner.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GAP = 4
BIG = 1 << 14  # fits int16


@functools.partial(jax.jit, static_argnames=("w", "band"))
def _fill_banded(q: jnp.ndarray, t: jnp.ndarray, *, w: int, band: int):
    """Banded DP. q, t: uint8 [Bt, W]. Returns D int16 [Bt, W+1, 2*band+1]."""
    Bt = q.shape[0]
    K = 2 * band + 1
    dd = jnp.arange(K, dtype=jnp.int32)

    def row_step(prev, xs):
        i, qi = xs  # row index (1-based), query base per batch element
        # j index for each lane of row i: j = i + d - band
        jcol = i + dd[None, :] - band  # [1, K]
        valid_j = (jcol >= 1) & (jcol <= w)
        # t base at j-1 (gathered per lane)
        tj = jnp.take_along_axis(
            t, jnp.clip(jcol - 1, 0, w - 1).astype(jnp.int32).repeat(Bt, axis=0), axis=1
        )
        sub = jnp.where(tj == qi[:, None], 0, 1).astype(jnp.int32)
        # diag: prev row, same lane represents (i-1, j-1) ✓
        diag = prev + sub
        # up: prev row, lane d+1 is (i-1, j)
        up = jnp.concatenate(
            [prev[:, 1:], jnp.full((Bt, 1), BIG, jnp.int32)], axis=1
        ) + 1
        e = jnp.minimum(diag, up)
        e = jnp.where(valid_j, e, BIG)
        # j == 0 boundary cell D[i, 0] = i lives at lane d = band - i (if any)
        e = jnp.where((jcol == 0), i, e)
        # left: within-row min-plus prefix along d (j-1 at lane d-1)
        g = e - dd[None, :]
        gmin = jax.lax.associative_scan(jnp.minimum, g, axis=1)
        row = jnp.minimum(e, gmin + dd[None, :])
        row = jnp.where(valid_j | (jcol == 0), row, BIG)
        return row, row.astype(jnp.int16)

    # row 0: D[0, j] = j at lane d = j + band - 0*... j = d - band
    j0 = dd[None, :] - band
    row0 = jnp.where((j0 >= 0) & (j0 <= w), j0, BIG).astype(jnp.int32)
    row0 = jnp.broadcast_to(row0, (Bt, K)).astype(jnp.int32)
    idx = jnp.arange(1, w + 1, dtype=jnp.int32)
    _, rows = jax.lax.scan(
        row_step, row0, (idx, jnp.swapaxes(q, 0, 1).astype(jnp.int32))
    )
    D = jnp.concatenate(
        [row0[:, None, :].astype(jnp.int16), jnp.swapaxes(rows, 0, 1)], axis=1
    )
    return D


def align_batch_banded(
    qs: Sequence[np.ndarray],
    ts: Sequence[np.ndarray],
    w: int = 1024,
    band: int = 64,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Globally align pairs with a banded DP; rows cover both inputs fully.
    Falls back to scalar Myers per pair when out of band/width."""
    from hinge_tpu.ops.myers import align_full as _scalar

    B = len(qs)
    if B == 0:
        return []
    fallback = {}
    q = np.zeros((B, w), dtype=np.uint8)
    t = np.zeros((B, w), dtype=np.uint8)
    m = np.zeros(B, dtype=np.int64)
    n = np.zeros(B, dtype=np.int64)
    for k in range(B):
        if (
            len(qs[k]) > w or len(ts[k]) > w
            or abs(len(qs[k]) - len(ts[k])) > band - 2
        ):
            fallback[k] = True
            continue
        m[k] = len(qs[k])
        n[k] = len(ts[k])
        q[k, : m[k]] = qs[k]
        t[k, : n[k]] = ts[k]

    Bp = 1
    while Bp < B:
        Bp *= 2
    qp = np.zeros((Bp, w), dtype=np.uint8)
    tp = np.zeros((Bp, w), dtype=np.uint8)
    qp[:B], tp[:B] = q, t
    D = np.asarray(_fill_banded(jnp.asarray(qp), jnp.asarray(tp), w=w, band=band))[:B]

    # paths whose edit distance approaches the band may have left it:
    # their traceback is unreliable — send them to the scalar fallback
    final_lane = np.clip(n - m + band, 0, 2 * band)
    final_cost = D[np.arange(B), m, final_lane].astype(np.int64)
    for k in range(B):
        if k not in fallback and final_cost[k] >= band - 2:
            fallback[k] = True

    # lock-step banded traceback: position (i, j), lane d = j - i + band
    i = m.copy()
    j = n.copy()
    max_steps = int((m + n).max()) if B else 0
    mv = np.zeros((B, max_steps), dtype=np.int8)
    cnt = np.zeros(B, dtype=np.int64)
    bidx = np.arange(B)
    fb_mask = np.zeros(B, dtype=bool)
    for k in fallback:
        fb_mask[k] = True
    i[fb_mask] = 0
    j[fb_mask] = 0

    def lane(ii, jj):
        return np.clip(jj - ii + band, 0, 2 * band)

    for _ in range(max_steps):
        active = (i > 0) | (j > 0)
        if not active.any():
            break
        cur = D[bidx, np.maximum(i, 0), lane(i, j)]
        im1 = np.maximum(i - 1, 0)
        jm1 = np.maximum(j - 1, 0)
        sub = np.where(q[bidx, im1] == t[bidx, jm1], 0, 1)
        diag_ok = (i > 0) & (j > 0) & (D[bidx, im1, lane(im1, jm1)] + sub == cur)
        up_ok = (i > 0) & (np.abs(j - im1) <= band) & (D[bidx, im1, lane(im1, j)] + 1 == cur)
        move = np.where(diag_ok, 0, np.where(up_ok, 1, 2)).astype(np.int8)
        sel = active
        mv[bidx[sel], cnt[sel]] = move[sel]
        cnt[sel] += 1
        i = np.where(sel & (move != 2), i - 1, i)
        j = np.where(sel & (move != 1), j - 1, j)

    out: List[Tuple[np.ndarray, np.ndarray]] = []
    for k in range(B):
        if k in fallback:
            out.append(_scalar(qs[k], ts[k]))
            continue
        seq = mv[k, : cnt[k]][::-1]
        L = len(seq)
        q_row = np.full(L, GAP, dtype=np.uint8)
        t_row = np.full(L, GAP, dtype=np.uint8)
        qc = seq != 2
        tc = seq != 1
        qpos = np.cumsum(qc) - qc
        tpos = np.cumsum(tc) - tc
        q_row[qc] = qs[k][qpos[qc]]
        t_row[tc] = ts[k][tpos[tc]]
        out.append((q_row, t_row))
    return out
