"""Pallas banded Needleman-Wunsch window aligner — the TPU performance path.

The draft/consensus ladder windows (~tspace bp, SURVEY.md §7 item 10) need
thousands of small global alignments.  The reference's DW_banded.c greedy
O(ND) algorithm is the PARITY path (ops/myers.py scalar, io_native C batch,
ops/wavefront.py device-exact) — but its drifting adaptive band and
data-dependent snake starts are per-lane gathers, which TPU vector hardware
has no unit for (measured: the exact device wave is ~1000x slower than the
C batch).  The TPU-first formulation is the REGULAR-ACCESS banded NW:

    band coordinate k = j - i + BW/2  (fixed width BW, never drifts)
    diag  (i-1, j-1) -> same lane k           (no shuffle)
    up    (i-1, j)   -> lane k+1              (static lane shift)
    left  (i, j-1)   -> in-row prefix scan:   C = min(E, k + cummin(E - k))
    sub   q[i-1] vs t[i-1-HB : i-1-HB+BW]     (contiguous slice)

so one Pallas program keeps the cost row of 8 windows in VMEM, advances one
anti-row per step on the VPU (shift + min + log2(BW) prefix-scan passes),
and streams per-cell move codes to HBM for the lock-step traceback.  The
alignment is an OPTIMAL unit-cost edit path with pinned tie-breaking
(diag > up > left), asserted against a numpy full-DP oracle; it is not
DW_banded's particular optimal path — use the parity aligners when byte
parity with the reference draft output is required.

Moves code: 0 diag, 1 up (gap in t row), 2 left (gap in q row), 3 invalid.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GAP = 4
INF = np.int32(1 << 24)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pack2(codes: np.ndarray) -> np.ndarray:
    """(B, L) base codes 0..3 -> (B, L//4) uint8, little-endian 2-bit."""
    a = codes.reshape(codes.shape[0], -1, 4).astype(np.uint16)
    return (a[..., 0] | (a[..., 1] << 2) | (a[..., 2] << 4)
            | (a[..., 3] << 6)).astype(np.uint8)


# ---------------------------------------------------------------------------
# Pallas fill kernel
# ---------------------------------------------------------------------------


def _unpack2(packed, L):
    """(B, L//4) uint8 2-bit-packed codes -> (B, L) int32 on device."""
    b = packed.astype(jnp.int32)
    parts = jnp.stack(
        [(b >> 0) & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3], axis=-1)
    return parts.reshape(packed.shape[0], L)


@functools.partial(jax.jit, static_argnames=("bw", "lq", "lt"))
def _band_expand(qp, tp, m, n, *, bw: int, lq: int, lt: int):
    """Device-side pad reconstruction for 2-bit-packed uploads.

    qp: (B, lq//4) uint8 packed query bases; tp: (B, (lt-hb)//4) packed
    target bases.  Returns (q, tpad) uint8 with the host layout: 250 past
    each query's m, 251 left / 252 right of each target's [hb, hb+n) span.
    The tunnel ships 2-bit bases — 4x less than byte codes (host->device
    transfer dominated the warm wall).  A separate small jit so the big
    Mosaic fill module keeps its cached signature."""
    hb = bw // 2
    iota_q = jnp.arange(lq, dtype=jnp.int32)[None, :]
    q = jnp.where(iota_q < m[:, None], _unpack2(qp, lq), 250)
    t_codes = _unpack2(tp, lt - hb)
    iota_t = jnp.arange(lt, dtype=jnp.int32)[None, :]
    t_shift = jnp.pad(t_codes, ((0, 0), (hb, 0)))
    tpad = jnp.where(
        iota_t < hb, 251,
        jnp.where(iota_t < hb + n[:, None], t_shift, 252))
    return q.astype(jnp.uint8), tpad.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("bw", "rc", "mrows", "interpret"))
def _band_fill(q, tpad, m, n, *, bw: int, rc: int, mrows: int, interpret: bool):
    """moves (B, Mpad, bw) int8 via the Pallas kernel.

    q: (B, Lq) uint8 (250-padded); tpad: (B, Lt) uint8 (251/252 pads, hb
    sentinel offset on the left); m, n: (B,) int32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WB = 32  # windows per program: (32, 256) tiles keep the VPU busy
    B, Lq = q.shape
    Lt = tpad.shape[1]
    q = q.astype(jnp.int32)
    tpad = tpad.astype(jnp.int32)
    hb = bw // 2
    Mpad = _round_up(mrows, rc)

    def kernel(q_ref, t_ref, mn_ref, moves_ref, crow_ref):
        r = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (WB, bw), 1)

        m_w = mn_ref[:, 0:1]
        n_w = mn_ref[:, 1:2]

        @pl.when(r == 0)
        def _():
            # row 0: C[0, j] = j for 0 <= j <= n else INF; j = lane - hb
            j0 = lane - hb
            crow_ref[:] = jnp.where((j0 >= 0) & (j0 <= n_w), j0, INF)

        # static unroll: the moves store needs a statically-aligned sublane
        # index, and rc bodies of pure VPU ops compile fine
        for ri in range(rc):
            i = r * rc + ri + 1  # DP row (1-based)
            cprev = crow_ref[:]
            # Mosaic needs lane-aligned dynamic slices: load an aligned
            # window and rotate it into place (tpu dynamic_rotate)
            im1 = i - 1
            ta = pl.multiple_of((im1 // 128) * 128, 128)
            toff = im1 - (im1 // 128) * 128
            # t bases for j-1 = i-1-hb .. i-1-hb+bw-1 -> tpad offset i-1
            tw = t_ref[:, pl.ds(ta, bw + 128)]
            trow = pltpu.roll(tw, (bw + 128) - toff, 1)[:, :bw]
            qw = q_ref[:, pl.ds(ta, 128)]
            qcol = pltpu.roll(qw, 128 - toff, 1)[:, 0:1]
            sub = jnp.where(trow == qcol, 0, 1)
            # up: lane k reads cprev[k+1]
            up_src = pltpu.roll(cprev, bw - 1, 1)  # up_src[k] = cprev[k+1]
            up_src = jnp.where(lane == bw - 1, INF, up_src)
            diag_c = cprev + sub
            up_c = up_src + 1
            e = jnp.minimum(diag_c, up_c)
            j = i + lane - hb
            valid = (j >= 1) & (j <= n_w)
            e = jnp.where(valid, e, INF)
            is_j0 = j == 0
            e = jnp.where(is_j0, i, e)
            # left chain: C = min(E, k + cummin_{l<=k}(E[l] - l))
            g = e - lane
            for s in (1, 2, 4, 8, 16, 32, 64, 128):
                if s >= bw:
                    break
                sh = pltpu.roll(g, s, 1)
                sh = jnp.where(lane < s, INF, sh)
                g = jnp.minimum(g, sh)
            c = jnp.minimum(e, g + lane)
            c = jnp.where(valid | is_j0, c, INF)
            mv = jnp.where(
                c < e, 2, jnp.where(diag_c <= up_c, 0, 1)
            )
            mv = jnp.where(is_j0, 1, mv)
            mv = jnp.where(valid | is_j0, mv, 3)
            moves_ref[:, ri, :] = mv.astype(jnp.int8)
            # freeze rows past each window's m
            crow_ref[:] = jnp.where(i <= m_w, c, cprev)

    grid = (B // WB, Mpad // rc)
    mn = jnp.stack([m, n], axis=1)
    moves = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((WB, Lq), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, Lt), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, 2), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WB, rc, bw), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mpad, bw), jnp.int8),
        scratch_shapes=[pltpu.VMEM((WB, bw), jnp.int32)],
        interpret=interpret,
    )(q, tpad, mn)
    return moves


# ---------------------------------------------------------------------------
# lock-step traceback + emission
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bw", "mrows"))
def _row_traceback(moves, m, n, *, bw: int, mrows: int):
    """Row-synchronized traceback — NO per-window gathers.

    Every path visits each DP row exactly once (up/diag decrement i; a
    left-chain stays in-row), so walking rows r = mrows-1 .. 0 lets every
    window resolve its whole row visit per step from the STATICALLY sliced
    row moves[:, r, :]: the left-run end and its terminating up/diag move
    come out of one lane-max of (lane*4 | move) — pure vector ops, where
    the naive cell-by-cell scan was a B-serial gather per step.

    Returns (cnts [B, mrows] left-run per row, mv0s [B, mrows] terminating
    move per row, j_rem [B] leading left columns at row 0)."""
    hb = bw // 2
    lane = jnp.arange(bw, dtype=jnp.int32)[None, :]

    def step(j, r):
        row = jax.lax.dynamic_slice_in_dim(moves, r, 1, axis=1)[:, 0, :]
        row = row.astype(jnp.int32)
        active = r < m  # window is at DP row i = r+1 once r < m
        k_e = jnp.clip(j - (r + 1) + hb, 0, bw - 1)
        # largest lane <= k_e whose move is not 'left' terminates the chain;
        # encode (lane, move) jointly so the move needs no gather
        enc = jnp.where((lane <= k_e[:, None]) & (row != 2), lane * 4 + row, -1)
        top = enc.max(axis=1)
        kstop = top >> 2
        mv0 = (top & 3).astype(jnp.int8)
        cnt = (k_e - kstop).astype(jnp.int32)
        j = jnp.where(active, j - cnt - (mv0 == 0), j)
        return j, (jnp.where(active, cnt, 0).astype(jnp.uint8),
                   jnp.where(active, mv0, 0).astype(jnp.int8))

    rs = jnp.arange(mrows - 1, -1, -1, dtype=jnp.int32)
    j_rem, (cnts, mv0s) = jax.lax.scan(step, n.astype(jnp.int32), rs)
    # scan stacked along r-descending axis 0 -> (B, mrows) ascending
    return (jnp.swapaxes(cnts, 0, 1)[:, ::-1],
            jnp.swapaxes(mv0s, 0, 1)[:, ::-1], j_rem)


@functools.partial(jax.jit, static_argnames=("bw", "mrows", "interpret"))
def _row_traceback_pallas(moves, m, n, *, bw: int, mrows: int,
                          interpret: bool):
    """_row_traceback as a Pallas kernel: the grid walks row blocks in
    REVERSE (index_map r -> nrb-1-r), the per-window column position j
    lives in VMEM scratch, and each program resolves rc rows of 32 windows
    with the same lane-max trick — no XLA scan-step overhead."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    WB = 32
    rc = 128  # output blocks need a 128-divisible trailing dim
    B = moves.shape[0]
    Mpad = moves.shape[1]
    nrb = Mpad // rc
    hb = bw // 2

    def kernel(mv_ref, mn_ref, cnt_ref, mv0_ref, jrem_ref, j_ref):
        r = pl.program_id(1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (WB, bw), 1)
        m_w = mn_ref[:, 0:1]
        n_w = mn_ref[:, 1:2]

        @pl.when(r == 0)
        def _():
            j_ref[:] = n_w

        for ri in range(rc - 1, -1, -1):
            row_r = (nrb - 1 - r) * rc + ri  # DP row index r' (i = r'+1)
            row = mv_ref[:, ri, :].astype(jnp.int32)
            j = j_ref[:]
            active = row_r < m_w
            k_e = jnp.clip(j - (row_r + 1) + hb, 0, bw - 1)
            enc = jnp.where((lane <= k_e) & (row != 2), lane * 4 + row, -1)
            top = jnp.max(enc, axis=1, keepdims=True)
            kstop = top >> 2
            mv0 = top & 3
            cnt = k_e - kstop
            j_ref[:] = jnp.where(active, j - cnt - (mv0 == 0), j)
            cnt_ref[:, ri : ri + 1] = jnp.where(active, cnt, 0).astype(
                jnp.uint8)
            mv0_ref[:, ri : ri + 1] = jnp.where(active, mv0, 0).astype(
                jnp.int8)

        @pl.when(r == nrb - 1)
        def _():
            jrem_ref[:] = j_ref[:]

    mn = jnp.stack([m, n], axis=1)
    cnts, mv0s, jrem = pl.pallas_call(
        kernel,
        grid=(B // WB, nrb),
        in_specs=[
            pl.BlockSpec((WB, rc, bw), lambda b, r: (b, nrb - 1 - r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, 2), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((WB, rc), lambda b, r: (b, nrb - 1 - r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, rc), lambda b, r: (b, nrb - 1 - r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WB, 1), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Mpad), jnp.uint8),
            jax.ShapeDtypeStruct((B, Mpad), jnp.int8),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((WB, 1), jnp.int32)],
        interpret=interpret,
    )(moves, mn)
    return cnts, mv0s, jrem[:, 0]


def _emit_rowrec(qs, ts, cnts, mv0s, j_rem):
    """Rows from per-DP-row traceback records, one flat pass over the whole
    batch.  Forward layout per window: j_rem leading left columns, then per
    DP row r: the up/diag column followed by cnt[r] left columns."""
    B = len(qs)
    ms = np.array([len(q) for q in qs], np.int64)
    cnt_sum = np.array(
        [int(cnts[w, : ms[w]].astype(np.int64).sum()) for w in range(B)],
        np.int64)
    jr = j_rem.astype(np.int64)
    cols_w = jr + ms + cnt_sum
    base = np.zeros(B + 1, np.int64)
    np.cumsum(cols_w, out=base[1:])
    q_flat = np.full(int(base[-1]), GAP, np.uint8)
    t_flat = np.full(int(base[-1]), GAP, np.uint8)
    tfill = np.ones(int(base[-1]), bool)

    # per-(window,row) flat records
    rowner = np.repeat(np.arange(B), ms)
    ridx = np.arange(int(ms.sum()), dtype=np.int64)
    ridx -= np.repeat(np.cumsum(ms) - ms, ms)
    cnt_f = cnts[rowner, ridx].astype(np.int64)
    mv0_f = mv0s[rowner, ridx]
    # column of row r's up/diag cell = base + jr + r + sum(cnt[<r])
    ccum = np.cumsum(cnt_f)
    seg0 = ccum[np.cumsum(ms) - ms] - cnt_f[np.cumsum(ms) - ms]
    ccum_local = ccum - np.repeat(seg0, ms) - cnt_f  # exclusive within window
    offs = base[rowner] + jr[rowner] + ridx + ccum_local
    q_bases = np.concatenate(
        [np.asarray(q, np.uint8) for q in qs]) if ms.sum() else np.zeros(0, np.uint8)
    q_flat[offs] = q_bases
    tfill[offs[mv0_f == 1]] = False
    # t bases fill every remaining column, in order per window
    t_bases = np.concatenate(
        [np.asarray(t, np.uint8) for t in ts]) if B else np.zeros(0, np.uint8)
    t_flat[tfill] = t_bases
    return [
        (q_flat[base[w] : base[w + 1]], t_flat[base[w] : base[w + 1]])
        for w in range(B)
    ]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def band_align_batch(
    qs: Sequence[np.ndarray],
    ts: Sequence[np.ndarray],
    bw: int = 256,
    max_batch: int = 2048,
    interpret: bool | None = None,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Optimal banded global alignment rows (gap code 4) for a batch of
    windows, consuming both sequences entirely (align_full semantics).

    Windows whose length difference exceeds the band fall back to the
    scalar Myers path.  `interpret` defaults to True off-TPU so the SAME
    Pallas kernel runs (interpreted) in CPU tests."""
    B = len(qs)
    if B == 0:
        return []
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hb = bw // 2
    out: List = [None] * B
    overflow = []
    todo = []
    for i in range(B):
        if abs(len(qs[i]) - len(ts[i])) >= hb - 1 or len(qs[i]) == 0:
            overflow.append(i)
        else:
            todo.append(i)
    if overflow:
        from hinge_tpu.ops.myers import align_full

        for i in overflow:
            out[i] = align_full(qs[i], ts[i])
    order = sorted(todo, key=lambda i: len(qs[i]))
    # two-phase pipeline: dispatch every block's device work asynchronously
    # first (jax enqueues uploads + both kernels without blocking), then
    # sync + emit — the tunnel/PCIe transfer of block i overlaps the fill
    # of block i+1 instead of serializing a roundtrip per block.  In-flight
    # depth is bounded so the (B, Mpad, bw) move buffers don't pile up in
    # HBM (~134 MB per 512-window block).
    depth = 8
    pending = []

    def _drain():
        while pending:
            sel, qsel, tsel, B, cnts, mv0s, j_rem = pending.pop(0)
            res = _emit_rowrec(qsel, tsel, np.asarray(cnts)[:B],
                               np.asarray(mv0s)[:B], np.asarray(j_rem)[:B])
            for j, i in enumerate(sel):
                out[i] = res[j]

    for blk in range(0, len(order), max_batch):
        sel = order[blk : blk + max_batch]
        qsel = [qs[i] for i in sel]
        tsel = [ts[i] for i in sel]
        cnts, mv0s, j_rem = _band_block_dispatch(qsel, tsel, bw, interpret)
        pending.append((sel, qsel, tsel, len(sel), cnts, mv0s, j_rem))
        if len(pending) >= depth:
            _drain()
    _drain()
    return out


def _band_block(qs, ts, bw, interpret):
    cnts, mv0s, j_rem = _band_block_dispatch(qs, ts, bw, interpret)
    B = len(qs)
    return _emit_rowrec(qs, ts, np.asarray(cnts)[:B], np.asarray(mv0s)[:B],
                        np.asarray(j_rem)[:B])


def _band_block_dispatch(qs, ts, bw, interpret):
    B = len(qs)
    WB = 32
    Bp = WB
    while Bp < B:  # pow2 batch buckets (one compile per bucket)
        Bp *= 2
    m = np.zeros(Bp, np.int32)
    n = np.zeros(Bp, np.int32)
    for i in range(B):
        m[i] = len(qs[i])
        n[i] = len(ts[i])
    hb = bw // 2
    rc = 32
    # coarse shape buckets: each distinct (B, Mrows, Lt) is one remote TPU
    # compile, so quantize aggressively
    Mrows = _round_up(max(1, int(m.max())), 128)
    # aligned-load slack: the kernel reads [ta, ta+bw+128) with ta <= Mrows
    Lq = Mrows + 128
    Lt = _round_up(max(int(n.max()), Mrows) + bw + 128, 256)
    # ship 2-bit-packed bases; the device reconstructs the 250/251/252 pads
    # (host->device bytes were the warm-path bottleneck on the tunnel rig)
    qc = np.zeros((Bp, Lq), np.uint8)
    tc = np.zeros((Bp, Lt - hb), np.uint8)
    for i in range(B):
        qc[i, : m[i]] = qs[i]
        tc[i, : n[i]] = ts[i]
    mj, nj = jnp.asarray(m), jnp.asarray(n)
    q, tpad = _band_expand(
        jnp.asarray(_pack2(qc)), jnp.asarray(_pack2(tc)), mj, nj,
        bw=bw, lq=Lq, lt=Lt,
    )
    moves = _band_fill(q, tpad, mj, nj,
                       bw=bw, rc=rc, mrows=Mrows, interpret=interpret)
    cnts, mv0s, j_rem = _row_traceback_pallas(
        moves, jnp.asarray(m), jnp.asarray(n), bw=bw,
        mrows=moves.shape[1], interpret=interpret)
    return cnts, mv0s, j_rem
