"""Pileup coverage / mask / repeat-annotation kernels.

The reference computes these with per-read event sorts and scalar scans
(`LAInterface::profileCoverage`, LAInterface.cpp:4298-4320; mask loop
`filter.cpp:696-788`; QV mask `filter.cpp:343-369`).  Here each becomes a
dense op over a (reads, bins) grid:

* profile coverage = scatter-add of ±1 events into bins + cumulative sum
  along the bin axis (an exclusive prefix over "events with value < b*reso"),
* longest-run masks = flush-point detection on the binarized grid + a single
  first-argmax, reproducing the reference's exact (quirky) run bookkeeping,
* repeat annotation = elementwise gradient thresholding.

All kernels are jit-compatible with static shapes: callers chunk reads into
fixed-size blocks and pad (see stages/filter.py).  XLA fuses the elementwise
pipeline; the scatter-add + cumsum is the only memory-bound part and maps to
one pass over the overlap records per chunk.

Semantics notes (replicated bug-for-bug, validated against scalar oracles in
tests/test_filter_ops.py):

- profileCoverage emits bins while unconsumed events remain, so the bin count
  for a read is max_event//reso + 2; every bin past that is zero because the
  ±1 events telescope.  We pad to a fixed NB and keep n_entries per read.
- The coverage-mask scan (filter.cpp:708-728) records a run only when a zero
  bin *flushes* it, uses maxstart = start+reso (so a run starting at bin 0
  reports start reso, not 0), measures length as end-start-reso, and prefers
  the earliest run on ties (strict >).
- The QV mask scan (filter.cpp:343-369) never lets the final segment extend a
  run (the `j < size-1` guard), and also keeps the earliest longest run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def event_bins(values: jnp.ndarray, reso: int, nb: int) -> jnp.ndarray:
    """Bin index b such that bins >= b see this event: smallest b with
    value < b*reso, i.e. floor(value/reso)+1 (floor division, negatives ok)."""
    return jnp.clip(jnp.floor_divide(values, reso) + 1, 0, nb)


@functools.partial(jax.jit, static_argnames=("n_reads", "nb", "reso"))
def profile_coverage(
    a_rel: jnp.ndarray,  # int32 [n_ov] read row in chunk (n_reads = padding row)
    a_start: jnp.ndarray,  # int32 [n_ov]
    a_end: jnp.ndarray,  # int32 [n_ov]
    cutoff: jnp.ndarray,  # scalar int32
    *,
    n_reads: int,
    nb: int,
    reso: int,
) -> jnp.ndarray:
    """Coverage counts per (read, bin): count at bin b = #events < b*reso,
    with each overlap contributing +1 at a_start+cutoff and -1 at
    a_end-cutoff (profileCoverage, LAInterface.cpp:4298-4320)."""
    sb = event_bins(a_start + cutoff, reso, nb)
    eb = event_bins(a_end - cutoff, reso, nb)
    # one extra read row for padded overlaps; one extra bin column for clips
    grid = jnp.zeros(((n_reads + 1) * (nb + 1),), dtype=jnp.int32)
    grid = grid.at[a_rel * (nb + 1) + sb].add(1, mode="drop")
    grid = grid.at[a_rel * (nb + 1) + eb].add(-1, mode="drop")
    grid = grid.reshape(n_reads + 1, nb + 1)[:n_reads, :nb]
    return jnp.cumsum(grid, axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_reads", "nb", "reso"))
def pileup_stats(
    a_rel: jnp.ndarray,
    a_start: jnp.ndarray,
    a_end: jnp.ndarray,
    *,
    n_reads: int,
    nb: int,
    reso: int,
):
    """max(a_end) and max(a_start) per read (drive n_entries) and overlap
    counts per read.  BOTH maxima matter: profileCoverage's bin loop runs to
    the maximum event of EITHER kind, and with a cutoff a short overlap's
    start+cutoff can exceed every end-cutoff (found by property fuzzing)."""
    maxend = jnp.zeros((n_reads + 1,), dtype=jnp.int32)
    maxend = maxend.at[a_rel].max(a_end, mode="drop")
    maxstart = jnp.full((n_reads + 1,), jnp.iinfo(jnp.int32).min, dtype=jnp.int32)
    maxstart = maxstart.at[a_rel].max(a_start, mode="drop")
    counts = jnp.zeros((n_reads + 1,), dtype=jnp.int32)
    counts = counts.at[a_rel].add(1, mode="drop")
    return maxend[:n_reads], maxstart[:n_reads], counts[:n_reads]


def n_entries_from_max_event(max_event: jnp.ndarray, counts: jnp.ndarray, reso: int) -> jnp.ndarray:
    """profileCoverage bin count: floor(max_event/reso)+2 when the pileup is
    nonempty, else 0 (the while loop never runs)."""
    ne = jnp.floor_divide(max_event, reso) + 2
    return jnp.where(counts > 0, ne, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("reso",))
def coverage_mask(
    cov_cut: jnp.ndarray,  # int32 [reads, nb]: cutoff coverage minus MIN_COV, clipped at 0
    n_entries: jnp.ndarray,  # int32 [reads]
    *,
    reso: int,
):
    """Longest positive run, with the reference's exact bookkeeping
    (filter.cpp:696-755). Returns (maxstart, maxend, max_start_coord,
    max_end_coord) per read.

    Derivation: the scalar loop flushes a run of positive bins [b0..b1] when
    it hits the next zero bin, recording
        len       = (b1 - max(b0, 1)) * reso
        maxstart  = max(b0, 1) * reso
        maxend    = b1 * reso
        start/end coords = max(b0, 1), b1
    and keeps the first strictly-longest run.  The final real bin is always
    zero (events telescope), so padding with zeros adds no candidates.
    """
    reads, nb = cov_cut.shape
    bin_pos = jnp.arange(nb, dtype=jnp.int32)
    valid = bin_pos[None, :] < n_entries[:, None]
    pos = (cov_cut > 0) & valid

    # run id per bin: cumsum of "is start of run" along bins
    prev_pos = jnp.pad(pos[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    is_start = pos & ~prev_pos
    # for each bin, b0 of its current run (propagate run-start index forward)
    start_idx = jnp.where(is_start, bin_pos[None, :], 0)
    b0 = jax.lax.associative_scan(jnp.maximum, jnp.where(pos, start_idx, -1), axis=1)
    # flush points: bin b is zero/invalid and bin b-1 was positive
    flush = ~pos & prev_pos
    b1 = bin_pos[None, :] - 1  # run end at a flush point
    b0f = jnp.where(flush, jnp.roll(b0, 1, axis=1), 0)
    b0_eff = jnp.maximum(b0f, 1)
    cand_len = jnp.where(flush, (b1 - b0_eff) * reso, -1)
    # "end > start" guard: for b0==0 requires b1 > 0; for b0>0 always true.
    ok = jnp.where(flush & (b0f == 0), b1 > 0, flush)
    cand_len = jnp.where(ok, cand_len, -1)
    # first strictly-longest: argmax returns first max index
    best = jnp.argmax(cand_len, axis=1)
    rows = jnp.arange(reads)
    best_len = cand_len[rows, best]
    found = best_len > 0  # maxlen starts at 0, strict >
    maxstart = jnp.where(found, b0_eff[rows, best] * reso, 0)
    maxend = jnp.where(found, b1[rows, best] * reso, 0)
    msc = jnp.where(found, b0_eff[rows, best], 0)
    mec = jnp.where(found, b1[rows, best], 0)
    return maxstart, maxend, msc.astype(jnp.int32), mec.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tspace",))
def qv_mask(
    good: jnp.ndarray,  # bool [reads, nseg]: qv < threshold
    n_segs: jnp.ndarray,  # int32 [reads]
    *,
    tspace: int,
):
    """Longest run of good-QV segments, last segment excluded
    (filter.cpp:343-369). Returns (maxs, maxe) in base pairs."""
    reads, nseg = good.shape
    seg = jnp.arange(nseg, dtype=jnp.int32)
    # the `j < size-1` guard: segment size-1 never extends a run
    eligible = good & (seg[None, :] < (n_segs[:, None] - 1))
    prev = jnp.pad(eligible[:, :-1], ((0, 0), (1, 0)), constant_values=False)
    is_start = eligible & ~prev
    start_idx = jnp.where(is_start, seg[None, :], 0)
    s0 = jax.lax.associative_scan(jnp.maximum, jnp.where(eligible, start_idx, -1), axis=1)
    # flush at first non-eligible after a run (incl. the virtual end): pad one
    pe = jnp.pad(eligible, ((0, 0), (0, 1)), constant_values=False)
    ppos = jnp.pad(eligible, ((0, 0), (1, 0)), constant_values=False)[:, : nseg + 1]
    flush = ~pe & ppos
    segx = jnp.arange(nseg + 1, dtype=jnp.int32)
    e = segx[None, :]  # run [s0, e) flushed at index e
    s0x = jnp.pad(s0, ((0, 0), (1, 0)), constant_values=-1)[:, : nseg + 1]
    cand = jnp.where(flush, e - jnp.maximum(s0x, 0), -1)
    best = jnp.argmax(cand, axis=1)
    rows = jnp.arange(reads)
    best_len = cand[rows, best]
    found = best_len > 0
    maxs = jnp.where(found, jnp.maximum(s0x[rows, best], 0), 0)
    maxe = jnp.where(found, best, 0)
    return (maxs * tspace).astype(jnp.int32), (maxe * tspace).astype(jnp.int32)


def qv_mask_np(good: np.ndarray, n_segs: np.ndarray, *, tspace: int):
    """Vectorized-numpy mirror of qv_mask (same algorithm, same outputs).

    The QV grid is tiny (reads x ~read_len/tspace bools) and latency-bound
    on any accelerator; the filter stage uses this host path by default so
    the device pipeline spends its dispatches on the heavy pileup kernels.
    Pinned against the same oracle as the device kernel
    (tests/test_filter_ops.py)."""
    reads, nseg = good.shape
    seg = np.arange(nseg, dtype=np.int32)
    eligible = good & (seg[None, :] < (n_segs[:, None].astype(np.int64) - 1))
    prev = np.zeros_like(eligible)
    prev[:, 1:] = eligible[:, :-1]
    is_start = eligible & ~prev
    start_idx = np.where(is_start, seg[None, :], 0)
    s0 = np.maximum.accumulate(np.where(eligible, start_idx, -1), axis=1)
    pe = np.concatenate([eligible, np.zeros((reads, 1), bool)], axis=1)
    ppos = np.concatenate([np.zeros((reads, 1), bool), eligible], axis=1)
    flush = ~pe & ppos
    s0x = np.concatenate([np.full((reads, 1), -1, s0.dtype), s0], axis=1)
    e = np.arange(nseg + 1, dtype=np.int64)[None, :]
    cand = np.where(flush, e - np.maximum(s0x, 0), -1)
    best = np.argmax(cand, axis=1)
    rows = np.arange(reads)
    found = cand[rows, best] > 0
    maxs = np.where(found, np.maximum(s0x[rows, best], 0), 0)
    maxe = np.where(found, best, 0)
    return (maxs * tspace).astype(np.int32), (maxe * tspace).astype(np.int32)


@jax.jit
def coverage_gradient(cov: jnp.ndarray) -> jnp.ndarray:
    """cg[j] = cov[j+1] - cov[j] (filter.cpp:604-609); last column unused."""
    return cov[:, 1:] - cov[:, :-1]


@functools.partial(jax.jit, static_argnames=("reso",))
def repeat_annotation_mask(
    cov: jnp.ndarray,  # [reads, nb] no-cutoff coverage
    n_entries: jnp.ndarray,  # [reads]
    mask_start: jnp.ndarray,  # [reads]
    mask_end: jnp.ndarray,  # [reads]
    min_cov: jnp.ndarray,  # scalar (already raised to cov_est/3)
    *,
    reso: int,
    coverage_fraction: int,
    min_thresh: int,
    max_thresh: int,
    no_hinge_region: int,
):
    """Gradient-threshold repeat annotations (filter.cpp:796-813).

    Returns int8 [reads, nb-1]: +1 rising, -1 falling, 0 none; indices past
    cgs.size()-1 (= n_entries-2 entries, minus the final one) are zeroed.
    """
    cg = coverage_gradient(cov)
    nbm1 = cg.shape[1]
    j = jnp.arange(nbm1, dtype=jnp.int32)[None, :]
    pos = j * reso
    # annotation loop: j in [0, cgs.size()-1) with cgs.size() = n_entries-1
    in_range = j < (n_entries[:, None] - 2)
    in_window = (pos >= mask_start[:, None] + no_hinge_region) & (
        pos <= mask_end[:, None] - no_hinge_region
    )
    thresh = jnp.minimum(
        jnp.maximum((cov[:, :nbm1] + min_cov) // coverage_fraction, min_thresh),
        max_thresh,
    )
    rising = cg > thresh
    falling = cg < -thresh
    ann = jnp.where(rising, 1, jnp.where(falling, -1, 0)).astype(jnp.int8)
    return jnp.where(in_range & in_window, ann, 0)
