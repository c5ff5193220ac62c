"""Regression locks for the consensus selection quirks found at 4.6Mb.

Reference behavior pinned here (verified against /root/reference/src/
consensus/consensus.cpp by the r3 4.6Mb byte-parity bisect):
  * consensus.cpp:62 — remove_multialign takes the alignment vector BY
    VALUE, so only the deduped COUNT reaches the caller; the vote loop
    consumes the first seq_count entries of the ORIGINAL sorted list,
    duplicates and short alignments included.
  * consensus.cpp:136 — std::sort (introsort, UNSTABLE) orders each
    contig's alignments by descending summed match length; tied entries
    land in introsort order, not file order.
"""
import numpy as np
import pytest

from hinge_tpu.data.overlaps import OverlapStore
from hinge_tpu.stages.consensus import (
    remove_multialign, select_rows, sort_alignments,
)


def _store(a_id, b_id, a_span, b_span=None):
    a_id = np.asarray(a_id, np.int32)
    n = len(a_id)
    a_start = np.zeros(n, np.int32)
    a_end = np.asarray(a_span, np.int32)
    b_start = np.zeros(n, np.int32)
    b_end = np.asarray(b_span if b_span is not None else a_span, np.int32)
    return OverlapStore.from_arrays(
        a_id=a_id, b_id=np.asarray(b_id, np.int32),
        a_len=np.full(n, 100000, np.int32), b_len=np.full(n, 100000, np.int32),
        a_start=a_start, a_end=a_end, b_start=b_start, b_end=b_end,
        rc=np.zeros(n, np.int32),
    )


def test_by_value_remove_multialign_prefix():
    # sorted rows (desc match_len) for one contig:
    #   row0: B=7 span 5000   (kept by dedup)
    #   row1: B=7 span 4000   (dup B — dedup drops it)
    #   row2: B=8 span 200    (short — dedup drops it)
    #   row3: B=9 span 150    (short — dedup drops it)
    #   row4: B=10 span 3000  (kept by dedup)
    ov = _store([0] * 5, [7, 7, 8, 9, 10], [5000, 4000, 200, 150, 3000])
    rows = np.arange(5)
    dedup = remove_multialign(rows, ov, min_len=300)
    assert dedup == [0, 4]
    sel = select_rows(rows, ov, min_len=300)
    # the quirk: COUNT=2 survives, but the vote loop reads the first 2
    # entries of the ORIGINAL list — the duplicate B=7 row, NOT row4
    assert sel == [0, 1]


def test_select_rows_empty_and_all_kept():
    ov = _store([0, 0], [1, 2], [5000, 4000])
    assert select_rows(np.arange(2), ov, min_len=300) == [0, 1]
    assert select_rows(np.arange(2), ov, min_len=99999) == []


def test_sort_alignments_no_ties_matches_stable():
    rng = np.random.default_rng(0)
    n, n_contigs = 300, 4
    a_id = np.sort(rng.integers(0, n_contigs, n)).astype(np.int32)
    # unique match lengths -> introsort and stable order agree
    span = rng.permutation(n).astype(np.int32) * 2 + 400
    ov = _store(a_id, rng.integers(0, 50, n), span)
    order, bounds = sort_alignments(ov, n_contigs)
    expect = np.lexsort((np.arange(n), -(ov.match_len()), ov.a_id))
    np.testing.assert_array_equal(order, expect)
    np.testing.assert_array_equal(
        bounds, np.searchsorted(a_id, np.arange(n_contigs + 1)))


def test_sort_alignments_tie_order_is_introsort():
    from hinge_tpu.ops.pairs import _libstdcxx_orders

    if _libstdcxx_orders() is None:
        pytest.skip("native toolchain unavailable")
    # one contig, 64 alignments with IDENTICAL match length: libstdc++
    # introsort's quicksort partition swaps equal elements, so the replayed
    # permutation must (a) be deterministic and (b) differ from file order
    # (n=64 > the 16-element insertion-sort threshold)
    n = 64
    ov = _store([0] * n, np.arange(n), [1000] * n)
    order1, _ = sort_alignments(ov, 1)
    order2, _ = sort_alignments(ov, 1)
    np.testing.assert_array_equal(order1, order2)
    assert sorted(order1.tolist()) == list(range(n))
    assert not np.array_equal(order1, np.arange(n)), (
        "tied batch came back in stable/file order — the introsort replay "
        "is not being used")


def test_sort_alignments_drops_out_of_range_a_id():
    # a_id beyond n_contigs (malformed .las) must be dropped identically by
    # both sort paths instead of crashing the native one (ADVICE r3)
    ov = _store([0, 0, 3, 0], [1, 2, 3, 4], [5000, 4000, 3000, 2000])
    order, bounds = sort_alignments(ov, n_contigs=2)
    assert set(order.tolist()) == {0, 1, 3}
    assert bounds[-1] == 3
