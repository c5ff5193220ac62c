import numpy as np
import jax.numpy as jnp
import pytest

from hinge_tpu.ops import coverage as C
from tests import oracles as O


def _chunk_inputs(ov, n_reads):
    rp = ov.row_ptr(n_reads)
    return ov.a_id, ov.a_start, ov.a_end, rp


def test_profile_coverage_matches_oracle(small_sim):
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    n_reads = rs.n_reads
    reso, cutoff = 40, 300
    maxlen = int(rs.length.max())
    nb = maxlen // reso + 3

    for co in (0, cutoff):
        cov = np.asarray(
            C.profile_coverage(
                jnp.asarray(ov.a_id), jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
                jnp.int32(co), n_reads=n_reads, nb=nb, reso=reso,
            )
        )
        rp = ov.row_ptr(n_reads)
        for r in range(n_reads):
            lo, hi = rp[r], rp[r + 1]
            oracle = O.profile_coverage_oracle(
                ov.a_start[lo:hi], ov.a_end[lo:hi], reso, co
            )
            for j, (p, c) in enumerate(oracle):
                assert cov[r, j] == c, (r, j, co)
            # entries past the oracle length are zero
            assert (cov[r, len(oracle) :] == 0).all()


def test_n_entries(small_sim):
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    n_reads = rs.n_reads
    reso = 40
    me, _ms, cnt = C.pileup_stats(
        jnp.asarray(ov.a_id), jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
        n_reads=n_reads, nb=1, reso=reso,
    )
    ne = np.asarray(C.n_entries_from_max_event(me, cnt, reso))
    rp = ov.row_ptr(n_reads)
    for r in range(n_reads):
        lo, hi = rp[r], rp[r + 1]
        oracle = O.profile_coverage_oracle(ov.a_start[lo:hi], ov.a_end[lo:hi], reso, 0)
        assert ne[r] == len(oracle), r


def test_coverage_mask_matches_oracle(small_sim):
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    n_reads = rs.n_reads
    reso, cutoff, min_cov = 40, 300, 6
    nb = int(rs.length.max()) // reso + 3
    cov_cut = C.profile_coverage(
        jnp.asarray(ov.a_id), jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
        jnp.int32(cutoff), n_reads=n_reads, nb=nb, reso=reso,
    )
    me, _ms, cnt = C.pileup_stats(
        jnp.asarray(ov.a_id), jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
        n_reads=n_reads, nb=1, reso=reso,
    )
    # n_entries for the cutoff profile: max event is max(a_end) - cutoff
    ne = np.asarray(C.n_entries_from_max_event(me - cutoff, cnt, reso))
    reduced = jnp.maximum(cov_cut - min_cov, 0)
    ms, mev, msc, mec = (
        np.asarray(x) for x in C.coverage_mask(reduced, jnp.asarray(ne), reso=reso)
    )
    rp = ov.row_ptr(n_reads)
    checked_nontrivial = 0
    for r in range(n_reads):
        lo, hi = rp[r], rp[r + 1]
        oracle_cov = O.profile_coverage_oracle(ov.a_start[lo:hi], ov.a_end[lo:hi], reso, cutoff)
        oms, ome, omsc, omec = O.coverage_mask_oracle(oracle_cov, min_cov, reso)
        assert (ms[r], mev[r], msc[r], mec[r]) == (oms, ome, omsc, omec), r
        if ome > 0:
            checked_nontrivial += 1
    assert checked_nontrivial > n_reads // 2


def test_coverage_mask_quirks():
    """Pin the reference's run-bookkeeping quirks with handcrafted inputs."""
    reso = 40
    cases = [
        # run starting at bin 0: maxstart becomes reso, not 0
        [5, 5, 5, 5, 0, 0],
        # single positive bin at 0: never flushed as a run (end==start)
        [5, 0, 0],
        # two runs, second longer
        [0, 3, 3, 0, 0, 4, 4, 4, 4, 0, 0],
        # tie: first run wins
        [0, 2, 2, 0, 3, 3, 0, 0],
        # single positive bin mid-read: zero-length candidate, not recorded
        [0, 0, 7, 0, 0],
        # all positive until the trailing zero
        [1, 2, 3, 4, 5, 0],
    ]
    for vals in cases:
        vals = np.array(vals, dtype=np.int32)
        cov_list = [(j * reso, int(v)) for j, v in enumerate(vals)]
        oracle = O.coverage_mask_oracle(cov_list, 0, reso)
        got = C.coverage_mask(
            jnp.asarray(vals)[None, :], jnp.asarray([len(vals)]), reso=reso
        )
        got = tuple(int(np.asarray(x)[0]) for x in got)
        assert got == oracle, (vals, got, oracle)


def test_qv_mask_matches_oracle():
    rng = np.random.default_rng(5)
    tspace = 100
    n, nseg = 64, 50
    segs = rng.integers(3, nseg, size=n)
    good = np.zeros((n, nseg), dtype=bool)
    for i in range(n):
        good[i, : segs[i]] = rng.random(segs[i]) < 0.8
    ms, me = (np.asarray(x) for x in C.qv_mask(jnp.asarray(good), jnp.asarray(segs, dtype=np.int32), tspace=tspace))
    nms, nme = C.qv_mask_np(good, segs.astype(np.int32), tspace=tspace)
    for i in range(n):
        oms, ome = O.qv_mask_oracle(good[i, : segs[i]].astype(int), tspace)
        assert (ms[i], me[i]) == (oms, ome), i
        assert (nms[i], nme[i]) == (oms, ome), i  # host mirror, same oracle


def test_qv_mask_last_segment_excluded():
    # all-good QV: run can never include the final segment
    good = np.ones((1, 10), dtype=bool)
    ms, me = C.qv_mask(jnp.asarray(good), jnp.asarray([10], dtype=np.int32), tspace=100)
    assert (int(ms[0]), int(me[0])) == (0, 900)


def test_repeat_annotation_matches_oracle(small_sim):
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    n_reads = rs.n_reads
    reso, min_cov = 40, 6
    nb = int(rs.length.max()) // reso + 3
    cov = C.profile_coverage(
        jnp.asarray(ov.a_id), jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
        jnp.int32(0), n_reads=n_reads, nb=nb, reso=reso,
    )
    me_, _ms, cnt = C.pileup_stats(
        jnp.asarray(ov.a_id), jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
        n_reads=n_reads, nb=1, reso=reso,
    )
    ne = np.asarray(C.n_entries_from_max_event(me_, cnt, reso))
    # synthetic masks: full reads
    mask_start = np.zeros(n_reads, dtype=np.int32)
    mask_end = rs.length.astype(np.int32)
    ann = np.asarray(
        C.repeat_annotation_mask(
            cov, jnp.asarray(ne), jnp.asarray(mask_start), jnp.asarray(mask_end),
            jnp.int32(min_cov), reso=reso, coverage_fraction=3,
            min_thresh=10, max_thresh=20, no_hinge_region=500,
        )
    )
    covh = np.asarray(cov)
    rp = ov.row_ptr(n_reads)
    total = 0
    for r in range(n_reads):
        lo, hi = rp[r], rp[r + 1]
        oracle_cov = O.profile_coverage_oracle(ov.a_start[lo:hi], ov.a_end[lo:hi], reso, 0)
        oracle = O.repeat_annotation_oracle(
            oracle_cov, (mask_start[r], mask_end[r]), min_cov, 3, 10, 20, 500
        )
        got = [(j * 40, int(ann[r, j])) for j in np.nonzero(ann[r])[0]]
        assert got == oracle, r
        total += len(oracle)
    assert total > 0  # the repeat in the simulated genome must fire


def test_merge_annotations():
    a = [(100, 1), (300, 1), (700, 1), (900, -1), (1100, -1)]
    got = O.merge_annotations_oracle(a, 300)
    assert got == [(100, 1), (700, 1), (1100, -1)]


def test_hinge_kernel_order_sensitive_fuzz():
    """The bridged/unbridged scan depends on exact lexicographic supporter
    order (filter.cpp:914-1065 sorts pairAscend/pairDescend).  Round 3 found
    the packed int32 sort key wrapped for coordinates > 1023, reordering
    supporters; this pins the two-pass stable-radix fix against the scalar
    scan at order-sensitive thresholds."""
    import numpy as np

    from hinge_tpu.ops.hinge_call import call_hinges_device
    from hinge_tpu.stages.filter import _bridged_scan_in, _bridged_scan_out

    THETA, HTL, HBL, HRUT, HBPT = 300, 300, 600, 2, 2
    rng = np.random.default_rng(1)
    for trial in range(60):
        n = int(rng.integers(6, 30))
        pos_a = int(rng.integers(2000, 28000))
        grad = int(rng.choice([-1, 1]))
        ams = rng.integers(0, 28000, n).astype(np.int32)
        if grad == -1:
            ame = (pos_a + rng.integers(-HTL + 1, HTL - 1, n)).astype(np.int32)
        else:
            ame = (ams + rng.integers(500, 5000, n)).astype(np.int32)
            ams = (pos_a + rng.integers(-HTL + 1, HTL - 1, n)).astype(np.int32)
        lov = rng.integers(0, 2000, n).astype(np.int32)
        rov = rng.integers(0, 2000, n).astype(np.int32)
        rows = {0: (ams, ame, lov, rov)}
        m0 = int(rng.integers(0, 3000))
        m1 = int(rng.integers(25000, 30000))
        bd, sd = call_hinges_device(
            np.array([(0, 0)]), np.array([pos_a], np.int32),
            np.array([grad], np.int32), np.array([m0], np.int32),
            np.array([m1], np.int32), rows, THETA, HTL, HBL, HRUT, HBPT,
        )
        if grad == -1:
            near = (ame > pos_a - HTL) & (ame < pos_a + HTL) & (rov > THETA)
            other = np.stack([ams[near], lov[near]], axis=1)
            other = other[np.lexsort((other[:, 1], other[:, 0]))]
            b = _bridged_scan_out(other, m0, HBL, THETA, HRUT, HBPT)
        else:
            near = (ams > pos_a - HTL) & (ams < pos_a + HTL) & (lov > THETA)
            other = np.stack([ame[near], rov[near]], axis=1)
            other = other[np.lexsort((-other[:, 1], -other[:, 0]))]
            b = _bridged_scan_in(other, m1, HBL, THETA, HRUT, HBPT)
        assert int(near.sum()) == int(sd[0]), trial
        assert bool(b) == bool(bd[0]), trial
