import numpy as np

from hinge_tpu.data.overlaps import OverlapStore
from hinge_tpu.ops.intrinsic_qv import attach_intrinsic_qv, compute_intrinsic_qv


def _mk_store(a_id, a_start, a_end, diffs_per_seg, tspace=100):
    """One overlap per entry; trace pairs carry the given per-segment diffs."""
    n = len(a_id)
    tlen, traces, offs = [], [], []
    off = 0
    for k in range(n):
        bounds = [a_start[k]]
        nb = a_start[k]
        while True:
            nb = (nb // tspace + 1) * tspace
            if nb >= a_end[k]:
                break
            bounds.append(nb)
        bounds.append(a_end[k])
        P = len(bounds) - 1
        tr = np.zeros(2 * P, dtype=np.uint16)
        tr[0::2] = diffs_per_seg[k]
        tr[1::2] = np.diff(bounds)
        traces.append(tr)
        tlen.append(2 * P)
        offs.append(off)
        off += 2 * P
    z = np.zeros(n, dtype=np.int32)
    return OverlapStore(
        a_id=np.asarray(a_id, np.int32), b_id=np.asarray(a_id, np.int32) + 100,
        a_len=np.full(n, 2000, np.int32), b_len=np.full(n, 2000, np.int32),
        a_start=np.asarray(a_start, np.int32), a_end=np.asarray(a_end, np.int32),
        b_start=np.asarray(a_start, np.int32), b_end=np.asarray(a_end, np.int32),
        rc=z, diffs=z, tlen=np.asarray(tlen, np.int32),
        trace_off=np.asarray(offs, np.int64),
        trace=np.concatenate(traces), tspace=tspace,
    )


def test_qv_from_diffs():
    # read 0: two overlaps covering [0,1000) with 5 and 15 diffs/segment
    ov = _mk_store([0, 0], [0, 0], [1000, 1000], [5, 15])
    read_len = np.array([1000], dtype=np.int64)
    qv_off, qv = compute_intrinsic_qv(ov, read_len, tspace=100)
    assert qv_off[1] == 10
    # mean diffs = 10 per 100bp -> qv = 50*10/100 = 5
    np.testing.assert_array_equal(qv, np.full(10, 5, np.uint8))


def test_qv_uncovered_segments():
    ov = _mk_store([0], [300], [700], [0])
    read_len = np.array([1000], dtype=np.int64)
    _, qv = compute_intrinsic_qv(ov, read_len, tspace=100)
    assert (qv[:3] == 51).all()  # uncovered
    assert (qv[3:7] == 0).all()  # perfect
    assert (qv[7:] == 51).all()


def test_attach_and_filter_integration(small_sim):
    """A no-QV store gets an intrinsic track and the filter consumes it."""
    import copy

    from hinge_tpu.config import nominal_config
    from hinge_tpu.stages.filter import run_filter

    rs = copy.copy(small_sim["read_store"])
    ov = small_sim["overlaps"]
    rs.qv_off = None
    rs.qv_val = None
    attach_intrinsic_qv(rs, ov, tspace=ov.tspace)
    assert rs.has_qv()
    # simulator overlaps have zero diffs -> covered segments are qv 0 (good)
    res = run_filter(rs, [ov], nominal_config())
    assert (res.maskvec[:, 1] > 0).sum() > 0.8 * rs.n_reads
