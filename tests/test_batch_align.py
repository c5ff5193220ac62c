import numpy as np
import pytest

from hinge_tpu.ops import batch_align as BA
from hinge_tpu.ops import myers as MY


def _mutate(rng, codes, sub, ins, dele):
    out = []
    for c in codes:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append((c + rng.integers(1, 4)) % 4)
        else:
            out.append(c)
        if rng.random() < ins:
            out.append(rng.integers(0, 4))
    return np.array(out, dtype=np.uint8)


def test_batch_align_identity():
    rng = np.random.default_rng(0)
    qs = [rng.integers(0, 4, rng.integers(50, 120)).astype(np.uint8) for _ in range(16)]
    rows = BA.align_batch(qs, [q.copy() for q in qs])
    for q, (qr, tr) in zip(qs, rows):
        np.testing.assert_array_equal(qr, q)
        np.testing.assert_array_equal(tr, q)


def test_batch_align_consumes_everything():
    rng = np.random.default_rng(1)
    qs, ts = [], []
    for _ in range(32):
        t = rng.integers(0, 4, rng.integers(40, 120)).astype(np.uint8)
        q = _mutate(rng, t, 0.06, 0.03, 0.03)
        if len(q) > 128:
            q = q[:128]
        qs.append(q)
        ts.append(t)
    rows = BA.align_batch(qs, ts)
    for q, t, (qr, tr) in zip(qs, ts, rows):
        assert len(qr) == len(tr)
        np.testing.assert_array_equal(qr[qr != BA.GAP], q)
        np.testing.assert_array_equal(tr[tr != BA.GAP], t)


def test_batch_align_edit_distance_optimal():
    """The DP must produce optimal unit-cost alignments: compare column
    mismatch+gap count to scipy-free reference via Myers dist."""
    rng = np.random.default_rng(2)
    for _ in range(10):
        t = rng.integers(0, 4, 100).astype(np.uint8)
        q = _mutate(rng, t, 0.05, 0.02, 0.02)[:128]
        (qr, tr), = BA.align_batch([q], [t])
        cost = int(((qr == BA.GAP) | (tr == BA.GAP) | (qr != tr)).sum())
        a = MY.align_pair(q, t, band_tolerance=150)
        # myers greedy d equals optimal edit distance for full consumption
        if a.aligned and a.q_e == len(q) and a.t_e == len(t):
            assert cost <= a.dist + 2, (cost, a.dist)


def test_batch_align_empty_and_extreme():
    rows = BA.align_batch(
        [np.zeros(0, np.uint8), np.array([1, 2, 3], np.uint8)],
        [np.array([0, 1], np.uint8), np.zeros(0, np.uint8)],
    )
    qr, tr = rows[0]
    assert (qr == BA.GAP).all() and len(tr) == 2
    qr, tr = rows[1]
    assert (tr == BA.GAP).all() and len(qr) == 3


def test_batch_matches_scalar_with_trace(noisy_sim):
    ov = noisy_sim["overlaps"]
    rs = noisy_sim["read_store"]
    from hinge_tpu.data.overlaps import revcomp_codes

    rng = np.random.default_rng(5)
    for k in rng.permutation(ov.n)[:5]:
        k = int(k)
        a_seq = rs.get_bases(int(ov.a_id[k]))
        b_seq = rs.get_bases(int(ov.b_id[k]))
        if ov.rc[k]:
            b_frame = revcomp_codes(b_seq)
            bb = int(ov.b_len[k]) - int(ov.b_end[k])
            be = int(ov.b_len[k]) - int(ov.b_start[k])
        else:
            b_frame = b_seq
            bb, be = int(ov.b_start[k]), int(ov.b_end[k])
        ra, rb = BA.align_with_trace_batch(
            a_seq, b_frame, int(ov.a_start[k]), int(ov.a_end[k]), bb, be,
            ov.trace_pairs(k), tspace=ov.tspace,
        )
        np.testing.assert_array_equal(ra[ra != BA.GAP], a_seq[ov.a_start[k] : ov.a_end[k]])
        np.testing.assert_array_equal(rb[rb != BA.GAP], b_frame[bb:be])
        both = (ra != BA.GAP) & (rb != BA.GAP)
        assert (ra[both] == rb[both]).mean() > 0.9
