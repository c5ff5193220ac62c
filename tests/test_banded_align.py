import numpy as np
import pytest

from hinge_tpu.ops import banded_align as BND
from hinge_tpu.ops import batch_align as BA


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


def test_banded_identity():
    rng = np.random.default_rng(0)
    qs = [rng.integers(0, 4, rng.integers(500, 1000)).astype(np.uint8) for _ in range(8)]
    rows = BND.align_batch_banded(qs, [q.copy() for q in qs])
    for q, (qr, tr) in zip(qs, rows):
        np.testing.assert_array_equal(qr, q)
        np.testing.assert_array_equal(tr, q)


def test_banded_consumes_everything():
    rng = np.random.default_rng(1)
    qs, ts = [], []
    for _ in range(16):
        t = rng.integers(0, 4, 900).astype(np.uint8)
        q = _mutate(rng, t, 0.02, 0.01, 0.01)
        qs.append(q)
        ts.append(t)
    rows = BND.align_batch_banded(qs, ts)
    for q, t, (qr, tr) in zip(qs, ts, rows):
        assert len(qr) == len(tr)
        np.testing.assert_array_equal(qr[qr != BND.GAP], q)
        np.testing.assert_array_equal(tr[tr != BND.GAP], t)
        both = (qr != BND.GAP) & (tr != BND.GAP)
        assert (qr[both] == tr[both]).mean() > 0.95


def test_banded_matches_full_cost():
    """Banded cost must equal the unbanded optimum when within band."""
    rng = np.random.default_rng(2)
    for _ in range(5):
        t = rng.integers(0, 4, 120).astype(np.uint8)
        q = _mutate(rng, t, 0.05, 0.02, 0.02)[:128]
        (qr_b, tr_b), = BND.align_batch_banded([q], [t], w=128, band=64)
        (qr_f, tr_f), = BA.align_batch([q], [t], w=128)
        cost_b = int(((qr_b == BND.GAP) | (tr_b == BND.GAP) | (qr_b != tr_b)).sum())
        cost_f = int(((qr_f == BA.GAP) | (tr_f == BA.GAP) | (qr_f != tr_f)).sum())
        assert cost_b == cost_f, (cost_b, cost_f)


def test_banded_high_error_falls_back():
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 800).astype(np.uint8)
    q = rng.integers(0, 4, 820).astype(np.uint8)  # unrelated -> dist >> band
    (qr, tr), = BND.align_batch_banded([q], [t], band=32)
    np.testing.assert_array_equal(qr[qr != BND.GAP], q)
    np.testing.assert_array_equal(tr[tr != BND.GAP], t)
