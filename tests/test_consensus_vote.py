"""Device consensus-vote kernel vs the numpy tallies oracle, plus the
segment-vectorized vote vs the scalar chop_end walk (consensus.cpp:28-45,
:162-230)."""

import numpy as np
import pytest

from hinge_tpu.ops.consensus_vote import (
    sharded_vote_tallies, vote_tallies_device,
)
from hinge_tpu.stages.consensus import GAP, _vote_pairs_flat, _vote_tallies, chop_end


def _random_rows(rng, n):
    rows_a, rows_b = [], []
    for _ in range(n):
        L = int(rng.choice([0, 3, 50, 180, 210, 215, 240, 600, 3000]))
        ra = rng.integers(0, 5, L).astype(np.uint8)
        if rng.random() < 0.3 and L > 120:
            ra[: rng.integers(90, 115)] = GAP  # leading gaps past the chop
        if rng.random() < 0.1 and L > 0:
            ra[:] = GAP  # fully gapped row
        rows_a.append(ra)
        rows_b.append(rng.integers(0, 5, L).astype(np.uint8))
    return rows_a, rows_b


def _flat(rows_a, rows_b):
    fa = np.concatenate(rows_a) if rows_a else np.zeros(0, np.uint8)
    fb = np.concatenate(rows_b) if rows_b else np.zeros(0, np.uint8)
    sl = np.array([len(r) for r in rows_a], np.int64)
    return fa, fb, sl


def test_vote_pairs_flat_matches_scalar_chop_end():
    rng = np.random.default_rng(0)
    for _ in range(60):
        n = int(rng.integers(1, 12))
        rows_a, rows_b = _random_rows(rng, n)
        pos0 = rng.integers(0, 50, n).astype(np.int64)
        alen = int(rng.integers(200, 800))
        pm_l, bm_l, pi_l, bi_l = [], [], [], []
        for ra, rb, p0 in zip(rows_a, rows_b, pos0):
            ra2, rb2, off = chop_end(ra, rb, 100)
            a_nogap = ra2 != GAP
            pos = int(p0) + off + np.cumsum(a_nogap) - a_nogap
            valid = pos < alen
            m = a_nogap & valid
            pm_l.append(pos[m])
            bm_l.append(rb2[m])
            mi = (~a_nogap) & (rb2 != GAP) & valid
            pi_l.append(pos[mi])
            bi_l.append(rb2[mi])
        fa, fb, sl = _flat(rows_a, rows_b)
        pm, bm, pi, bi = _vote_pairs_flat(fa, fb, sl, pos0, alen)
        np.testing.assert_array_equal(np.concatenate(pm_l), pm)
        np.testing.assert_array_equal(np.concatenate(bm_l), bm)
        np.testing.assert_array_equal(np.concatenate(pi_l), pi)
        np.testing.assert_array_equal(np.concatenate(bi_l), bi)


def test_device_vote_matches_numpy_tallies():
    rng = np.random.default_rng(7)
    for _ in range(8):
        n = int(rng.integers(1, 40))
        rows_a, rows_b = _random_rows(rng, n)
        fa, fb, sl = _flat(rows_a, rows_b)
        pos0 = rng.integers(0, 50, n).astype(np.int64)
        alen = int(rng.integers(200, 3000))
        ref = _vote_tallies(fa, fb, sl, pos0, alen)
        got = vote_tallies_device(fa, fb, sl, pos0, alen,
                                  chunk_cols=4096, alen_bucket=1024)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)


def test_numpy_tallies_chunking_invariant():
    rng = np.random.default_rng(3)
    rows_a, rows_b = _random_rows(rng, 30)
    fa, fb, sl = _flat(rows_a, rows_b)
    pos0 = rng.integers(0, 50, 30).astype(np.int64)
    alen = 2500
    ref = _vote_tallies(fa, fb, sl, pos0, alen)
    got = _vote_tallies(fa, fb, sl, pos0, alen, chunk_cols=1000)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_vote_matches_numpy_tallies(n_dev):
    import jax

    from hinge_tpu.parallel.sharding import make_mesh

    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(11)
    n = 24
    rows_a, rows_b = _random_rows(rng, n)
    fa, fb, sl = _flat(rows_a, rows_b)
    pos0 = rng.integers(0, 50, n).astype(np.int64)
    alen = 2200
    ref = _vote_tallies(fa, fb, sl, pos0, alen)
    got = sharded_vote_tallies(mesh, fa, fb, sl, pos0, alen, alen_bucket=1024)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_native_vote_matches_numpy_tallies():
    from hinge_tpu.stages.consensus import _native_vote_tallies

    rng = np.random.default_rng(11)
    ran = False
    for _ in range(10):
        n = int(rng.integers(1, 60))
        rows_a, rows_b = _random_rows(rng, n)
        fa, fb, sl = _flat(rows_a, rows_b)
        pos0 = rng.integers(0, 50, n).astype(np.int64)
        alen = int(rng.integers(200, 3000))
        ref = _vote_tallies(fa, fb, sl, pos0, alen)
        got = _native_vote_tallies(fa, fb, sl, pos0, alen)
        if got is None:
            pytest.skip("native toolchain unavailable")
        ran = True
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)
    assert ran
