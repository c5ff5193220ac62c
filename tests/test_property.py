"""Property-based kernel tests (SURVEY.md §5: "add property tests").

The per-kernel oracle tests pin fixed seeds; these sweep RANDOMIZED
adversarial inputs — empty pileups, zero/negative-width clipped events,
reads with no overlaps, tspace-boundary match coordinates, zero
displacements, degenerate masks — and assert the vectorized device kernels
still match the scalar reference transcriptions (tests/oracles.py)
element for element.  Each case set is regenerated from a fresh seed per
run-invariant parametrization, so regressions in rare branches surface.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hinge_tpu.ops import classify as CL
from hinge_tpu.ops import coverage as C
from tests import oracles as O


def _rand_trace(rng, a_start, a_end, b_start, b_end, rc, tspace):
    """Consistent DALIGNER-style trace pairs for a match (displacements sum
    to the B span; includes zero-displacement pairs)."""
    npairs = max((a_end - 1) // tspace - a_start // tspace + 1, 1)
    span = b_end - b_start
    cuts = np.sort(rng.integers(0, span + 1, npairs - 1)) if npairs > 1 else np.array([], np.int64)
    bounds = np.concatenate([[0], cuts, [span]])
    disp = np.diff(bounds)
    tp = np.zeros((npairs, 2), dtype=np.int64)
    tp[:, 1] = disp
    return tp


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_profile_coverage_matches_oracle_adversarial(seed):
    rng = np.random.default_rng(100 + seed)
    reso, cutoff = 40, int(rng.integers(0, 400))
    n_reads = 12
    cases = []
    for r in range(n_reads):
        k = int(rng.integers(0, 6))  # includes reads with NO overlaps
        if k == 0:
            cases.append((np.zeros(0, np.int64), np.zeros(0, np.int64)))
            continue
        s = rng.integers(0, 3000, k)
        # adversarial spans: zero-width, shorter than 2*cutoff (negative
        # clipped span), exact reso multiples
        e = s + rng.choice([0, 1, reso, 2 * cutoff, 2 * cutoff + 1, 977], k)
        cases.append((s.astype(np.int64), e.astype(np.int64)))
    a_rel = np.concatenate(
        [np.full(len(s), r, np.int32) for r, (s, e) in enumerate(cases)]
    ) if any(len(s) for s, _ in cases) else np.zeros(0, np.int32)
    s_all = np.concatenate([s for s, _ in cases]).astype(np.int32)
    e_all = np.concatenate([e for _, e in cases]).astype(np.int32)
    nb = int(max(e_all.max(initial=0) + reso, reso)) // reso + 3
    cov = np.asarray(
        C.profile_coverage(
            jnp.asarray(a_rel), jnp.asarray(s_all), jnp.asarray(e_all),
            jnp.int32(cutoff), n_reads=n_reads, nb=nb, reso=reso,
        )
    )
    me, mst, cnt = C.pileup_stats(
        jnp.asarray(a_rel), jnp.asarray(s_all), jnp.asarray(e_all),
        n_reads=n_reads, nb=1, reso=reso,
    )
    ne = np.asarray(C.n_entries_from_max_event(
        jnp.maximum(np.asarray(me) - cutoff, np.asarray(mst) + cutoff),
        cnt, reso))
    for r, (s, e) in enumerate(cases):
        want = O.profile_coverage_oracle(s, e, reso, cutoff)
        if len(s) == 0:
            assert ne[r] == 0
            continue
        # oracle bin count = floor(max event of EITHER kind / reso) + 2
        assert len(want) == ne[r], (r, len(want), ne[r])
        got = cov[r, : len(want)]
        np.testing.assert_array_equal(got, [c for _, c in want], err_msg=f"read {r}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_trim_and_types_match_oracle_adversarial(seed):
    rng = np.random.default_rng(200 + seed)
    tspace = 100
    N = 250
    rows = []
    for _ in range(N):
        alen = int(rng.integers(200, 4000))
        blen = int(rng.integers(200, 4000))
        # boundary-adversarial coords: multiples of tspace, off-by-one
        a0 = int(rng.choice([0, 1, tspace - 1, tspace, 2 * tspace,
                             rng.integers(0, alen - 1)]))
        a0 = min(a0, alen - 2)
        a1 = int(min(alen, a0 + rng.choice([1, tspace, tspace + 1,
                                            rng.integers(1, alen - a0)])))
        b0 = int(rng.integers(0, blen - 1))
        b1 = int(min(blen, b0 + rng.integers(1, blen - b0 + 1)))
        rc = int(rng.integers(0, 2))
        tp = _rand_trace(rng, a0, a1, b0, b1, rc, tspace)
        # degenerate masks: empty, full, inverted-ish slivers
        eas, eae = sorted(rng.integers(0, alen + 1, 2).tolist())
        ebs, ebe = sorted(rng.integers(0, blen + 1, 2).tolist())
        rows.append((a0, a1, b0, b1, rc, alen, blen, eas, eae, ebs, ebe, tp))

    from hinge_tpu.data.overlaps import OverlapStore

    tlen = np.array([2 * len(r[11]) for r in rows], np.int32)
    trace = np.concatenate([
        np.stack([np.zeros(len(r[11]), np.uint16),
                  r[11][:, 1].astype(np.uint16)], axis=1).reshape(-1)
        for r in rows
    ])
    ov = OverlapStore.from_arrays(
        tspace=tspace,
        a_id=np.zeros(N, np.int32), b_id=np.zeros(N, np.int32),
        a_len=np.array([r[5] for r in rows], np.int32),
        b_len=np.array([r[6] for r in rows], np.int32),
        a_start=np.array([r[0] for r in rows], np.int32),
        a_end=np.array([r[1] for r in rows], np.int32),
        b_start=np.array([r[2] for r in rows], np.int32),
        b_end=np.array([r[3] for r in rows], np.int32),
        rc=np.array([r[4] for r in rows], np.int32),
        diffs=np.zeros(N, np.int32), tlen=tlen, trace=trace,
    )
    tw = CL.build_trace_walk(ov)
    seg_id, k_local, _ = CL.make_point_index(tw.npairs)
    eas = np.array([r[7] for r in rows], np.int32)
    eae = np.array([r[8] for r in rows], np.int32)
    ebs = np.array([r[9] for r in rows], np.int32)
    ebe = np.array([r[10] for r in rows], np.int32)
    ams, ame, bms, bme, act = (
        np.asarray(x) for x in CL.trim_overlaps(
            jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
            jnp.asarray(ov.b_start), jnp.asarray(ov.b_end), jnp.asarray(ov.rc),
            jnp.asarray(eas), jnp.asarray(eae), jnp.asarray(ebs), jnp.asarray(ebe),
            jnp.asarray(tw.npairs), jnp.asarray(tw.pair_off), jnp.asarray(tw.cum),
            jnp.asarray(seg_id), jnp.asarray(k_local), tspace=tspace,
        )
    )
    theta, theta2 = 300, 600
    types = np.asarray(CL.add_types_asymmetric(
        jnp.asarray(ams), jnp.asarray(ame), jnp.asarray(bms), jnp.asarray(bme),
        jnp.asarray(eas), jnp.asarray(eae), jnp.asarray(ebs), jnp.asarray(ebe),
        jnp.asarray(ov.rc), theta, theta2,
    ))
    for i, r in enumerate(rows):
        o = O.trim_overlap_oracle(
            r[0], r[1], r[2], r[3], r[4], r[7], r[8], r[9], r[10], r[11],
            tspace=tspace,
        )
        assert (ams[i], ame[i], bms[i], bme[i], bool(act[i])) == o, (i, r[:5])
        ot = O.add_types_asymmetric_oracle(
            o[0], o[1], o[2], o[3], r[7], r[8], r[9], r[10], r[4],
            theta, theta2,
        )
        assert types[i] == ot, (i, types[i], ot)


@pytest.mark.parametrize("seed", [0, 1])
def test_matching_position_matches_oracle_boundaries(seed):
    rng = np.random.default_rng(300 + seed)
    tspace = 100
    N = 150
    from hinge_tpu.data.overlaps import OverlapStore

    rows = []
    for _ in range(N):
        a0 = int(rng.integers(0, 500))
        a1 = a0 + int(rng.integers(1, 2500))
        b0 = int(rng.integers(0, 500))
        b1 = b0 + int(rng.integers(1, 2500))
        rc = int(rng.integers(0, 2))
        tp = _rand_trace(rng, a0, a1, b0, b1, rc, tspace)
        rows.append((a0, a1, b0, b1, rc, tp))
    tlen = np.array([2 * len(r[5]) for r in rows], np.int32)
    trace = np.concatenate([
        np.stack([np.zeros(len(r[5]), np.uint16),
                  r[5][:, 1].astype(np.uint16)], axis=1).reshape(-1)
        for r in rows
    ])
    ov = OverlapStore.from_arrays(
        tspace=tspace,
        a_id=np.zeros(N, np.int32), b_id=np.zeros(N, np.int32),
        a_len=np.full(N, 4000, np.int32), b_len=np.full(N, 4000, np.int32),
        a_start=np.array([r[0] for r in rows], np.int32),
        a_end=np.array([r[1] for r in rows], np.int32),
        b_start=np.array([r[2] for r in rows], np.int32),
        b_end=np.array([r[3] for r in rows], np.int32),
        rc=np.array([r[4] for r in rows], np.int32),
        diffs=np.zeros(N, np.int32), tlen=tlen, trace=trace,
    )
    tw = CL.build_trace_walk(ov)
    # boundary positions: a_start, a_end, lattice multiples, outside range
    q_idx, q_pos = [], []
    for i, r in enumerate(rows):
        a0, a1 = r[0], r[1]
        picks = [a0, a1, a0 - 1, a1 + 1,
                 (a0 // tspace + 1) * tspace, (a0 // tspace + 1) * tspace - 1,
                 int(rng.integers(a0, a1 + 1))]
        for p in picks:
            q_idx.append(i)
            q_pos.append(p)
    q_idx = np.array(q_idx, np.int32)
    q_pos = np.array(q_pos, np.int32)
    got = np.asarray(CL.matching_position(
        jnp.asarray(q_idx), jnp.asarray(q_pos),
        jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
        jnp.asarray(ov.b_start), jnp.asarray(ov.b_end), jnp.asarray(ov.rc),
        jnp.asarray(tw.npairs), jnp.asarray(tw.pair_off), jnp.asarray(tw.cum),
        tspace=tspace,
    ))
    for k in range(len(q_idx)):
        i = int(q_idx[k])
        r = rows[i]
        want = O.get_matching_position_oracle(
            r[0], r[1], r[2], r[3], r[4], r[5], int(q_pos[k]), tspace=tspace
        )
        assert got[k] == want, (k, i, int(q_pos[k]), got[k], want)
