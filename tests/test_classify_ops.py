import numpy as np
import jax.numpy as jnp
import pytest

from hinge_tpu.ops import classify as CL
from tests import oracles as O


def _walk_inputs(ov):
    tw = CL.build_trace_walk(ov)
    seg_id, k_local, point_off = CL.make_point_index(tw.npairs)
    return tw, seg_id, k_local


def _rand_masks(ov, rs, rng):
    """Random effective-read masks per read, gathered per overlap."""
    n_reads = rs.n_reads
    es = (rng.random(n_reads) * 0.2 * rs.length).astype(np.int32)
    ee = rs.length - (rng.random(n_reads) * 0.2 * rs.length).astype(np.int32)
    return es.astype(np.int32), ee.astype(np.int32)


@pytest.mark.parametrize("fixture", ["small_sim", "noisy_sim"])
def test_trim_matches_oracle(fixture, request):
    sim = request.getfixturevalue(fixture)
    ov, rs = sim["overlaps"], sim["read_store"]
    rng = np.random.default_rng(3)
    es, ee = _rand_masks(ov, rs, rng)
    tw, seg_id, k_local = _walk_inputs(ov)

    eff = CL.trim_overlaps(
        jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
        jnp.asarray(ov.b_start), jnp.asarray(ov.b_end), jnp.asarray(ov.rc),
        jnp.asarray(es[ov.a_id]), jnp.asarray(ee[ov.a_id]),
        jnp.asarray(es[ov.b_id]), jnp.asarray(ee[ov.b_id]),
        jnp.asarray(tw.npairs), jnp.asarray(tw.pair_off),
        jnp.asarray(tw.cum), jnp.asarray(seg_id), jnp.asarray(k_local),
        tspace=ov.tspace,
    )
    ams, ame, bms, bme, act = (np.asarray(x) for x in eff)

    idxs = rng.choice(ov.n, size=min(300, ov.n), replace=False)
    for k in idxs:
        k = int(k)
        o = O.trim_overlap_oracle(
            int(ov.a_start[k]), int(ov.a_end[k]), int(ov.b_start[k]), int(ov.b_end[k]),
            int(ov.rc[k]),
            int(es[ov.a_id[k]]), int(ee[ov.a_id[k]]),
            int(es[ov.b_id[k]]), int(ee[ov.b_id[k]]),
            ov.trace_pairs(k), tspace=ov.tspace,
        )
        got = (int(ams[k]), int(ame[k]), int(bms[k]), int(bme[k]), bool(act[k]))
        assert got == o, (k, got, o)


def test_add_types_matches_oracle(small_sim):
    ov, rs = small_sim["overlaps"], small_sim["read_store"]
    rng = np.random.default_rng(9)
    # random effective coords around the raw match (stress every branch)
    n = ov.n
    eams = ov.a_start + rng.integers(0, 200, n)
    eame = ov.a_end - rng.integers(0, 200, n)
    ebms = ov.b_start + rng.integers(0, 200, n)
    ebme = ov.b_end - rng.integers(0, 200, n)
    ears = rng.integers(0, 100, n)
    eare = ov.a_len - rng.integers(0, 100, n)
    ebrs = rng.integers(0, 100, n)
    ebre = ov.b_len - rng.integers(0, 100, n)
    theta, theta2 = 300, 0

    got = np.asarray(
        CL.add_types_asymmetric(
            jnp.asarray(eams), jnp.asarray(eame), jnp.asarray(ebms), jnp.asarray(ebme),
            jnp.asarray(ears), jnp.asarray(eare), jnp.asarray(ebrs), jnp.asarray(ebre),
            jnp.asarray(ov.rc), theta, theta2,
        )
    )
    seen = set()
    for k in range(n):
        o = O.add_types_asymmetric_oracle(
            int(eams[k]), int(eame[k]), int(ebms[k]), int(ebme[k]),
            int(ears[k]), int(eare[k]), int(ebrs[k]), int(ebre[k]),
            int(ov.rc[k]), theta, theta2,
        )
        assert got[k] == o, k
        seen.add(o)
    # the random coords must exercise several branches
    assert len(seen) >= 4, seen


def test_add_types_branch_pins():
    """Handcrafted coords hitting each MatchType branch."""
    # layout: (eams,eame,ebms,ebme, ears,eare,ebrs,ebre, rc) -> type
    cases = [
        # B covered in A's middle reversed roles: A overhangs small both sides
        ((100, 900, 2000, 2800, 0, 1000, 0, 5000, 0), O.BCOVERA),
        # A covers B
        ((2000, 2800, 100, 900, 0, 5000, 0, 1000, 0), O.ACOVERB),
        # internal
        ((2000, 2800, 2000, 2800, 0, 5000, 0, 5000, 0), O.INTERNAL),
        # forward: A right overhang small, B left small, B right big
        ((2000, 4900, 100, 3000, 0, 5000, 0, 5000, 0), O.FORWARD),
        # forward internal: both B overhangs big
        ((2000, 4900, 1000, 3900, 0, 5000, 0, 5000, 0), O.FORWARD_INTERNAL),
        # backward
        ((100, 3000, 2000, 4900, 0, 5000, 0, 5000, 0), O.BACKWARD),
        # backward internal
        ((100, 3000, 1000, 3900, 0, 5000, 0, 5000, 0), O.BACKWARD_INTERNAL),
    ]
    for args, want in cases:
        eams, eame, ebms, ebme, ears, eare, ebrs, ebre, rc = args
        o = O.add_types_asymmetric_oracle(eams, eame, ebms, ebme, ears, eare, ebrs, ebre, rc, 300, 0)
        assert o == want, (args, o, want)
        got = int(
            np.asarray(
                CL.add_types_asymmetric(
                    *(jnp.asarray([v]) for v in (eams, eame, ebms, ebme, ears, eare, ebrs, ebre, rc)),
                    300, 0,
                )
            )[0]
        )
        assert got == want, (args, got, want)


@pytest.mark.parametrize("fixture", ["small_sim", "noisy_sim"])
def test_matching_position_matches_oracle(fixture, request):
    sim = request.getfixturevalue(fixture)
    ov = sim["overlaps"]
    rng = np.random.default_rng(17)
    tw = CL.build_trace_walk(ov)
    m = 400
    ov_idx = rng.integers(0, ov.n, m).astype(np.int32)
    # positions inside, at edges of, and outside the match
    span = ov.a_end[ov_idx] - ov.a_start[ov_idx]
    pos = ov.a_start[ov_idx] + (rng.random(m) * 1.2 * span - 0.1 * span).astype(np.int32)

    got = np.asarray(
        CL.matching_position(
            jnp.asarray(ov_idx), jnp.asarray(pos),
            jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
            jnp.asarray(ov.b_start), jnp.asarray(ov.b_end), jnp.asarray(ov.rc),
            jnp.asarray(tw.npairs), jnp.asarray(tw.pair_off), jnp.asarray(tw.cum),
            tspace=ov.tspace,
        )
    )
    for q in range(m):
        k = int(ov_idx[q])
        o = O.get_matching_position_oracle(
            int(ov.a_start[k]), int(ov.a_end[k]), int(ov.b_start[k]), int(ov.b_end[k]),
            int(ov.rc[k]), ov.trace_pairs(k), int(pos[q]), tspace=ov.tspace,
        )
        assert got[q] == o, (q, k, int(pos[q]), got[q], o)


def test_matching_position_roundtrip(small_sim):
    """For error-free same-strand overlaps the A->B map must be exact:
    matching A and B substrings at mapped positions agree."""
    ov, rs = small_sim["overlaps"], small_sim["read_store"]
    tw = CL.build_trace_walk(ov)
    rng = np.random.default_rng(2)
    checked = 0
    for k in rng.permutation(ov.n)[:200]:
        k = int(k)
        if ov.rc[k]:
            continue
        pos = int((ov.a_start[k] + ov.a_end[k]) // 2)
        got = int(
            np.asarray(
                CL.matching_position(
                    jnp.asarray([k]), jnp.asarray([pos]),
                    jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
                    jnp.asarray(ov.b_start), jnp.asarray(ov.b_end), jnp.asarray(ov.rc),
                    jnp.asarray(tw.npairs), jnp.asarray(tw.pair_off), jnp.asarray(tw.cum),
                    tspace=ov.tspace,
                )
            )[0]
        )
        if got < 0:
            continue
        a = rs.get_bases(int(ov.a_id[k]))
        b = rs.get_bases(int(ov.b_id[k]))
        # 20bp window agreement
        wa = a[pos : pos + 20]
        wb = b[got : got + 20]
        m = min(len(wa), len(wb))
        if m >= 10 and (wa[:m] == wb[:m]).mean() > 0.9:
            checked += 1
    assert checked > 20


@pytest.mark.parametrize("fixture", ["small_sim", "noisy_sim"])
def test_native_trim_matches_lattice(fixture, request):
    """native/sweeps.cpp::trim_overlaps_batch vs the lattice kernel,
    bit-for-bit over whole stores (incl. npairs==0 rows, both strands)."""
    from hinge_tpu.ops.pairs import _native_trim

    sim = request.getfixturevalue(fixture)
    ov, rs = sim["overlaps"], sim["read_store"]
    rng = np.random.default_rng(9)
    es, ee = _rand_masks(ov, rs, rng)
    ears, eare = es[ov.a_id], ee[ov.a_id]
    ebrs, ebre = es[ov.b_id], ee[ov.b_id]
    native = _native_trim(ov, ears, eare, ebrs, ebre, ov.tspace)
    if native is None:
        pytest.skip("native toolchain unavailable")
    tw, seg_id, k_local = _walk_inputs(ov)
    eff = CL.trim_overlaps(
        jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
        jnp.asarray(ov.b_start), jnp.asarray(ov.b_end), jnp.asarray(ov.rc),
        jnp.asarray(ears), jnp.asarray(eare), jnp.asarray(ebrs), jnp.asarray(ebre),
        jnp.asarray(tw.npairs), jnp.asarray(tw.pair_off),
        jnp.asarray(tw.cum), jnp.asarray(seg_id), jnp.asarray(k_local),
        tspace=ov.tspace,
    )
    for got, ref in zip(native, eff):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_add_types_np_matches_device(small_sim):
    ov, rs = small_sim["overlaps"], small_sim["read_store"]
    rng = np.random.default_rng(4)
    es, ee = _rand_masks(ov, rs, rng)
    args = (ov.a_start, ov.a_end, ov.b_start, ov.b_end,
            es[ov.a_id], ee[ov.a_id], es[ov.b_id], ee[ov.b_id],
            ov.rc, 300, -300)
    dev = np.asarray(CL.add_types_asymmetric(*(jnp.asarray(a) if isinstance(a, np.ndarray) else a for a in args)))
    host = CL.add_types_asymmetric_np(*args)
    np.testing.assert_array_equal(dev, host)
