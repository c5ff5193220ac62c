"""Multi-device sharded filter step vs single-device kernels (8 virtual CPU
devices from conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hinge_tpu.ops import coverage as C
from hinge_tpu.parallel.sharding import make_mesh, run_sharded_filter


@pytest.fixture(scope="module")
def data(request):
    from hinge_tpu.data.simulator import SimParams, simulate

    p = SimParams(genome_len=50_000, coverage=15.0, seed=5)
    genome, reads, rs, ov = simulate(p)
    sel = ov.a_id != ov.b_id
    return dict(
        a_id=ov.a_id[sel], a_start=ov.a_start[sel], a_end=ov.a_end[sel],
        read_len=rs.length,
    )


def _reference(data, nb, reso=40, cut_off=300, min_cov=5):
    n_reads = len(data["read_len"])
    cov = np.asarray(
        C.profile_coverage(
            jnp.asarray(data["a_id"]), jnp.asarray(data["a_start"]),
            jnp.asarray(data["a_end"]), jnp.int32(0),
            n_reads=n_reads, nb=nb, reso=reso,
        )
    )
    cov_cut = np.asarray(
        C.profile_coverage(
            jnp.asarray(data["a_id"]), jnp.asarray(data["a_start"]),
            jnp.asarray(data["a_end"]), jnp.int32(cut_off),
            n_reads=n_reads, nb=nb, reso=reso,
        )
    )
    me, _ms, cnt = C.pileup_stats(
        jnp.asarray(data["a_id"]), jnp.asarray(data["a_start"]),
        jnp.asarray(data["a_end"]), n_reads=n_reads, nb=1, reso=reso,
    )
    ne_cut = C.n_entries_from_max_event(me - cut_off, cnt, reso)
    ms, mev, _, _ = C.coverage_mask(
        jnp.maximum(jnp.asarray(cov_cut) - min_cov, 0), ne_cut, reso=reso
    )
    return cov, np.asarray(ms), np.asarray(mev)


@pytest.mark.parametrize("n_dev,rec_axis", [(8, 2), (8, 1), (4, 4)])
def test_sharded_matches_single_device(data, n_dev, rec_axis):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_dev, rec_axis=rec_axis)
    n_reads = len(data["read_len"])
    reso = 40
    nb = int(data["read_len"].max()) // reso + 3
    cov_sh, masks_sh, ann_sh, reads_chunk = run_sharded_filter(
        data["a_id"], data["a_start"], data["a_end"], data["read_len"], mesh, nb=nb
    )
    cov_ref, ms_ref, me_ref = _reference(data, nb)
    cov_sh = np.asarray(cov_sh)[:n_reads]
    masks_sh = np.asarray(masks_sh)[:n_reads]
    np.testing.assert_array_equal(cov_sh, cov_ref)
    np.testing.assert_array_equal(masks_sh[:, 0], ms_ref)
    np.testing.assert_array_equal(masks_sh[:, 1], me_ref)


@pytest.fixture(scope="module")
def ovdata():
    from hinge_tpu.data.simulator import SimParams, simulate

    p = SimParams(genome_len=50_000, coverage=12.0, seed=7)
    genome, reads, rs, ov = simulate(p)
    sel = np.nonzero(ov.a_id != ov.b_id)[0]
    ov = ov.take(sel)
    return rs, ov


def _eff_masks(rs):
    lo = rs.length // 10
    return lo.astype(np.int32), (rs.length - lo).astype(np.int32)


@pytest.mark.parametrize("n_dev,rec_axis", [(8, 2), (8, 1), (4, 1)])
def test_sharded_classify_matches_single_device(ovdata, n_dev, rec_axis):
    from hinge_tpu.ops.pairs import process_alignments, top_k_per_pair
    from hinge_tpu.ops import classify as CL
    from hinge_tpu.parallel.sharding import run_sharded_classify

    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    rs, ov = ovdata
    eff_s, eff_e = _eff_masks(rs)
    rows = top_k_per_pair(ov, 2)
    ref = process_alignments(ov, rows, eff_s, eff_e, 400, 300, 600, trim=True)

    sub = ov.take(rows)
    tw = CL.build_trace_walk(sub)
    mesh = make_mesh(n_dev, rec_axis=rec_axis)
    eams, eame, ebms, ebme, active, mtype = run_sharded_classify(
        sub.a_start, sub.a_end, sub.b_start, sub.b_end, sub.rc,
        eff_s[sub.a_id], eff_e[sub.a_id], eff_s[sub.b_id], eff_e[sub.b_id],
        tw, mesh, tspace=ov.tspace, aln_threshold=400, theta=300, theta2=600,
    )
    np.testing.assert_array_equal(eams, ref.eff_a_match_start)
    np.testing.assert_array_equal(eame, ref.eff_a_match_end)
    np.testing.assert_array_equal(ebms, ref.eff_b_match_start)
    np.testing.assert_array_equal(ebme, ref.eff_b_match_end)
    np.testing.assert_array_equal(active, ref.active)
    np.testing.assert_array_equal(mtype, ref.match_type)


@pytest.mark.parametrize("n_dev", [8, 4])
def test_sharded_matching_position_matches(ovdata, n_dev):
    import jax.numpy as jnp
    from hinge_tpu.ops import classify as CL
    from hinge_tpu.parallel.sharding import run_sharded_matching_position

    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    rs, ov = ovdata
    tw = CL.build_trace_walk(ov)
    rng = np.random.default_rng(3)
    nq = 512
    ov_idx = rng.integers(0, ov.n, nq).astype(np.int32)
    frac = rng.random(nq)
    pos = (ov.a_start[ov_idx] + frac * (ov.a_end[ov_idx] - ov.a_start[ov_idx])).astype(np.int32)
    ref = np.asarray(
        CL.matching_position(
            jnp.asarray(ov_idx), jnp.asarray(pos),
            jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
            jnp.asarray(ov.b_start), jnp.asarray(ov.b_end), jnp.asarray(ov.rc),
            jnp.asarray(tw.npairs), jnp.asarray(tw.pair_off), jnp.asarray(tw.cum),
            tspace=ov.tspace,
        )
    )
    mesh = make_mesh(n_dev)
    got = run_sharded_matching_position(
        ov_idx, pos, ov.a_start, ov.a_end, ov.b_start, ov.b_end, ov.rc,
        tw, mesh, tspace=ov.tspace,
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_top_k_matches_global(ovdata, n_shards):
    from hinge_tpu.ops.pairs import top_k_per_pair
    from hinge_tpu.parallel.sharding import sharded_top_k_per_pair

    _, ov = ovdata
    ref = top_k_per_pair(ov, 2)
    got = sharded_top_k_per_pair(ov, 2, n_shards)
    np.testing.assert_array_equal(got, ref)
