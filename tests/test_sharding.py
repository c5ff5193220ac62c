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
    me, cnt = C.pileup_stats(
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
