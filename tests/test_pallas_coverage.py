"""Pallas MXU coverage kernel vs the XLA scatter path (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hinge_tpu.ops.coverage import profile_coverage
from hinge_tpu.ops.pallas_coverage import profile_coverage_pallas


@pytest.mark.parametrize("cutoff", [0, 300])
def test_pallas_matches_xla(cutoff):
    rng = np.random.default_rng(1)
    n_reads, nb, reso = 150, 260, 40
    n_ov = 5000
    a_rel = rng.integers(0, n_reads, n_ov).astype(np.int32)
    a_s = rng.integers(0, 8000, n_ov).astype(np.int32)
    a_e = (a_s + rng.integers(400, 3000, n_ov)).astype(np.int32)
    ref = np.asarray(
        profile_coverage(
            jnp.asarray(a_rel), jnp.asarray(a_s), jnp.asarray(a_e),
            jnp.int32(cutoff), n_reads=n_reads, nb=nb, reso=reso,
        )
    )
    got = np.asarray(
        profile_coverage_pallas(
            jnp.asarray(a_rel), jnp.asarray(a_s), jnp.asarray(a_e),
            jnp.int32(cutoff), n_reads=n_reads, nb=nb, reso=reso, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_pallas_sim_data(small_sim):
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    n_reads = rs.n_reads
    reso = 40
    nb = int(rs.length.max()) // reso + 3
    ref = np.asarray(
        profile_coverage(
            jnp.asarray(ov.a_id), jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
            jnp.int32(0), n_reads=n_reads, nb=nb, reso=reso,
        )
    )
    got = np.asarray(
        profile_coverage_pallas(
            jnp.asarray(ov.a_id), jnp.asarray(ov.a_start), jnp.asarray(ov.a_end),
            jnp.int32(0), n_reads=n_reads, nb=nb, reso=reso, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, ref)
