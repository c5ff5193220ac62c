"""Worker process for the 2-process multi-host test (tests/test_multihost.py).

Each process contributes 2 virtual CPU devices (4 global), initializes
jax.distributed via parallel.distributed.init_distributed, builds the global
('reads','recs') mesh over ALL processes' devices, places its addressable
shards of the record stream, and runs the sharded filter step — whose
psum/pmax/all_gather collectives then cross the process boundary.  The
replicated mask output is checked against the single-device kernels.

Usage: multihost_worker.py <process_id> <num_processes> <port>
"""

import sys

import numpy as np


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    from hinge_tpu.parallel.distributed import host_read_range, init_distributed

    pi, pc = init_distributed(f"127.0.0.1:{port}", nproc, proc_id)
    assert (pi, pc) == (proc_id, nproc), (pi, pc)
    devs = jax.devices()
    assert len(devs) == 2 * nproc, f"global devices: {len(devs)}"

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hinge_tpu.ops import coverage as C
    from hinge_tpu.parallel.sharding import shard_records, sharded_filter_step

    # deterministic dataset, identical on every process
    rng = np.random.default_rng(42)
    n_reads, n_ov, maxlen, reso = 32, 512, 4000, 40
    a_id = np.sort(rng.integers(0, n_reads, n_ov)).astype(np.int32)
    read_len = rng.integers(maxlen // 2, maxlen, n_reads).astype(np.int32)
    lo = rng.integers(0, maxlen // 2, n_ov)
    span = rng.integers(1000, maxlen // 2, n_ov)
    a_start = lo.astype(np.int32)
    a_end = np.minimum(lo + span, read_len[a_id]).astype(np.int32)
    nb = maxlen // reso + 3

    mesh = Mesh(np.array(devs).reshape(2 * nproc, 1), ("reads", "recs"))
    a_rel, a_s, a_e, reads_chunk = shard_records(a_id, a_start, a_end, n_reads, mesh)
    R = mesh.shape["reads"]
    rl = np.concatenate(
        [read_len, np.zeros(R * reads_chunk - n_reads, read_len.dtype)]
    ).reshape(R, reads_chunk)

    step = sharded_filter_step(mesh, reads_chunk=reads_chunk, nb=nb)
    sh3 = NamedSharding(mesh, P("reads", "recs"))
    sh1 = NamedSharding(mesh, P("reads"))

    def place(arr, sh):
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    cov, masks, ann = step(place(a_rel, sh3), place(a_s, sh3), place(a_e, sh3),
                           place(rl, sh1))
    masks = np.asarray(masks)  # out-spec P(None): replicated, addressable

    # single-device reference (pure kernels, this process only)
    cov_cut = np.asarray(
        C.profile_coverage(
            jnp.asarray(a_id), jnp.asarray(a_start), jnp.asarray(a_end),
            jnp.int32(300), n_reads=n_reads, nb=nb, reso=reso,
        )
    )
    me, _ms, cnt = C.pileup_stats(
        jnp.asarray(a_id), jnp.asarray(a_start), jnp.asarray(a_end),
        n_reads=n_reads, nb=1, reso=reso,
    )
    ne_cut = C.n_entries_from_max_event(me - 300, cnt, reso)
    ms, mev, _, _ = C.coverage_mask(
        jnp.maximum(jnp.asarray(cov_cut) - 5, 0), ne_cut, reso=reso
    )
    np.testing.assert_array_equal(masks[:n_reads, 0], np.asarray(ms))
    np.testing.assert_array_equal(masks[:n_reads, 1], np.asarray(mev))

    lo_r, hi_r = host_read_range(n_reads, proc_id, nproc)
    assert 0 <= lo_r < hi_r <= n_reads
    print(f"MULTIHOST_OK {proc_id}/{nproc} devices={len(devs)} "
          f"range=[{lo_r},{hi_r})")


if __name__ == "__main__":
    main()
