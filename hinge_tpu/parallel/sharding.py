"""Multi-chip sharding of the filter-stage kernels.

The reference's only parallelism notion is `.las` partitioning by A-read id
(--mlas, filter.cpp:35-63) on one host.  The TPU-native design shards the
same way but across a device mesh (SURVEY.md §2.3):

    mesh axes:  ('reads', 'recs')
      reads — data-parallel over contiguous A-read ranges (the --mlas axis)
      recs  — parallel over overlap records *within* a read range

Each device scatter-adds its record shard into a local (reads_chunk, bins)
grid; a `psum` over 'recs' merges the partial pileups (the scatter-add is
associative); the bin-axis cumsum, mask runs, and repeat annotation then run
data-parallel over 'reads' with no further communication.  The per-read mask
table — needed globally for B-side overhang lookups during hinge calling —
is `all_gather`ed over 'reads' at the end.  All collectives ride ICI;
nothing else crosses shard boundaries.

Works identically on a real TPU mesh and on the CPU backend with
`--xla_force_host_platform_device_count` virtual devices.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hinge_tpu.ops import coverage as C


def make_mesh(n_devices: Optional[int] = None, rec_axis: Optional[int] = None) -> Mesh:
    """2D ('reads', 'recs') mesh over the available devices."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    if rec_axis is None:
        # favor the reads axis; use a recs axis when n has a factor of 2
        rec_axis = 2 if n % 2 == 0 and n > 2 else 1
    reads_axis = n // rec_axis
    mesh_devs = np.array(devs[:n]).reshape(reads_axis, rec_axis)
    return Mesh(mesh_devs, ("reads", "recs"))


def shard_records(
    a_id: np.ndarray,
    a_start: np.ndarray,
    a_end: np.ndarray,
    n_reads: int,
    mesh: Mesh,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Partition records into (reads_shards, recs_shards, pad) blocks.

    Records go to the reads-shard owning their A read (contiguous read
    ranges), then round-robin over recs-shards; every block is padded to the
    max block size with sentinel rows (a_rel = reads_chunk, dropped by the
    kernels' scatter mode='drop').  Returns (a_rel, a_start, a_end) with
    shape (R, S, pad) plus the per-shard read-chunk size.
    """
    R = mesh.shape["reads"]
    S = mesh.shape["recs"]
    reads_chunk = -(-n_reads // R)
    shard_of_read = np.minimum(a_id // reads_chunk, R - 1)
    blocks = [[None] * S for _ in range(R)]
    maxlen = 1
    for r in range(R):
        rows = np.nonzero(shard_of_read == r)[0]
        for s in range(S):
            sel = rows[s::S]
            blocks[r][s] = sel
            maxlen = max(maxlen, len(sel))
    a_rel = np.full((R, S, maxlen), reads_chunk, dtype=np.int32)  # pad row
    a_s = np.zeros((R, S, maxlen), dtype=np.int32)
    a_e = np.zeros((R, S, maxlen), dtype=np.int32)
    for r in range(R):
        base = r * reads_chunk
        for s in range(S):
            sel = blocks[r][s]
            a_rel[r, s, : len(sel)] = a_id[sel] - base
            a_s[r, s, : len(sel)] = a_start[sel]
            a_e[r, s, : len(sel)] = a_end[sel]
    return a_rel, a_s, a_e, reads_chunk


def sharded_filter_step(
    mesh: Mesh,
    *,
    reads_chunk: int,
    nb: int,
    reso: int = 40,
    cut_off: int = 300,
    min_cov: int = 5,
    coverage_fraction: int = 3,
    min_thresh: int = 10,
    max_thresh: int = 20,
    no_hinge_region: int = 500,
):
    """Build the jitted multi-chip filter step.

    Input arrays have shape (R, S, pad) sharded P('reads','recs'); read
    tables (lengths) have shape (R, reads_chunk) sharded P('reads').
    Returns (coverage [reads sharded], masks [replicated], annotations
    [reads sharded]).
    """

    def local_grid(a_rel, a_start, a_end, cutoff):
        sb = C.event_bins(a_start + cutoff, reso, nb)
        eb = C.event_bins(a_end - cutoff, reso, nb)
        grid = jnp.zeros(((reads_chunk + 1) * (nb + 1),), dtype=jnp.int32)
        grid = grid.at[a_rel * (nb + 1) + sb].add(1, mode="drop")
        grid = grid.at[a_rel * (nb + 1) + eb].add(-1, mode="drop")
        return grid.reshape(reads_chunk + 1, nb + 1)[:reads_chunk, :nb]

    def step(a_rel, a_start, a_end, read_len):
        # block-local views (shard_map passes per-device blocks)
        a_rel = a_rel.reshape(-1)
        a_start = a_start.reshape(-1)
        a_end = a_end.reshape(-1)
        read_len = read_len.reshape(-1)

        # partial pileup grids + psum over the record axis
        g0 = local_grid(a_rel, a_start, a_end, 0)
        gc = local_grid(a_rel, a_start, a_end, cut_off)
        g0 = jax.lax.psum(g0, "recs")
        gc = jax.lax.psum(gc, "recs")
        cov = jnp.cumsum(g0, axis=1, dtype=jnp.int32)
        cov_cut = jnp.cumsum(gc, axis=1, dtype=jnp.int32)

        # per-read n_entries from the psum'd record stats
        me = jnp.zeros((reads_chunk + 1,), dtype=jnp.int32).at[a_rel].max(
            a_end, mode="drop"
        )[:reads_chunk]
        cnt = jnp.zeros((reads_chunk + 1,), dtype=jnp.int32).at[a_rel].add(
            1, mode="drop"
        )[:reads_chunk]
        me = jax.lax.pmax(me, "recs")
        cnt = jax.lax.psum(cnt, "recs")
        ne = C.n_entries_from_max_event(me, cnt, reso)
        ne_cut = C.n_entries_from_max_event(me - cut_off, cnt, reso)

        reduced = jnp.maximum(cov_cut - min_cov, 0)
        ms, mev, _, _ = C.coverage_mask(reduced, ne_cut, reso=reso)
        masks = jnp.stack([ms, mev], axis=1)

        ann = C.repeat_annotation_mask(
            cov, ne, ms, mev, jnp.int32(min_cov),
            reso=reso, coverage_fraction=coverage_fraction,
            min_thresh=min_thresh, max_thresh=max_thresh,
            no_hinge_region=no_hinge_region,
        )
        # global mask table for B-side overhang lookups (hinge calling)
        all_masks = jax.lax.all_gather(masks, "reads", axis=0, tiled=True)
        return cov, all_masks, ann

    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P("reads", "recs"), P("reads", "recs"), P("reads", "recs"), P("reads")),
        out_specs=(P("reads"), P(None), P("reads")),
        check_vma=False,
    )
    return jax.jit(fn)


def run_sharded_filter(
    a_id: np.ndarray,
    a_start: np.ndarray,
    a_end: np.ndarray,
    read_len: np.ndarray,
    mesh: Mesh,
    nb: Optional[int] = None,
    **params,
):
    """Host-side wrapper: shard, place, and execute one filter step."""
    n_reads = len(read_len)
    reso = params.get("reso", 40)
    if nb is None:
        nb = int(read_len.max()) // reso + 3
    a_rel, a_s, a_e, reads_chunk = shard_records(a_id, a_start, a_end, n_reads, mesh)
    R = mesh.shape["reads"]
    pad_reads = R * reads_chunk - n_reads
    rl = np.concatenate([read_len, np.zeros(pad_reads, read_len.dtype)]).reshape(
        R, reads_chunk
    )
    step = sharded_filter_step(mesh, reads_chunk=reads_chunk, nb=nb, **params)
    sh3 = NamedSharding(mesh, P("reads", "recs"))
    sh1 = NamedSharding(mesh, P("reads"))
    args = (
        jax.device_put(a_rel, sh3),
        jax.device_put(a_s, sh3),
        jax.device_put(a_e, sh3),
        jax.device_put(rl, sh1),
    )
    cov, masks, ann = step(*args)
    return cov, masks, ann, reads_chunk
