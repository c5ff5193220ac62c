"""Pallas TPU kernel for pileup coverage.

The XLA path (ops/coverage.py) expresses profileCoverage as a scatter-add +
cumsum; XLA lowers scatter to serialized updates on TPU.  This kernel uses
the MXU instead: an event block's (read, bin) contributions are two one-hot
matrices, and the (reads x bins) grid update is their int8 matmul —

    grid += onehot(read)^T  @  (onehot(start_bin) - onehot(end_bin))

which the 128x128 systolic array executes at full rate.  The grid revisits
the same output block across the event-block grid dimension, accumulating in
VMEM; the final bin-axis cumsum stays in XLA (one fused pass).

Shapes: event blocks of EB=1024, read blocks R (multiple of 8), bins NB+1
(padded to 128 lanes).  Padded events point at read row R (dropped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 1024  # events per block


def _kernel(rel_ref, sb_ref, eb_ref, out_ref):
    rel = rel_ref[0, :]  # (EB,) int32
    sb = sb_ref[0, :]
    eb = eb_ref[0, :]
    R = out_ref.shape[0]
    NB1 = out_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (EB, R), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (EB, NB1), 1)
    oh_rel = (rel[:, None] == rows).astype(jnp.int8)
    evt = (sb[:, None] == cols).astype(jnp.int8) - (eb[:, None] == cols).astype(jnp.int8)
    contrib = jax.lax.dot_general(
        oh_rel, evt,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(pl.program_id(0) != 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


@functools.partial(jax.jit, static_argnames=("n_reads", "nb", "reso", "interpret"))
def profile_coverage_pallas(
    a_rel: jnp.ndarray,  # int32 [n_ov] (pad rows -> n_reads)
    a_start: jnp.ndarray,
    a_end: jnp.ndarray,
    cutoff: jnp.ndarray,
    *,
    n_reads: int,
    nb: int,
    reso: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.coverage.profile_coverage (same semantics/tests)."""
    from hinge_tpu.ops.coverage import event_bins

    n_ov = a_rel.shape[0]
    n_blocks = -(-n_ov // EB)
    pad = n_blocks * EB - n_ov
    R = -(-(n_reads + 1) // 8) * 8  # sublane multiple; row n_reads = dropped
    NB1 = -(-(nb + 1) // 128) * 128  # lane multiple; col nb = clip bucket

    rel = jnp.pad(a_rel, (0, pad), constant_values=n_reads).reshape(n_blocks, EB)
    sb = event_bins(a_start + cutoff, reso, nb)
    ebv = event_bins(a_end - cutoff, reso, nb)
    sb = jnp.pad(sb, (0, pad), constant_values=nb).reshape(n_blocks, EB)
    ebv = jnp.pad(ebv, (0, pad), constant_values=nb).reshape(n_blocks, EB)

    grid_out = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, EB), lambda i: (i, 0)),
            pl.BlockSpec((1, EB), lambda i: (i, 0)),
            pl.BlockSpec((1, EB), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((R, NB1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, NB1), jnp.int32),
        interpret=interpret,
    )(rel, sb, ebv)

    grid_out = grid_out[:n_reads, :nb]
    return jnp.cumsum(grid_out, axis=1, dtype=jnp.int32)
