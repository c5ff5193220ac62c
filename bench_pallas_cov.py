"""Measure ops/pallas_coverage (MXU one-hot matmul pileup) vs the XLA
scatter path on the real TPU — promote-or-delete evidence (r2 weak #4).

  python bench_pallas_cov.py
"""
import os
import time

_HERE = os.path.dirname(os.path.abspath(__file__))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import MAXLEN, N_OV, N_READS, RESO, synth  # noqa: E402
from hinge_tpu.ops import coverage as C  # noqa: E402
from hinge_tpu.ops.pallas_coverage import profile_coverage_pallas  # noqa: E402

a_id, a_start, a_end, read_len = synth()
nb = MAXLEN // RESO + 3
args = (jnp.asarray(a_id), jnp.asarray(a_start), jnp.asarray(a_end))
print(f"backend={jax.default_backend()} records={N_OV} reads={N_READS} nb={nb}",
      flush=True)


def timeit(f, tag):
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(f())
    probe = time.perf_counter() - t0
    iters = max(3, int(1.0 / max(probe, 1e-4)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e3:8.2f} ms  ({N_OV/dt/1e9:.2f}G records/s)", flush=True)
    return out, dt


xla, t_x = timeit(
    lambda: C.profile_coverage(*args, jnp.int32(0),
                               n_reads=N_READS, nb=nb, reso=RESO), "xla scatter")
plp, t_p = timeit(
    lambda: profile_coverage_pallas(*args, jnp.int32(0),
                                    n_reads=N_READS, nb=nb, reso=RESO),
    "pallas mxu ")
print("equal:", bool(jnp.array_equal(xla, plp)),
      f" pallas/xla speed: {t_x/t_p:.2f}x", flush=True)
