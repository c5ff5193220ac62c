"""Benchmark: the BASELINE.md north-star metrics in one JSON line.

Primary metric — overlap-pileup records/s/chip: the pileup-scoring inner
loop (profile coverage x2 + n_entries + masks + repeat annotation — the hot
path of `Reads_filter`, filter.cpp:585-829) over a large synthetic overlap
batch.  vs_baseline compares against a vectorized-numpy implementation of
the same computation standing in for the reference's scalar C++ event
loops (conservative: the numpy baseline is itself vectorized; note it runs
on this host's 2 vCPUs).

Extra keys (BASELINE.md rows 2 and 4):
  e2e     — FASTA→consensus `assemble()` wall-clock on the ecoli-scale
            synthetic workload (4.6Mb genome, 30x), with the per-stage
            breakdown from the pipeline's stage timers and the longest
            contig / genome reconstruction fraction.
  scaling — records/s of the SHARDED filter step at 1/2/4/8 devices
            (virtual CPU mesh via xla_force_host_platform_device_count;
            on real multi-chip hardware the same code path applies) plus
            host vCPU count for honest interpretation.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

import numpy as np

N_READS = 16_384
N_OV = 2_000_000
MAXLEN = 30_000
RESO = 40
CUT_OFF = 300
MIN_COV = 5


def synth(seed=0):
    rng = np.random.default_rng(seed)
    a_id = np.sort(rng.integers(0, N_READS, N_OV)).astype(np.int32)
    read_len = rng.integers(MAXLEN // 2, MAXLEN, N_READS).astype(np.int32)
    lo = rng.integers(0, MAXLEN // 2, N_OV)
    span = rng.integers(1000, MAXLEN // 2, N_OV)
    a_start = lo.astype(np.int32)
    a_end = np.minimum(lo + span, read_len[a_id]).astype(np.int32)
    return a_id, a_start, a_end, read_len


def bench_device(a_id, a_start, a_end, read_len, iters=10):
    import jax
    import jax.numpy as jnp

    from hinge_tpu.ops import coverage as C

    nb = MAXLEN // RESO + 3

    # NOTE: deliberately NOT one fused jit.  Each kernel below is jitted at
    # its def site and compiles on the axon remote compiler in <=25s; fusing
    # the whole chain into a single jit has been observed to compile for
    # >40 minutes there (two big scatter graphs + masks in one module).
    # Separate jits measure the same end-to-end device work, and the small
    # intermediate glue (n_entries, maximum, sums) dispatches eagerly on
    # device, so the timing still covers the full filter inner loop.
    @jax.jit
    def _finish(cov, ms, mev, ann):
        return cov.sum(), ms, mev, ann.astype(jnp.int32).sum()

    def step(a_id, a_start, a_end):
        cov = C.profile_coverage(
            a_id, a_start, a_end, jnp.int32(0), n_reads=N_READS, nb=nb, reso=RESO
        )
        cov_cut = C.profile_coverage(
            a_id, a_start, a_end, jnp.int32(CUT_OFF), n_reads=N_READS, nb=nb, reso=RESO
        )
        me, mst, cnt = C.pileup_stats(a_id, a_start, a_end, n_reads=N_READS, nb=1, reso=RESO)
        ne = C.n_entries_from_max_event(me, cnt, RESO)
        ne_cut = C.n_entries_from_max_event(
            jnp.maximum(me - CUT_OFF, mst + CUT_OFF), cnt, RESO)
        ms, mev, _, _ = C.coverage_mask(
            jnp.maximum(cov_cut - MIN_COV, 0), ne_cut, reso=RESO
        )
        ann = C.repeat_annotation_mask(
            cov, ne, ms, mev, jnp.int32(MIN_COV),
            reso=RESO, coverage_fraction=3, min_thresh=10, max_thresh=20,
            no_hinge_region=500,
        )
        return _finish(cov, ms, mev, ann)

    args = (jnp.asarray(a_id), jnp.asarray(a_start), jnp.asarray(a_end))
    out = step(*args)  # compile
    jax.block_until_ready(out)
    # warm-up and calibrate iteration count for >= ~1s of device time
    t0 = time.perf_counter()
    jax.block_until_ready(step(*args))
    probe = time.perf_counter() - t0
    iters = max(iters, int(1.0 / max(probe, 1e-4)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return N_OV / dt, dt


def bench_numpy_baseline(a_id, a_start, a_end, read_len, iters=1):
    """Same computation, vectorized numpy on host (reference-CPU stand-in)."""
    nb = MAXLEN // RESO + 3

    def step():
        cov = np.zeros((N_READS, nb + 1), dtype=np.int32)
        for cutoff, arr in ((0, None), (CUT_OFF, None)):
            grid = np.zeros((N_READS, nb + 1), dtype=np.int32)
            sb = np.clip((a_start + cutoff) // RESO + 1, 0, nb)
            eb = np.clip((a_end - cutoff) // RESO + 1, 0, nb)
            np.add.at(grid, (a_id, sb), 1)
            np.add.at(grid, (a_id, eb), -1)
            c = np.cumsum(grid[:, :nb], axis=1)
            if cutoff == 0:
                cov0 = c
            else:
                covc = c
        red = np.maximum(covc - MIN_COV, 0)
        pos = red > 0
        # longest-run scan (vectorized flush detection)
        prev = np.zeros_like(pos)
        prev[:, 1:] = pos[:, :-1]
        flush = (~pos) & prev
        return cov0.sum() + int(flush.sum())

    t0 = time.perf_counter()
    for _ in range(iters):
        s = step()
    dt = (time.perf_counter() - t0) / iters
    return N_OV / dt, dt


def _device_bench_subprocess(timeout_s: int = 1500, force_cpu: bool = False):
    """Run the device bench in a child process with a hard timeout.

    The single TPU here sits behind a tunnel whose claim can wedge if a
    previous client died mid-compile; a hung child must not stop the
    benchmark from reporting. Returns (rps, backend) or (None, None).
    """
    import subprocess

    code = (
        "import json, jax\n"
        # persistent compile cache: the axon tunnel compiles remotely and can
        # take minutes on the first run of a big scatter graph; cached
        # executables come back in seconds on subsequent runs
        "jax.config.update('jax_compilation_cache_dir', "
        f"{os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache')!r})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)\n"
        "from bench import synth, bench_device\n"
        "a,b,c,d = synth()\n"
        "rps, dt = bench_device(a,b,c,d)\n"
        "print('BENCH_RESULT ' + json.dumps({'rps': rps, 'backend': jax.default_backend()}))\n"
    )
    env = dict(os.environ)
    if force_cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
        )
        for line in r.stdout.splitlines():
            if line.startswith("BENCH_RESULT "):
                d = json.loads(line[len("BENCH_RESULT "):])
                return d["rps"], d["backend"]
    except subprocess.TimeoutExpired:
        pass
    return None, None


def run_e2e(genome_len=4_600_000, coverage=30.0, seed=0):
    """FASTA→consensus assemble() on the ecoli-scale synthetic workload.

    Runs in a child interpreter; prints a BENCH_E2E line with wall seconds,
    the per-stage timer breakdown, and reconstruction quality.
    """
    import tempfile

    from hinge_tpu.data.simulator import SimParams, simulate
    from hinge_tpu.io.fasta import write_fasta
    from hinge_tpu.pipeline import assemble
    from hinge_tpu.utils.log import timings

    with tempfile.TemporaryDirectory() as tmp:
        p = SimParams(genome_len=genome_len, coverage=coverage, seed=seed)
        genome, reads, rs, ov = simulate(p)
        fasta = os.path.join(tmp, "reads.fasta")
        write_fasta(fasta, ((rs.names[i], rs.get_seq(i)) for i in range(rs.n_reads)))
        del reads, rs, ov
        t0 = time.perf_counter()
        res = assemble(fasta=fasta, workdir=tmp, log=lambda *a: None)
        wall = time.perf_counter() - t0
        longest = max((len(s) for _, s in res["contigs"]), default=0)
        out = {
            "wall_s": round(wall, 1),
            "stages": {k: round(v, 1) for k, v in timings().items()},
            "n_reads": sum(1 for line in open(fasta) if line.startswith(">")),
            "genome_mb": round(genome_len / 1e6, 2),
            "coverage_x": coverage,
            "n_contigs": len(res["contigs"]),
            "longest_contig_frac": round(longest / genome_len, 3),
        }
        print("BENCH_E2E " + json.dumps(out))


def bench_sharded_step(iters=3):
    """Steady-state records/s of the sharded filter step on ALL devices."""
    import jax

    from hinge_tpu.parallel.sharding import (
        make_mesh, run_sharded_filter, shard_records, sharded_filter_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    a_id, a_start, a_end, read_len = synth()
    n = len(jax.devices())
    mesh = make_mesh(n)
    nb = MAXLEN // RESO + 3
    a_rel, a_s, a_e, reads_chunk = shard_records(a_id, a_start, a_end, N_READS, mesh)
    R = mesh.shape["reads"]
    rl = np.concatenate(
        [read_len, np.zeros(R * reads_chunk - N_READS, read_len.dtype)]
    ).reshape(R, reads_chunk)
    step = sharded_filter_step(mesh, reads_chunk=reads_chunk, nb=nb)
    sh3 = NamedSharding(mesh, P("reads", "recs"))
    sh1 = NamedSharding(mesh, P("reads"))
    args = (
        jax.device_put(a_rel, sh3), jax.device_put(a_s, sh3),
        jax.device_put(a_e, sh3), jax.device_put(rl, sh1),
    )
    jax.block_until_ready(step(*args))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(step(*args))
    probe = time.perf_counter() - t0
    iters = max(iters, int(1.0 / max(probe, 1e-4)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return N_OV / dt


def _child(code, timeout_s, tag, force_cpu=False, extra_env=None):
    """Run a bench snippet in a clean child interpreter; parse its tag line."""
    import subprocess

    env = dict(os.environ)
    if force_cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    if extra_env:
        env.update(extra_env)
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
        )
        for line in r.stdout.splitlines():
            if line.startswith(tag + " "):
                return json.loads(line[len(tag) + 1 :])
    except subprocess.TimeoutExpired:
        pass
    return None


def _e2e(timeout_s=None):
    if os.environ.get("HINGE_BENCH_E2E", "1") == "0":
        return None
    if timeout_s is None:
        timeout_s = int(os.environ.get("HINGE_BENCH_E2E_TIMEOUT", 1500))
    glen = int(os.environ.get("HINGE_BENCH_E2E_GENOME", 4_600_000))
    cov = float(os.environ.get("HINGE_BENCH_E2E_COV", 30.0))
    code = (
        "import jax, os\n"
        "jax.config.update('jax_compilation_cache_dir', os.path.abspath('.jax_cache'))\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)\n"
        f"from bench import run_e2e\nrun_e2e({glen}, {cov})\n"
    )
    out = _child(code, timeout_s, "BENCH_E2E")
    if out is None:  # TPU path wedged/slow: clean CPU interpreter
        out = _child(code, min(timeout_s, 1200), "BENCH_E2E", force_cpu=True)
        if out is not None:
            out["backend"] = "cpu-fallback"
    return out


def _scaling(timeout_s=420):
    if os.environ.get("HINGE_BENCH_SCALING", "1") == "0":
        return None
    curve = {}
    for n in (1, 2, 4, 8):
        code = (
            "import json, jax\n"
            "from bench import bench_sharded_step\n"
            "rps = bench_sharded_step()\n"
            "print('BENCH_SCALE ' + json.dumps({'rps': rps}))\n"
        )
        out = _child(
            code, timeout_s, "BENCH_SCALE", force_cpu=True,
            extra_env={"XLA_FLAGS": f"--xla_force_host_platform_device_count={n}"},
        )
        if out is not None:
            curve[str(n)] = round(out["rps"])
    if not curve:
        return None
    res = {"records_per_s": curve, "host_vcpus": os.cpu_count(),
           "mesh": "virtual CPU ('reads','recs')"}
    if "1" in curve and "8" in curve and curve["1"]:
        res["speedup_8x"] = round(curve["8"] / curve["1"], 2)
    return res


def main():
    a_id, a_start, a_end, read_len = synth()
    rps, backend = _device_bench_subprocess()
    if rps is None:
        # TPU unreachable (wedged tunnel): measure on the CPU backend in a
        # clean interpreter (no axon registration at startup)
        rps, _ = _device_bench_subprocess(timeout_s=420, force_cpu=True)
        backend = "cpu-fallback"
    if rps is None:
        rps = 0.0
        backend = "unavailable"
    base_rps, base_dt = bench_numpy_baseline(a_id, a_start, a_end, read_len)
    e2e = _e2e()
    scaling = _scaling()
    print(
        json.dumps(
            {
                "metric": "overlap_pileup_records_per_s_per_chip",
                "value": round(rps),
                "unit": "records/s",
                "vs_baseline": round(rps / base_rps, 2),
                "backend": backend,
                "e2e": e2e,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
