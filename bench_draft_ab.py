"""Draft-stage whole-stage A/B on the active backend (VERDICT r3 #6).

Runs run_draft twice on the identical 4.6Mb inputs — HINGE_PARITY_ALIGN=1
(the exact DW_banded C path) vs HINGE_FAST_ALIGN=1 (the Pallas banded-NW
device kernel) — and appends the stage walls to docs/bench_recorded.json
so the TPU draft default can be set from measured stage time rather than
the r3 window-microbenchmark.  Each arm runs in a child interpreter so the
env pin is clean and a wedged TPU claim cannot hang the harness past its
timeout.

  python bench_draft_ab.py [genome_len] [coverage]
"""
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
GLEN = int(sys.argv[1]) if len(sys.argv) > 1 else 4_600_000
COV = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_compilation_cache_dir', {cache!r})
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import numpy as np
from hinge_tpu.config import Config
from hinge_tpu.io.dazz_db import read_db
from hinge_tpu.io.las import read_las
from hinge_tpu.stages.draft import run_draft

d = {workdir!r}
rs = read_db(os.path.join(d, "X.db"))
ov = read_las(os.path.join(d, "X.las"))
cfg = Config.from_ini(os.path.join(d, "nominal.ini"))
mx = np.zeros(rs.n_reads, bool)
mx[[int(l) for l in open(os.path.join(d, "X.max"))]] = True
t0 = time.perf_counter()
out = run_draft(rs, [ov], cfg, mx, os.path.join(d, "X.edges.list"))
wall = time.perf_counter() - t0
lens = sorted((len(s) for _, s in out), reverse=True)
print("AB_RESULT " + __import__("json").dumps(
    {{"wall_s": round(wall, 1), "backend": jax.default_backend(),
      "n_contigs": len(out), "longest": lens[0] if lens else 0}}), flush=True)
"""


def prepare(workdir):
    """Simulate + run stages through draft-path so X.edges.list exists."""
    os.makedirs(workdir, exist_ok=True)
    if os.path.exists(os.path.join(workdir, "X.edges.list")):
        return
    env = dict(os.environ, PYTHONPATH=_HERE, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = (
        "import os, sys, shutil\n"
        f"sys.path.insert(0, {_HERE!r})\n"
        "from hinge_tpu.data.simulator import SimParams, simulate\n"
        "from hinge_tpu.io.dazz_db import write_db\n"
        "from hinge_tpu.io.las import write_las\n"
        f"p = SimParams(genome_len={GLEN}, coverage={COV}, seed=0)\n"
        "g, r, rs, ov = simulate(p)\n"
        f"write_db(os.path.join({workdir!r}, 'X.db'), rs)\n"
        f"write_las(os.path.join({workdir!r}, 'X.las'), ov)\n"
        "shutil.copy('/root/reference/utils/nominal.ini',"
        f" os.path.join({workdir!r}, 'nominal.ini'))\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=600)
    for args in (["filter"], ["maximal"], ["layout", "--out", "X"]):
        subprocess.run(
            [sys.executable, "-m", "hinge_tpu.cli", args[0], "--db", "X",
             "--las", "X.las", "--prefix", "X", "--config", "nominal.ini",
             *args[1:]],
            check=True, cwd=workdir, env=env, timeout=600)
    subprocess.run([sys.executable, "-m", "hinge_tpu.cli", "clip",
                    "X.edges.hinges", "X.hinge.list", "1"],
                   check=True, cwd=workdir, env=env, timeout=600)
    subprocess.run([sys.executable, "-m", "hinge_tpu.cli", "draft-path",
                    ".", "X", "X1.G2.graphml", "--db", "X"],
                   check=True, cwd=workdir, env=env, timeout=600)


def run_arm(workdir, pin_env, timeout_s=1200):
    # APPEND to PYTHONPATH: the ambient path carries the TPU platform
    # plugin (sitecustomize); replacing it silently drops the device
    env = dict(os.environ, **pin_env)
    env["PYTHONPATH"] = _HERE + os.pathsep + env.get("PYTHONPATH", "")
    code = _CHILD.format(repo=_HERE, workdir=workdir,
                         cache=os.path.join(_HERE, ".jax_cache"))
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout {timeout_s}s"}
    for line in r.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    return {"error": (r.stderr[-500:] or "no result line")}


def main():
    workdir = os.environ.get("HINGE_AB_WORKDIR", "/tmp/hinge_draft_ab")
    prepare(workdir)
    arms = {
        "dw_banded_c": {"HINGE_PARITY_ALIGN": "1"},
        "pallas_band_nw": {"HINGE_FAST_ALIGN": "1"},
    }
    results = {}
    for name, pin in arms.items():
        results[name] = run_arm(workdir, pin)
        print(name, "->", results[name], flush=True)
    entry = {
        "date": time.strftime("%Y-%m-%d"),
        "kind": "draft_stage_ab",
        "workload": {"genome_mb": round(GLEN / 1e6, 2), "coverage_x": COV},
        "arms": results,
    }
    p = os.path.join(_HERE, "docs", "bench_recorded.json")
    rec = json.load(open(p))
    rec.append(entry)
    json.dump(rec, open(p, "w"), indent=1)
    print("RECORDED " + json.dumps(entry), flush=True)


if __name__ == "__main__":
    main()
