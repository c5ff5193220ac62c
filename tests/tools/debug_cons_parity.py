"""Bisect the consensus-FASTA divergence seen at 4.6Mb in
bench_reference_wall.py: run the shared chain at a given scale, byte-compare
draft AND consensus against the reference binaries, and report the first
diverging contig/position.

  python debug_cons_parity.py <genome_len> [workdir]

Keeps the workdir when given (for post-mortem diffing).
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

_HERE = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
BIN = os.path.join(_HERE, "refbuild", "bin")
REF_INI = "/root/reference/utils/nominal.ini"

GLEN = int(sys.argv[1])
KEEP = sys.argv[2] if len(sys.argv) > 2 else None

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from hinge_tpu.data.simulator import SimParams, simulate  # noqa: E402
from hinge_tpu.io.dazz_db import write_db  # noqa: E402
from hinge_tpu.io.las import write_las  # noqa: E402
from hinge_tpu.io.fasta import read_fasta  # noqa: E402


def run_ref(tag, cwd, argv, timeout=900):
    r = subprocess.run(argv, cwd=cwd, capture_output=True, text=True,
                       timeout=timeout)
    assert r.returncode == 0, (tag, r.stdout[-1500:], r.stderr[-1500:])


def run_mine(tag, cwd, argv, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=_HERE)
    r = subprocess.run([sys.executable, "-m", "hinge_tpu.cli", *argv],
                       cwd=cwd, capture_output=True, text=True,
                       timeout=timeout, env=env)
    assert r.returncode == 0, (tag, r.stdout[-1500:], r.stderr[-1500:])


def compare(ref_dir, my_dir, name):
    a = open(os.path.join(ref_dir, name), "rb").read()
    b = open(os.path.join(my_dir, name), "rb").read()
    if a == b:
        print(f"{name}: IDENTICAL ({len(a)} bytes)", flush=True)
        return True
    k = next((i for i in range(min(len(a), len(b))) if a[i] != b[i]),
             min(len(a), len(b)))
    print(f"{name}: DIFFER len {len(a)} vs {len(b)}, first byte {k}: "
          f"ref={a[max(0,k-30):k+30]!r} mine={b[max(0,k-30):k+30]!r}",
          flush=True)
    return False


base = KEEP or tempfile.mkdtemp(prefix=f"consparity{GLEN}_")
ref_dir = os.path.join(base, "ref")
my_dir = os.path.join(base, "mine")
os.makedirs(ref_dir, exist_ok=True)
os.makedirs(my_dir, exist_ok=True)
p = SimParams(genome_len=GLEN, coverage=30.0, seed=0)
genome, reads, rs, ov = simulate(p)
write_db(os.path.join(ref_dir, "X.db"), rs)
write_las(os.path.join(ref_dir, "X.las"), ov)
shutil.copy(REF_INI, os.path.join(ref_dir, "nominal.ini"))
print(f"glen={GLEN}: {rs.n_reads} reads / {ov.n} records  dir={base}",
      flush=True)
del genome, reads, rs, ov
for f in os.listdir(ref_dir):
    dst = os.path.join(my_dir, f)
    if not os.path.exists(dst):
        os.link(os.path.join(ref_dir, f), dst)

std = ["--db", "X", "--las", "X.las", "-x", "X", "--config", "nominal.ini"]
run_ref("filter", ref_dir, [os.path.join(BIN, "Reads_filter"), *std])
run_ref("maximal", ref_dir, [os.path.join(BIN, "get_maximal_reads"), *std])
run_ref("layout", ref_dir, [os.path.join(BIN, "hinging"), *std, "-o", "X"])
run_mine("filter", my_dir, ["filter", "--db", "X", "--las", "X.las",
                            "--prefix", "X", "--config", "nominal.ini"])
run_mine("maximal", my_dir, ["maximal", "--db", "X", "--las", "X.las",
                             "--prefix", "X", "--config", "nominal.ini"])
run_mine("layout", my_dir, ["layout", "--db", "X", "--las", "X.las",
                            "--prefix", "X", "--config", "nominal.ini",
                            "--out", "X"])
run_mine("clip", my_dir, ["clip", "X.edges.hinges", "X.hinge.list", "1"])
run_mine("draft_path", my_dir,
         ["draft-path", ".", "X", "X1.G2.graphml", "--db", "X"])
shutil.copy(os.path.join(my_dir, "X.edges.list"),
            os.path.join(ref_dir, "X.edges.list"))
run_ref("draft", ref_dir, [os.path.join(BIN, "draft_assembly"), *std,
                           "--out", "X.draft", "--path", "X.edges.list"])
run_mine("draft", my_dir, ["draft", "--db", "X", "--las", "X.las",
                           "--prefix", "X", "--config", "nominal.ini",
                           "--out", "X.draft"])
draft_same = compare(ref_dir, my_dir, "X.draft.fasta")

run_mine("map", my_dir, ["map", "X.draft.fasta", "--db", "X",
                         "--out", "draft.X.las"])
contigs = read_fasta(os.path.join(my_dir, "X.draft.fasta"))
write_db(os.path.join(ref_dir, "draft.db"), contigs)
shutil.copy(os.path.join(my_dir, "draft.X.las"),
            os.path.join(ref_dir, "draft.X.las"))
run_ref("consensus", ref_dir,
        [os.path.join(BIN, "consensus"), "draft", "X", "draft.X.las",
         "X.consensus.fasta", "nominal.ini"])
run_mine("consensus", my_dir,
         ["consensus", "X.draft.fasta", "X.db", "draft.X.las",
          "X.consensus.fasta", "nominal.ini"])
cons_same = compare(ref_dir, my_dir, "X.consensus.fasta")
print(json.dumps({"glen": GLEN, "draft_same": draft_same,
                  "cons_same": cons_same, "dir": base}), flush=True)
