"""Corrupt-file fuzz of the .las readers (VERDICT r3 #8).

Every mutation of a valid .las — truncations, header/byte flips, tlen
corruption — must either parse successfully (if it still happens to be
well-formed) or raise ValueError; never crash the process or silently
return garbage-shaped stores.  Runs in a subprocess because the native
parser (io_native.cpp::las_scan/las_parse) would take pytest down with it
on a memory-safety bug — the whole point of the fuzz.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_FUZZ_DRIVER = r"""
import os, sys, random
sys.path.insert(0, "@REPO@")
import numpy as np
from hinge_tpu.data.simulator import SimParams, simulate
from hinge_tpu.io.las import read_las, write_las

path = sys.argv[1]
tspace = int(sys.argv[2])
p = SimParams(genome_len=25_000, coverage=10.0, seed=5,
              noise_profile="daligner", tspace=tspace)
genome, reads, rs, ov = simulate(p)
write_las(path, ov)
good = open(path, "rb").read()
ref = read_las(path)
assert ref.n == ov.n

rng = random.Random(7)
n_ok = n_err = 0
for case in range(120):
    buf = bytearray(good)
    kind = case % 3
    if kind == 0:  # truncate anywhere (header, record boundary, mid-trace)
        cut = rng.randrange(0, len(buf))
        buf = buf[:cut]
    elif kind == 1:  # flip bytes in the header / first records
        for _ in range(rng.randrange(1, 4)):
            i = rng.randrange(0, min(len(buf), 400))
            buf[i] ^= 1 << rng.randrange(8)
    else:  # corrupt a random aligned int32 (tlen/coords) deep in the file
        i = rng.randrange(0, max(len(buf) - 4, 1)) & ~3
        buf[i:i+4] = rng.randrange(2**32).to_bytes(4, "little")
    open(path + ".fz", "wb").write(bytes(buf))
    try:
        st = read_las(path + ".fz")
        # accepted: shape invariants must hold (no garbage-shaped store)
        assert st.tlen.shape == st.a_id.shape
        assert st.trace_off.shape == st.a_id.shape
        if st.n:
            assert int(st.trace_off[-1]) + int(st.tlen[-1]) <= st.trace.size
        n_ok += 1
    except ValueError:
        n_err += 1
print("DONE", n_ok, n_err, flush=True)
"""


@pytest.mark.parametrize("tspace", [100, 150])
def test_las_fuzz_no_crash(tmp_path, tspace):
    driver = _FUZZ_DRIVER.replace("@REPO@", REPO)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "-c", driver, str(tmp_path / "f.las"), str(tspace)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("DONE")][-1]
    _, n_ok, n_err = line.split()
    # the fuzzer must actually exercise the reject path
    assert int(n_err) > 10, line
    assert int(n_ok) + int(n_err) == 120
