"""Pallas banded-NW window aligner vs a full-DP numpy oracle.

The SAME Pallas kernel runs here in interpreter mode (CPU CI); compiled
Mosaic execution is exercised on the real TPU by the benchmarks.  Checks:
identical rows to the oracle (same cost model + pinned tie-breaking
diag > up > left), optimal cost never above the greedy DW_banded path, and
full consumption of both sequences."""

import numpy as np
import pytest

from hinge_tpu.ops.pallas_band_nw import GAP, band_align_batch


def _np_oracle(q, t, bw=256):
    m, n = len(q), len(t)
    hb = bw // 2
    INF = 1 << 24
    C = np.full((m + 1, n + 1), INF, np.int64)
    C[0, :] = np.arange(n + 1)
    C[:, 0] = np.arange(m + 1)
    for i in range(1, m + 1):
        jlo = max(1, i - hb + 1)
        jhi = min(n, i + hb - 1)
        for j in range(jlo, jhi + 1):
            sub = 0 if q[i - 1] == t[j - 1] else 1
            C[i, j] = min(C[i - 1, j - 1] + sub, C[i - 1, j] + 1,
                          C[i, j - 1] + 1)
    i, j = m, n
    s = []
    while i > 0 or j > 0:
        if i == 0:
            s.append(2); j -= 1; continue
        if j == 0:
            s.append(1); i -= 1; continue
        sub = 0 if q[i - 1] == t[j - 1] else 1
        diag = C[i - 1, j - 1] + sub
        up = C[i - 1, j] + 1
        left = C[i, j - 1] + 1
        if C[i, j] == left and left < min(diag, up):
            s.append(2); j -= 1
        elif diag <= up:
            s.append(0); i -= 1; j -= 1
        else:
            s.append(1); i -= 1
    s = s[::-1]
    qr, tr = [], []
    qi = ti = 0
    for mv in s:
        qr.append(q[qi] if mv != 2 else GAP); qi += mv != 2
        tr.append(t[ti] if mv != 1 else GAP); ti += mv != 1
    return np.array(qr, np.uint8), np.array(tr, np.uint8)


def _make_pair(rng, n, err):
    t = rng.integers(0, 4, n).astype(np.uint8)
    q = []
    for b in t:
        r = rng.random()
        if r < err * 0.4:
            continue
        if r < err * 0.8:
            q.append(int(rng.integers(0, 4)))
        else:
            q.append(int(b))
        if rng.random() < err * 0.3:
            q.append(int(rng.integers(0, 4)))
    return np.array(q, np.uint8), t


@pytest.mark.slow
def test_rows_match_full_dp_oracle():
    rng = np.random.default_rng(3)
    pairs = [
        _make_pair(rng, int(rng.integers(30, 160)),
                   float(rng.uniform(0.02, 0.3)))
        for _ in range(20)
    ]
    pairs.append((pairs[0][1].copy(), pairs[0][1]))  # identical
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    got = band_align_batch(qs, ts)  # interpret mode off-TPU
    for i, (q, t) in enumerate(zip(qs, ts)):
        qa, ta = _np_oracle(q, t)
        np.testing.assert_array_equal(got[i][0], qa, err_msg=f"q row {i}")
        np.testing.assert_array_equal(got[i][1], ta, err_msg=f"t row {i}")


def test_cost_never_worse_than_greedy_band():
    from hinge_tpu.ops.myers import align_full

    rng = np.random.default_rng(8)
    pairs = [_make_pair(rng, 150, 0.2) for _ in range(8)]
    qs = [p[0] for p in pairs]
    ts = [p[1] for p in pairs]
    got = band_align_batch(qs, ts)

    def cost(r):
        return int((r[0] == GAP).sum() + (r[1] == GAP).sum()
                   + ((r[0] != r[1]) & (r[0] != GAP) & (r[1] != GAP)).sum())

    for i in range(len(pairs)):
        assert cost(got[i]) <= cost(align_full(qs[i], ts[i]))


@pytest.mark.slow
def test_rows_consume_both_sequences():
    rng = np.random.default_rng(4)
    q, t = _make_pair(rng, 120, 0.15)
    (qr, tr), = band_align_batch([q], [t])
    np.testing.assert_array_equal(qr[qr != GAP], q)
    np.testing.assert_array_equal(tr[tr != GAP], t)


def test_band_overflow_falls_back():
    rng = np.random.default_rng(5)
    q = rng.integers(0, 4, 50).astype(np.uint8)
    t = rng.integers(0, 4, 400).astype(np.uint8)  # |n-m| > band/2
    (qr, tr), = band_align_batch([q], [t])
    np.testing.assert_array_equal(qr[qr != GAP], q)
    np.testing.assert_array_equal(tr[tr != GAP], t)


@pytest.mark.slow
def test_fast_align_mode_draft_e2e(tmp_path):
    """HINGE_FAST_ALIGN=1 routes draft ladder windows through the Pallas
    kernel; the assembly must still reconstruct the genome (rows are
    optimal-cost, not reference-identical)."""
    import os
    import subprocess
    import sys

    code = """
import numpy as np
from hinge_tpu.data.simulator import SimParams, simulate
from hinge_tpu.io.fasta import write_fasta
from hinge_tpu.io.las import write_las
from hinge_tpu.pipeline import assemble
import tempfile, os
tmp = tempfile.mkdtemp()
p = SimParams(genome_len=40_000, coverage=16.0, mean_read_len=4500,
              std_read_len=900, sub_rate=0.01, seed=33)
genome, reads, rs, ov = simulate(p)
fasta = os.path.join(tmp, "r.fasta"); las = os.path.join(tmp, "r.las")
write_fasta(fasta, ((rs.names[i], rs.get_seq(i)) for i in range(rs.n_reads)))
write_las(las, ov)
res = assemble(fasta=fasta, las=las, workdir=tmp, log=lambda *a: None)
best = max((len(s) for _, s in res["contigs"]), default=0)
assert best > 0.6 * p.genome_len, best  # matches the parity-
# aligner baseline on this dataset (25131)
print("FAST_ALIGN_OK", best)
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["HINGE_FAST_ALIGN"] = "1"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "FAST_ALIGN_OK" in r.stdout
