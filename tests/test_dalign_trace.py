"""Fuzz hinge_tpu's exact iter_np transcription against the REFERENCE's
LAInterface::computeTracePTS (built by refbuild/build.sh + trace_harness).

Generates random alignments with consistent trace points (B derived from A
by a tracked edit script), runs both implementations, and requires the
recovered global traces to be identical — tie-breaks and all.  Also checks
the native C kernel against the pure-Python transcription.
"""

import os
import subprocess

import numpy as np
import pytest

from hinge_tpu.ops import dalign_trace as DT

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBUILD = os.path.join(REPO, "refbuild")
HARNESS = os.path.join(REFBUILD, "bin", "trace_harness")

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/src/lib/LAInterface.cpp"),
    reason="reference sources not mounted",
)


@pytest.fixture(scope="session")
def harness():
    r = subprocess.run(["bash", os.path.join(REFBUILD, "build.sh")],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    if not os.path.exists(HARNESS):
        r = subprocess.run(
            ["g++", "-std=gnu++11", "-O2", "-fopenmp",
             "-I/root/reference/src/include", "-I" + os.path.join(REFBUILD, "shim"),
             "-include", "cassert",
             os.path.join(REFBUILD, "trace_harness.cpp"),
             os.path.join(REFBUILD, "obj", "LAInterface.o"),
             os.path.join(REFBUILD, "obj", "align.o"),
             os.path.join(REFBUILD, "obj", "DB.o"),
             os.path.join(REFBUILD, "obj", "QV.o"),
             os.path.join(REFBUILD, "obj", "paf.o"),
             "-lz", "-o", HARNESS],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
    return HARNESS


def _make_case(rng, err, alen_extra=40):
    """Random alignment: B derived from A by tracked edits; returns the
    fields the harness consumes plus hinge_tpu's item tuple."""
    tspace = 100
    abpos = int(rng.integers(0, 150))
    span = int(rng.integers(80, 450))
    a_read = rng.integers(0, 4, size=abpos + span + alen_extra).astype(np.uint8)

    # edit script A[abpos:abpos+span] -> B segment, tracking the A->B map
    b_seg = []
    edits_at = []  # a positions (window attribution)
    i = abpos
    amap = {abpos: 0}
    while i < abpos + span:
        r = rng.random()
        if r < err / 3:  # substitution
            b_seg.append((int(a_read[i]) + int(rng.integers(1, 4))) % 4)
            edits_at.append(i)
            i += 1
        elif r < 2 * err / 3:  # deletion from A
            edits_at.append(i)
            i += 1
        elif r < err:  # insertion into B
            b_seg.append(int(rng.integers(0, 4)))
            edits_at.append(i)
        else:
            b_seg.append(int(a_read[i]))
            i += 1
        amap[i] = len(b_seg)
    aepos = abpos + span
    bbpos = int(rng.integers(0, 120))
    bepos = bbpos + len(b_seg)
    b_read = np.concatenate([
        rng.integers(0, 4, size=bbpos).astype(np.uint8),
        np.asarray(b_seg, np.uint8),
        rng.integers(0, 4, size=alen_extra).astype(np.uint8),
    ])

    # trace points at A multiples of tspace
    bounds = [abpos] + list(range((abpos // tspace + 1) * tspace, aepos, tspace)) + [aepos]
    trace = []
    for w in range(len(bounds) - 1):
        lo, hi = bounds[w], bounds[w + 1]
        # safe upper bound (boundary insertions may land either side)
        diffs = sum(1 for p in edits_at if lo <= p <= hi) + 2
        blen_w = amap[hi] - amap[lo]
        trace += [diffs, blen_w]
    return (a_read, b_read, abpos, aepos, bbpos, bepos,
            np.asarray(trace, np.uint16).reshape(-1, 2), tspace)


def _ref_trace(harness, cases):
    lines = [str(len(cases))]
    for (a_read, b_read, abpos, aepos, bbpos, bepos, tp, tspace) in cases:
        ctx_a, off_a0, amin = DT.make_context(a_read, abpos, aepos)
        ctx_b, off_b0, bmin = DT.make_context(b_read, bbpos, bepos)
        flat = tp.reshape(-1)
        lines.append(f"{abpos} {aepos} {bbpos} {bepos} {tspace} {len(flat)}")
        lines.append(" ".join(str(int(v)) for v in flat))
        lines.append(f"{len(ctx_a)} {amin - 1}")
        lines.append(" ".join(str(int(v)) for v in ctx_a))
        lines.append(f"{len(ctx_b)} {bmin - 1}")
        lines.append(" ".join(str(int(v)) for v in ctx_b))
    r = subprocess.run([harness], input="\n".join(lines) + "\n",
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    out = []
    for line in r.stdout.splitlines():
        vals = [int(v) for v in line.split()]
        assert vals[0] == len(vals) - 1
        out.append(vals[1:])
    return out


def _my_trace(case):
    """Global trace via per-window scripts (+bb_w / -ab_w offsets)."""
    (a_read, b_read, abpos, aepos, bbpos, bepos, tp, tspace) = case
    ctx_a, off_a0, _ = DT.make_context(a_read, abpos, aepos)
    ctx_b, off_b0, _ = DT.make_context(b_read, bbpos, bepos)
    ab, bb = DT.window_bounds(abpos, aepos, bbpos, bepos, tp, tspace)
    out = []
    for w in range(len(ab) - 1):
        off_a = off_a0 + int(ab[w] - abpos)
        off_b = off_b0 + int(bb[w] - bbpos)
        M = int(ab[w + 1] - ab[w])
        N = int(bb[w + 1] - bb[w])
        script = DT.iter_np_script(ctx_a, off_a, M, ctx_b, off_b, N)
        for p in script:
            out.append(p + int(bb[w]) if p > 0 else p - int(ab[w]))
    return out


def test_iter_np_matches_reference(harness):
    rng = np.random.default_rng(1234)
    cases = [_make_case(rng, err) for err in (0.0, 0.02, 0.05, 0.1, 0.2, 0.3)
             for _ in range(10)]
    ref = _ref_trace(harness, cases)
    for case, want in zip(cases, ref):
        got = _my_trace(case)
        assert got == want, (case[2:6], got[:20], want[:20])


def test_native_matches_python():
    rng = np.random.default_rng(77)
    cases = [_make_case(rng, err) for err in (0.05, 0.25) for _ in range(8)]
    items = [(a, b, ab, ae, bb, be, tp, ts)
             for (a, b, ab, ae, bb, be, tp, ts) in cases]
    got = DT.align_overlap_rows_exact(items)

    for (case, (ra, rb)) in zip(cases, got):
        (a_read, b_read, abpos, aepos, bbpos, bepos, tp, tspace) = case
        ctx_a, off_a0, _ = DT.make_context(a_read, abpos, aepos)
        ctx_b, off_b0, _ = DT.make_context(b_read, bbpos, bepos)
        ab, bb = DT.window_bounds(abpos, aepos, bbpos, bepos, tp, tspace)
        pas, pbs = [], []
        for w in range(len(ab) - 1):
            off_a = off_a0 + int(ab[w] - abpos)
            off_b = off_b0 + int(bb[w] - bbpos)
            M = int(ab[w + 1] - ab[w])
            N = int(bb[w + 1] - bb[w])
            script = DT.iter_np_script(ctx_a, off_a, M, ctx_b, off_b, N)
            wa = ctx_a[off_a : off_a + M]
            wb = ctx_b[off_b : off_b + N]
            pa, pb = DT.script_to_rows(wa, wb, script)
            pas.append(pa)
            pbs.append(pb)
        np.testing.assert_array_equal(ra, np.concatenate(pas))
        np.testing.assert_array_equal(rb, np.concatenate(pbs))


def test_build_flat_windows_matches_add_overlap_loop():
    """Vectorized window-batch construction == per-record add_overlap loop,
    bit-for-bit (contexts, pointers, lengths, avail, owner)."""
    from hinge_tpu.data.overlaps import revcomp_codes
    from hinge_tpu.data.simulator import SimParams, simulate

    p = SimParams(genome_len=60_000, coverage=12.0, seed=3)
    genome, reads, rs, ov = simulate(p)
    idx = np.nonzero(ov.tlen > 0)[0][:1500]

    batch = DT._WindowBatch()
    for r in idx:
        r = int(r)
        a_seq = rs.get_bases(int(ov.a_id[r]))
        b_seq = rs.get_bases(int(ov.b_id[r]))
        blen = int(ov.b_len[r])
        if int(ov.rc[r]):
            bf = revcomp_codes(b_seq)
            b0p, b1p = blen - int(ov.b_end[r]), blen - int(ov.b_start[r])
        else:
            bf = b_seq
            b0p, b1p = int(ov.b_start[r]), int(ov.b_end[r])
        batch.add_overlap(r, np.asarray(a_seq, np.uint8),
                          np.asarray(bf, np.uint8),
                          int(ov.a_start[r]), int(ov.a_end[r]), b0p, b1p,
                          ov.trace_pairs(r), int(ov.tspace))
    ref = batch._flat()
    got = DT.build_flat_windows(
        rs.bases, rs.bases_off[ov.a_id[idx]], rs.length[ov.a_id[idx]],
        rs.bases, rs.bases_off[ov.b_id[idx]], rs.length[ov.b_id[idx]],
        ov.a_start[idx], ov.a_end[idx], ov.b_start[idx], ov.b_end[idx],
        ov.rc[idx], ov.trace, ov.trace_off[idx], ov.tlen[idx],
        int(ov.tspace))
    names = ("abuf", "bbuf", "a_ptr", "b_ptr", "a_len", "b_len",
             "a_avail", "b_avail")
    for nm, a, b in zip(names, ref, got[:8]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=nm)
    np.testing.assert_array_equal(np.asarray(batch.owner),
                                  idx[got[8]].astype(np.int64))
