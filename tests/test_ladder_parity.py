"""Fuzz hinge_tpu's ladder-consensus inner loop (myers _align transcription +
falcon_vote) against the REFERENCE kernels (DW_banded.c + falcon.c), compiled
by refbuild and driven exactly as draft.cpp:600-682 drives them."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBUILD = os.path.join(REPO, "refbuild")
HARNESS = os.path.join(REFBUILD, "bin", "ladder_harness")

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/src/lib/falcon.c"),
    reason="reference sources not mounted",
)

_CODES = "acgt"


@pytest.fixture(scope="session")
def harness():
    r = subprocess.run(["bash", os.path.join(REFBUILD, "build.sh")],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    if not os.path.exists(HARNESS):
        r = subprocess.run(
            ["g++", "-std=gnu++11", "-O2", "-I/root/reference/src/include",
             os.path.join(REFBUILD, "ladder_harness.cpp"),
             os.path.join(REFBUILD, "obj", "falcon.o"),
             os.path.join(REFBUILD, "obj", "DW_banded.o"),
             os.path.join(REFBUILD, "obj", "kmer_lookup.o"),
             "-o", HARNESS],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
    return HARNESS


def _mutate(rng, seq, err):
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < err / 3:
            out.append((int(seq[i]) + int(rng.integers(1, 4))) % 4)
            i += 1
        elif r < 2 * err / 3:
            i += 1
        elif r < err:
            out.append(int(rng.integers(0, 4)))
        else:
            out.append(int(seq[i]))
            i += 1
    return np.asarray(out, np.uint8)


def _make_ladder(rng, err, n_segs, length):
    base = rng.integers(0, 4, size=length).astype(np.uint8)
    segs = [_mutate(rng, base, err) for _ in range(n_segs)]
    mx = int(rng.integers(0, n_segs))
    return segs, mx


def _ref_consensus(harness, ladders):
    lines = [str(len(ladders))]
    for segs, mx in ladders:
        lines.append(f"{len(segs)} {mx}")
        for s in segs:
            lines.append(f"{len(s)} " + "".join(_CODES[c] for c in s))
    r = subprocess.run([harness], input="\n".join(lines) + "\n",
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    out = []
    for line in r.stdout.splitlines():
        out.append("" if line == "-" else line)
    return out


def _my_consensus(ladders):
    from hinge_tpu.ops import falcon_vote as FV
    from hinge_tpu.stages.draft import _align_ladder_pairs

    out = []
    for segs, mx in ladders:
        template = segs[mx]
        rows = _align_ladder_pairs(segs, [template] * len(segs), 150)
        tags_list = []
        for j, (qrow, trow) in enumerate(rows):
            qrow = np.concatenate([[np.uint8(3)], qrow])
            trow = np.concatenate([[np.uint8(3)], trow])
            tags_list.append(FV.get_align_tags(qrow, trow, j, 0))
        tags = (np.concatenate(tags_list) if tags_list
                else np.zeros((0, 6), np.int32))
        (cns, low), = FV.get_cns_batch([tags], [len(template) + 1], [1])
        s = "".join(_CODES[c] for c in cns)
        out.append("".join(ch if lo else ch.upper() for ch, lo in zip(s, low)))
    return out


def test_ladder_consensus_matches_reference(harness):
    rng = np.random.default_rng(4321)
    ladders = []
    for err in (0.0, 0.02, 0.08, 0.15, 0.25):
        for n in (2, 3, 5, 8):
            ladders.append(_make_ladder(rng, err, n, int(rng.integers(40, 500))))
    want = _ref_consensus(harness, ladders)
    got = _my_consensus(ladders)
    for i, (w, g) in enumerate(zip(want, got)):
        assert g == w, (i, len(ladders[i][0]), ladders[i][1], g[:80], w[:80])
