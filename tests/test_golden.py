"""Golden-file regression: the byte-exact stage outputs for a small fixed
dataset are checked in under tests/golden/; any change to them must be a
deliberate, reviewed decision (they encode the reference-format contracts
AND our pinned tie-breaking).

Regenerate with:  python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FILES = [
    "G.mas", "G.cmas", "G.repeat.txt", "G.hinges.txt", "G.max",
    "G.contained.txt", "G.edges.hinges", "G.edges.hinges2", "G.hinge.list",
    "G.killed.hinges", "G.edges.list",
]


def _build(tmpdir: str):
    from hinge_tpu.config import nominal_config
    from hinge_tpu.data.simulator import SimParams, simulate
    from hinge_tpu.stages.clip import run_clip
    from hinge_tpu.stages.draft_path import run_draft_path
    from hinge_tpu.stages.filter import run_filter
    from hinge_tpu.stages.layout import load_marked, run_layout
    from hinge_tpu.stages.maximal import run_maximal

    p = SimParams(genome_len=30_000, coverage=14.0, mean_read_len=4000,
                  std_read_len=900, seed=77)
    genome, reads, rs, ov = simulate(p)
    cfg = nominal_config()
    prefix = os.path.join(tmpdir, "G")
    fres = run_filter(rs, [ov], cfg, out_prefix=prefix)
    eff_s = fres.maskvec[:, 0].astype(np.int32)
    eff_e = fres.maskvec[:, 1].astype(np.int32)
    mres = run_maximal(rs, [ov], cfg, eff_s, eff_e, out_prefix=prefix)
    run_layout(
        rs, [ov], cfg, eff_s, eff_e, mres.active,
        load_marked(prefix + ".repeat.txt"), load_marked(prefix + ".hinges.txt"),
        out_prefix=prefix, filter_prefix=prefix,
    )
    graphs = run_clip(prefix + ".edges.hinges", prefix + ".hinge.list", "1",
                      cfg, write_viz=False)
    run_draft_path(graphs["G2"], rs.length, out_edges_list=prefix + ".edges.list")
    return prefix


def test_golden_outputs(tmp_path):
    prefix = _build(str(tmp_path))
    missing = [f for f in FILES if not os.path.exists(os.path.join(GOLDEN_DIR, f))]
    assert not missing, f"golden files missing (run --regen): {missing}"
    for f in FILES:
        got = open(os.path.join(str(tmp_path), f)).read()
        want = open(os.path.join(GOLDEN_DIR, f)).read()
        assert got == want, f"golden mismatch: {f}"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile, shutil

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            _build(td)
            for f in FILES:
                shutil.copy(os.path.join(td, f), os.path.join(GOLDEN_DIR, f))
        print(f"regenerated {len(FILES)} golden files in {GOLDEN_DIR}")
