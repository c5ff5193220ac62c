"""Accuracy-sweep driver sanity (hinge_tpu/utils/sweep.py)."""
import json

import numpy as np

from hinge_tpu.utils import sweep as SW


def test_cell_and_markdown(tmp_path, monkeypatch):
    # one real assemble cell at toy scale, then the full report plumbing
    # with the grid shrunk to 2 cells
    monkeypatch.setattr(SW, "REPEAT_PROFILES", [("plain", lambda L: ())])
    monkeypatch.setattr(SW, "COVERAGES", (14.0,))
    monkeypatch.setattr(SW, "READ_LENS", (4000, 99))  # 99 -> failing cell
    out = str(tmp_path / "rep")
    rep = SW.run_sweep(genome_len=60_000, seed=3, out_prefix=out,
                       log=lambda *a: None)
    assert rep["n_cells"] == 2
    ok = [c for c in rep["cells"] if c["ok"]]
    bad = [c for c in rep["cells"] if not c["ok"]]
    assert len(ok) == 1 and len(bad) == 1
    assert ok[0]["n50"] > 10_000 and ok[0]["longest_frac"] > 0.5
    assert "error" in bad[0]
    loaded = json.load(open(out + ".json"))
    assert loaded["n_ok"] == 1
    md = open(out + ".md").read()
    assert "plain/cov14/len4000" in md and "1/2 cells assembled" in md
