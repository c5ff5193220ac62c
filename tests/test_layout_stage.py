"""Layout stage structural tests on simulated data."""

import numpy as np
import pytest

from hinge_tpu.config import nominal_config
from hinge_tpu.stages.filter import run_filter
from hinge_tpu.stages.maximal import run_maximal
from hinge_tpu.stages.layout import load_marked, run_layout


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    from hinge_tpu.data.simulator import SimParams, simulate

    tmp = tmp_path_factory.mktemp("lay")
    p = SimParams(
        genome_len=60_000, coverage=20.0, mean_read_len=5000, std_read_len=1200,
        repeats=((5_000, 35_000, 3_000),), seed=7,
    )
    genome, reads, rs, ov = simulate(p)
    cfg = nominal_config()
    prefix = str(tmp / "X")
    fres = run_filter(rs, [ov], cfg, out_prefix=prefix)
    eff_s = fres.maskvec[:, 0].astype(np.int32)
    eff_e = fres.maskvec[:, 1].astype(np.int32)
    mres = run_maximal(rs, [ov], cfg, eff_s, eff_e, out_prefix=prefix)
    marked_repeats = load_marked(prefix + ".repeat.txt")
    marked_hinges = load_marked(prefix + ".hinges.txt")
    lres = run_layout(
        rs, [ov], cfg, eff_s, eff_e, mres.active,
        marked_repeats, marked_hinges, out_prefix=prefix, filter_prefix=prefix,
    )
    return dict(rs=rs, ov=ov, cfg=cfg, prefix=prefix, fres=fres, mres=mres, lres=lres)


def test_edges_structure(pipeline):
    lres = pipeline["lres"]
    mres = pipeline["mres"]
    assert len(lres.edges_hinges) > 0
    assert len(lres.edges_hinges) == len(lres.edges_hinges2)
    n_active = int(mres.active.sum())
    # every active read contributes at most one forward and one backward edge
    assert lres.n_edges_fwd <= n_active
    assert lres.n_edges_bwd <= n_active
    # and most active reads should find both (circular genome, no dead ends
    # except repeats)
    assert lres.n_edges_fwd > 0.7 * n_active
    assert lres.n_edges_bwd > 0.7 * n_active


def test_edges_format(pipeline):
    for line in pipeline["lres"].edges_hinges[:50]:
        t = line.split()
        assert len(t) == 18, line
        int(t[0]); int(t[1]); int(t[2])
        assert t[3] in ("0", "1") and t[4] in ("0", "1")
        assert t[5] in ("1", "-1")
        assert t[6].startswith("[") and t[17].endswith("]")
    for line in pipeline["lres"].edges_hinges2[:50]:
        t = line.split()
        assert len(t) == 15, line
        assert t[5] in ("0", "1", "-1")


def test_edges_reference_active_reads(pipeline):
    mres = pipeline["mres"]
    for line in pipeline["lres"].edges_hinges:
        t = line.split()
        a, b = int(t[0]), int(t[1])
        assert mres.active[a] and mres.active[b], (a, b)


def test_hinge_list_subset(pipeline):
    hinges_txt = load_marked(pipeline["prefix"] + ".hinges.txt")
    allowed = {(i, p, t) for i, lst in hinges_txt.items() for (p, t) in lst}
    for line in pipeline["lres"].hinge_list:
        i, p, t = (int(x) for x in line.split())
        assert (i, p, t) in allowed


def test_outputs_written(pipeline):
    import os

    prefix = pipeline["prefix"]
    for suffix in (
        ".edges.hinges", ".edges.hinges2", ".hinge.list", ".hgraph",
        ".edges.greedy", ".edges.1", ".edges.2", ".edges.skipped",
        ".deadends.txt", ".killed.hinges", ".garbage.txt",
    ):
        assert os.path.exists(prefix + suffix), suffix
    eh = open(prefix + ".edges.hinges").read().splitlines()
    assert eh == pipeline["lres"].edges_hinges
