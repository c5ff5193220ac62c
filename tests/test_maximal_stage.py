"""Maximal stage vs scalar transcription of maximal.cpp."""

import numpy as np
import pytest

from hinge_tpu.config import nominal_config
from hinge_tpu.stages.filter import run_filter
from hinge_tpu.stages.maximal import run_maximal
from tests import oracles as O


def maximal_oracle(rs, ov, cfg, eff_start, eff_end):
    """Scalar transcription of maximal.cpp:524-878 (single part, db mode)."""
    f = cfg.filter
    n = rs.n_reads
    active = [(eff_end[i] - eff_start[i]) >= f.length_threshold for i in range(n)]

    # idx_ab in las order, groups keyed by (a,b), insertion order = las order
    groups = {}
    for k in range(ov.n):
        if ov.a_id[k] == ov.b_id[k]:
            continue
        key = (int(ov.a_id[k]), int(ov.b_id[k]))
        groups.setdefault(key, []).append(k)

    per_read = {}
    for (a, b), rows in groups.items():
        per_read.setdefault(a, []).append((a, b, rows))

    contained_pairs = []
    r_begin, r_end = int(ov.a_id[0]), int(ov.a_id[-1])
    for i in range(r_begin, r_end + 1):
        if not active[i]:
            continue
        contained = False
        containing = -1
        for (a, b, rows) in per_read.get(i, []):
            rows_sorted = sorted(
                rows,
                key=lambda k: -(
                    (ov.a_end[k] - ov.a_start[k]) + (ov.b_end[k] - ov.b_start[k])
                ),
            )
            use = rows_sorted[:2] if cfg.layout.use_two_matches else rows_sorted[:1]
            for k in use:
                # ProcessAlignment: trim + length check + classify
                ams, ame, bms, bme, act = O.trim_overlap_oracle(
                    int(ov.a_start[k]), int(ov.a_end[k]),
                    int(ov.b_start[k]), int(ov.b_end[k]), int(ov.rc[k]),
                    int(eff_start[ov.a_id[k]]), int(eff_end[ov.a_id[k]]),
                    int(eff_start[ov.b_id[k]]), int(eff_end[ov.b_id[k]]),
                    ov.trace_pairs(k), tspace=ov.tspace,
                )
                if (bme - bms) < f.aln_threshold or (ame - ams) < f.aln_threshold or not act:
                    continue
                t = O.add_types_asymmetric_oracle(
                    ams, ame, bms, bme,
                    int(eff_start[ov.a_id[k]]), int(eff_end[ov.a_id[k]]),
                    int(eff_start[ov.b_id[k]]), int(eff_end[ov.b_id[k]]),
                    int(ov.rc[k]), f.theta, f.theta2,
                )
                if t == O.BCOVERA:
                    containing = int(ov.b_id[k])
                    if active[int(ov.b_id[k])]:
                        contained = True
        if contained:
            active[i] = False
            contained_pairs.append((i, containing))
    max_ids = [i for i in range(r_begin, r_end + 1) if active[i]]
    return active, contained_pairs, max_ids


@pytest.mark.parametrize("fixture", ["small_sim", "noisy_sim"])
def test_maximal_matches_oracle(fixture, request, tmp_path):
    sim = request.getfixturevalue(fixture)
    rs, ov = sim["read_store"], sim["overlaps"]
    cfg = nominal_config()
    fres = run_filter(rs, [ov], cfg)
    eff_start = fres.maskvec[:, 0].astype(np.int32)
    eff_end = fres.maskvec[:, 1].astype(np.int32)

    res = run_maximal(rs, [ov], cfg, eff_start, eff_end, out_prefix=str(tmp_path / "X"))
    o_active, o_pairs, o_max = maximal_oracle(rs, ov, cfg, eff_start, eff_end)

    np.testing.assert_array_equal(res.active, np.array(o_active))
    assert [p[0] for p in res.contained] == [p[0] for p in o_pairs]
    # some containment must actually occur for this test to mean anything
    assert len(o_pairs) > 0
    assert 0 < len(o_max) < rs.n_reads

    max_file = [int(x) for x in open(str(tmp_path / "X.max")).read().split()]
    assert max_file == o_max
