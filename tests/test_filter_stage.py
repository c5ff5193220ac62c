"""End-to-end filter stage vs. a direct scalar transcription of
filter.cpp's main() on simulated data."""

import numpy as np
import pytest

from hinge_tpu.config import nominal_config
from hinge_tpu.stages.filter import run_filter
from tests import oracles as O


def filter_stage_oracle(rs, ov, cfg, delete_telomere=False):
    """Scalar transcription of filter.cpp main (single part, db+las mode)."""
    f = cfg.filter
    reso = f.reso
    n_read = rs.n_reads
    tspace = ov.tspace

    # QV binarize + QV mask
    QV_mask = []
    for i in range(n_read):
        qv = rs.qv_val[rs.qv_off[i] : rs.qv_off[i + 1]]
        QV_mask.append(O.qv_mask_oracle((qv < 40).astype(int), tspace))

    r_begin = int(ov.a_id[0])
    r_end = int(ov.a_id[-1])

    # pileups (self-matches excluded), las order
    idx_pileup = {i: [] for i in range(n_read)}
    self_aln = {}
    for k in range(ov.n):
        if ov.a_id[k] == ov.b_id[k]:
            self_aln.setdefault(int(ov.a_id[k]), []).append(
                (int(ov.a_start[k]), int(ov.a_end[k]))
            )
            self_aln[int(ov.a_id[k])].append((int(ov.b_start[k]), int(ov.b_end[k])))
            continue
        idx_pileup[int(ov.a_id[k])].append(k)

    self_match_reads = set()
    for i, spans in self_aln.items():
        cov = sum(e - s for s, e in spans) / float(rs.length[i])
        if cov > 4.5 and rs.length[i] > 10000:
            self_match_reads.add(i)

    # sort pileups by compare_overlap (descending summed match length, stable)
    for i in range(n_read):
        idx_pileup[i].sort(
            key=lambda k: -(
                (ov.a_end[k] - ov.a_start[k]) + (ov.b_end[k] - ov.b_start[k])
            )
        )

    coverages = {}
    cutoff_coverages = {}
    for i in range(r_begin, r_end + 1):
        rows = idx_pileup[i]
        starts = ov.a_start[rows]
        ends = ov.a_end[rows]
        cutoff_coverages[i] = O.profile_coverage_oracle(starts, ends, reso, f.cut_off)
        coverages[i] = O.profile_coverage_oracle(starts, ends, reso, 0)

    # coverage estimate
    read_coverage = []
    total_cov = num_slot = 0
    for i in range(r_begin, r_end + 1):
        if rs.length[i] < 5000:
            continue
        rc_ = sum(c for _, c in coverages[i])
        slots = len(coverages[i])
        total_cov += rc_
        num_slot += slots
        read_coverage.append(rc_ // max(1, slots))
    median_id = len(read_coverage) // 2
    arr = sorted(read_coverage)
    cov_est = arr[median_id] if median_id > 0 else read_coverage[0]
    MIN_COV = f.min_cov
    if MIN_COV < cov_est // 3:
        MIN_COV = cov_est // 3

    maskvec = [(0, 0)] * n_read
    cmask = [(0, 0)] * n_read
    cov_flag = []
    self_flag = []
    for i in range(r_begin, r_end + 1):
        maxstart, maxend, msc, mec = O.coverage_mask_oracle(cutoff_coverages[i], MIN_COV, reso)
        cmask[i] = (msc, mec)
        if delete_telomere:
            cc = [max(c - MIN_COV, 0) for _, c in cutoff_coverages[i]]
            if mec - msc + 1 > 20:
                sc = sum(cc[msc + d] + MIN_COV for d in range(10)) // 10
                ec = sum(cc[mec - d] + MIN_COV for d in range(10)) // 10
            else:
                limit = (mec - msc) // 2
                if limit == 0:
                    sc = ec = 0
                else:
                    sc = sum(cc[msc + d] + MIN_COV for d in range(limit)) // limit
                    ec = sum(cc[mec - d] + MIN_COV for d in range(limit)) // limit
            if sc >= 10 * ec or ec >= 10 * sc:
                cov_flag.append(i)
            if i in self_match_reads:
                self_flag.append(i)
        qs, qe = QV_mask[i]
        maskvec[i] = (max(maxstart, qs), min(maxend, qe))

    repeat_annotation = [[] for _ in range(n_read)]
    for i in range(r_begin, r_end + 1):
        anno = O.repeat_annotation_oracle(
            coverages[i], maskvec[i], MIN_COV,
            f.coverage_frac_repeat_annotation,
            f.min_repeat_annotation_threshold,
            f.max_repeat_annotation_threshold,
            f.no_hinge_region,
        )
        repeat_annotation[i] = O.merge_annotations_oracle(
            anno, f.repeat_annotation_gap_threshold
        )

    # hinge calling
    THETA = f.theta
    HTL = f.hinge_tolerance_length
    HBL = 2 * HTL
    hinges = {}
    for i in range(r_begin, r_end + 1):
        hinges[i] = []
        cav_s = cav_e = ns = ne_ = 0
        for p, c in coverages[i]:
            if maskvec[i][0] <= p <= maskvec[i][0] + f.no_hinge_region:
                cav_s += c
                ns += 1
            if maskvec[i][1] - f.no_hinge_region <= p <= maskvec[i][1]:
                cav_e += c
                ne_ += 1
        if ns > 0 and ne_ > 0 and abs(cav_e / ne_ - cav_s / ns) < 10:
            continue
        for pos_a, grad in repeat_annotation[i]:
            rows = idx_pileup[i]
            others = []
            support = 0
            for k in rows:
                b = int(ov.b_id[k])
                if ov.rc[k] == 0:
                    r_ovh = max(maskvec[b][1] - ov.b_end[k], 0)
                    l_ovh = max(ov.b_start[k] - maskvec[b][0], 0)
                else:
                    r_ovh = max(ov.b_start[k] - maskvec[b][0], 0)
                    l_ovh = max(maskvec[b][1] - ov.b_end[k], 0)
                if grad == -1:
                    if r_ovh > THETA and pos_a - HTL < ov.a_end[k] < pos_a + HTL:
                        others.append((int(ov.a_start[k]), int(l_ovh)))
                        support += 1
                else:
                    if l_ovh > THETA and pos_a - HTL < ov.a_start[k] < pos_a + HTL:
                        others.append((int(ov.a_end[k]), int(r_ovh)))
                        support += 1
            if support < f.hinge_min_support:
                continue
            if grad == -1:
                others.sort()
                bridged = _scan(others, maskvec[i][0], HBL, THETA, f, out=True)
            else:
                others.sort(key=lambda x: (-x[0], -x[1]))
                bridged = _scan(others, maskvec[i][1], HBL, THETA, f, out=False)
            if not bridged and support > f.hinge_min_support:
                hinges[i].append((pos_a, grad))
    return dict(
        maskvec=maskvec, cmask=cmask, repeat_annotation=repeat_annotation,
        hinges=hinges, min_cov=MIN_COV, cov_est=cov_est,
        cov_flag=cov_flag, self_flag=self_flag,
    )


def _scan(others, mask_pos, HBL, THETA, f, out):
    bridged = True
    considered = extending = 0
    n = len(others)
    for idx in range(n):
        first, second = others[idx]
        near_end = (first - mask_pos < HBL) if out else (mask_pos - first < HBL)
        gap0 = (first - others[0][0]) if out else (others[0][0] - first)
        if near_end:
            considered += 1
            extending += 1
            if extending > f.hinge_unbridged or (
                considered > f.hinge_unbridged and gap0 > HBL
            ):
                return False
        elif second < THETA:
            considered += 1
            if extending > f.hinge_unbridged or (
                considered > f.hinge_unbridged and gap0 > HBL
            ):
                return False
        elif second > THETA:
            considered += 1
            plen = 1
            j = idx + 1
            while j < n and (
                (others[j][0] - first < HBL) if out else (first - others[j][0] < HBL)
            ):
                plen += 1
                j += 1
            if plen > f.hinge_min_pileup:
                return True
    return bridged


@pytest.mark.parametrize("fixture", ["small_sim", "noisy_sim"])
def test_filter_stage_matches_oracle(fixture, request, tmp_path):
    sim = request.getfixturevalue(fixture)
    rs, ov = sim["read_store"], sim["overlaps"]
    cfg = nominal_config()
    res = run_filter(rs, [ov], cfg, out_prefix=str(tmp_path / "X"))
    oracle = filter_stage_oracle(rs, ov, cfg)

    assert res.min_cov_final == oracle["min_cov"]
    assert res.cov_est == oracle["cov_est"]
    n = rs.n_reads
    for i in range(n):
        assert tuple(res.maskvec[i]) == oracle["maskvec"][i], ("mask", i)
        assert tuple(res.cmask[i]) == oracle["cmask"][i], ("cmask", i)
        assert res.repeat_annotation[i] == oracle["repeat_annotation"][i], ("rep", i)
        assert res.hinges.get(i, []) == oracle["hinges"].get(i, []), ("hinge", i)

    # at least some structure must exist for the test to be meaningful
    if fixture == "small_sim":
        assert sum(len(v) for v in oracle["repeat_annotation"]) > 0


def test_filter_outputs_written(small_sim, tmp_path):
    rs, ov = small_sim["read_store"], small_sim["overlaps"]
    cfg = nominal_config()
    prefix = str(tmp_path / "eco")
    run_filter(rs, [ov], cfg, out_prefix=prefix)
    mas = open(prefix + ".mas").read().splitlines()
    assert len(mas) == rs.n_reads
    first = mas[0].split()
    assert len(first) == 3 and first[0] == "0"
    hgl = open(prefix + ".hinges.txt").read().splitlines()
    # reference writes i in [r_begin, r_end) — one fewer than reads
    assert len(hgl) == rs.n_reads - 1
    rep = open(prefix + ".repeat.txt").read().splitlines()
    assert len(rep) == rs.n_reads
    assert open(prefix + ".homologous.txt").read() == ""


def test_filter_multipart_equivalent(small_sim, tmp_path):
    """Multi-part (--mlas) run gives identical masks to single-part when
    coverage estimates agree per part."""
    from hinge_tpu.io.las import split_las

    rs, ov = small_sim["read_store"], small_sim["overlaps"]
    cfg = nominal_config()
    res1 = run_filter(rs, [ov], cfg)
    parts = split_las(ov, rs.n_reads, max_records=ov.n // 2 + 10)
    assert len(parts) >= 2
    res2 = run_filter(rs, parts, cfg)
    # masks agree for reads in the first part (later parts may see different
    # MIN_COV evolution — the reference has the same property)
    r_end0 = int(parts[0].a_id[-1])
    np.testing.assert_array_equal(res1.maskvec[: r_end0 + 1], res2.maskvec[: r_end0 + 1])
