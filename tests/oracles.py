"""Scalar oracles: direct transcriptions of the reference's loops, used to
validate the vectorized kernels. Each function cites the C++ it mirrors."""

from typing import List, Tuple

import numpy as np


def profile_coverage_oracle(
    starts: np.ndarray, ends: np.ndarray, reso: int, cutoff: int
) -> List[Tuple[int, int]]:
    """LAInterface::profileCoverage (LAInterface.cpp:4298-4320)."""
    events = []
    for s, e in zip(starts, ends):
        events.append((int(s) + cutoff, 1))
        events.append((int(e) - cutoff, -1))
    events.sort(key=lambda x: x[0])  # compare_event sorts by .first only
    coverage = []
    pos = 0
    i = 0
    count = 0
    while pos < len(events):
        while pos < len(events) and events[pos][0] < i * reso:
            count += events[pos][1]
            pos += 1
        coverage.append((i * reso, count))
        i += 1
    return coverage


def qv_mask_oracle(qv_binary: np.ndarray, tspace: int) -> Tuple[int, int]:
    """filter.cpp:343-369 (QV already binarized: 1 = good)."""
    s = e = 0
    mx = 0
    maxs = maxe = 0
    n = len(qv_binary)
    for j in range(n):
        if qv_binary[j] == 1 and j < n - 1:
            e += 1
        else:
            if e - s > mx:
                maxe, maxs = e, s
                mx = e - s
            s = j + 1
            e = j + 1
    return maxs * tspace, maxe * tspace


def coverage_mask_oracle(
    cutoff_coverage: List[Tuple[int, int]], min_cov: int, reso: int
) -> Tuple[int, int, int, int]:
    """filter.cpp:696-728: longest positive run after subtracting MIN_COV."""
    cc = [(p, max(c - min_cov, 0)) for p, c in cutoff_coverage]
    start = 0
    end = start
    maxlen = 0
    maxstart = maxend = 0
    start_coord = end_coord = 0
    max_start_coord = max_end_coord = 0
    for j in range(len(cc)):
        if cc[j][1] > 0:
            end = cc[j][0]
            end_coord = j
        else:
            if end > start:
                if end - start - reso > maxlen:
                    maxlen = end - start - reso
                    maxstart = start + reso
                    maxend = end
                    max_start_coord = start_coord + 1
                    max_end_coord = end_coord
            start = cc[j][0]
            start_coord = j
            end_coord = start_coord
            end = start
    return maxstart, maxend, max_start_coord, max_end_coord


def repeat_annotation_oracle(
    coverage: List[Tuple[int, int]],
    mask: Tuple[int, int],
    min_cov: int,
    coverage_fraction: int,
    min_thresh: int,
    max_thresh: int,
    no_hinge_region: int,
) -> List[Tuple[int, int]]:
    """filter.cpp:604-613 (gradient) + 796-813 (threshold)."""
    cg = []
    if len(coverage) >= 2:
        for j in range(len(coverage) - 1):
            cg.append((coverage[j][0], coverage[j + 1][1] - coverage[j][1]))
    else:
        cg.append((0, 0))
    anno = []
    for j in range(len(cg) - 1):
        if mask[0] + no_hinge_region <= cg[j][0] <= mask[1] - no_hinge_region:
            thresh = min(
                max((coverage[j][1] + min_cov) // coverage_fraction, min_thresh),
                max_thresh,
            )
            if cg[j][1] > thresh:
                anno.append((cg[j][0], 1))
            elif cg[j][1] < -thresh:
                anno.append((cg[j][0], -1))
    return anno


def merge_annotations_oracle(anno: List[Tuple[int, int]], gap: int) -> List[Tuple[int, int]]:
    """filter.cpp:817-829: merge nearby same-sign annotations in place."""
    a = list(anno)
    i = 0
    while i < len(a):
        if i + 1 < len(a):
            if a[i][1] == 1 and a[i + 1][1] == 1 and a[i + 1][0] - a[i][0] < gap:
                del a[i + 1]
            elif a[i][1] == -1 and a[i + 1][1] == -1 and a[i + 1][0] - a[i][0] < gap:
                del a[i]
            else:
                i += 1
        else:
            i += 1
    return a


def trim_overlap_oracle(
    a_start, a_end, b_start, b_end, rc,
    eff_a_start, eff_a_end, eff_b_start, eff_b_end,
    trace_pairs, tspace=100,
):
    """LOverlap::trim_overlap (LAInterface.cpp:4552-4683). Returns
    (eff_a_match_start, eff_a_match_end, eff_b_match_start, eff_b_match_end,
    active)."""
    tps = []
    if rc == 0:
        tps.append((a_start, b_start))
    else:
        tps.append((a_start, b_end))
    rev_sign = 1 - 2 * rc
    cur_a = a_start
    npairs = len(trace_pairs)
    for j in range(npairs - 1):
        if cur_a % tspace != 0:
            cur_a = ((cur_a + tspace - 1) // tspace) * tspace
        else:
            cur_a += tspace
        tps.append((cur_a, tps[-1][1] + rev_sign * int(trace_pairs[j][1])))
    if rc == 0:
        tps.append((a_end, b_end))
    else:
        tps.append((a_end, b_start))

    ams, ame, bms, bme = a_start, a_end, b_start, b_end
    sidx = len(tps)
    eidx = 0
    if rc == 0:
        for i, (ta, tb) in enumerate(tps):
            if ta >= eff_a_start and tb >= eff_b_start:
                ams, bms, sidx = ta, tb, i
                break
        for i in range(len(tps) - 1, -1, -1):
            ta, tb = tps[i]
            if ta <= eff_a_end and tb <= eff_b_end:
                ame, bme, eidx = ta, tb, i
                break
    else:
        for i, (ta, tb) in enumerate(tps):
            if ta >= eff_a_start and tb <= eff_b_end:
                ams, bme, sidx = ta, tb, i
                break
        for i in range(len(tps) - 1, -1, -1):
            ta, tb = tps[i]
            if ta <= eff_a_end and tb >= eff_b_start:
                ame, bms, eidx = ta, tb, i
                break
    active = not (sidx >= eidx)
    return ams, ame, bms, bme, active


# MatchType codes shared with hinge_tpu.ops.classify
FORWARD, BACKWARD, ACOVERB, BCOVERA, UNDEFINED, INTERNAL, NOT_ACTIVE = 0, 1, 2, 3, 4, 5, 6
FORWARD_INTERNAL, BACKWARD_INTERNAL = 12, 13


def add_types_asymmetric_oracle(
    eff_a_match_start, eff_a_match_end, eff_b_match_start, eff_b_match_end,
    eff_a_read_start, eff_a_read_end, eff_b_read_start, eff_b_read_end,
    rc, max_overhang, min_overhang,
):
    """LOverlap::AddTypesAsymmetric (LAInterface.cpp:4721-4806)."""
    oal = eff_a_match_start - eff_a_read_start
    oar = eff_a_read_end - eff_a_match_end
    obl = eff_b_match_start - eff_b_read_start
    obr = eff_b_read_end - eff_b_match_end
    if rc == 1:
        obl, obr = obr, obl
    t = UNDEFINED
    if max(oal, oar) < max_overhang and min(obl, obr) > min_overhang:
        t = BCOVERA
    elif max(obl, obr) < max_overhang and min(oal, oar) > min_overhang:
        t = ACOVERB
    elif min(oal, oar) > max_overhang:
        t = INTERNAL
    elif oal <= max_overhang:
        if obr <= max_overhang and obl >= max_overhang:
            t = BACKWARD
        elif obr >= max_overhang and obl >= max_overhang:
            t = BACKWARD_INTERNAL
    elif oar <= max_overhang:
        if obl <= max_overhang and obr >= max_overhang:
            t = FORWARD
        elif obl >= max_overhang and obr >= max_overhang:
            t = FORWARD_INTERNAL
        else:
            t = UNDEFINED
    return t


def get_matching_position_oracle(a_start, a_end, b_start, b_end, rc, trace_pairs, pos_a, tspace=100):
    """LOverlap::GetMatchingPosition (LAInterface.cpp:4498-4546)."""
    if pos_a < a_start or pos_a > a_end:
        return -1
    rev_sign = 1 - 2 * rc
    cur_a = a_start
    cur_b = b_start if rc == 0 else b_end
    npairs = len(trace_pairs)
    for j in range(npairs - 1):
        if cur_a % tspace != 0:
            next_a = ((cur_a + tspace - 1) // tspace) * tspace
        else:
            next_a = cur_a + tspace
        if next_a >= pos_a:
            return cur_b + pos_a - cur_a
        cur_b = cur_b + rev_sign * int(trace_pairs[j][1])
        cur_a = next_a
    if cur_a < pos_a:
        return cur_b + pos_a - cur_a
    return -2
