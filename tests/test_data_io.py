import numpy as np
import pytest

from hinge_tpu.data.overlaps import OverlapStore, codes_to_str, revcomp_codes, str_to_codes
from hinge_tpu.io.las import read_las, split_las, write_las
from hinge_tpu.io.paf import read_paf, write_paf
from hinge_tpu.io.fasta import read_fasta, write_fasta


def test_codes_roundtrip():
    s = "ACGTACGTTTGGCA"
    assert codes_to_str(str_to_codes(s)) == s
    assert codes_to_str(revcomp_codes(str_to_codes("ACGT"))) == "ACGT"
    assert codes_to_str(revcomp_codes(str_to_codes("AACG"))) == "CGTT"


def test_simulator_overlaps_consistent(small_sim):
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    assert ov.n > 0
    # coordinates inside reads
    assert (ov.a_start >= 0).all() and (ov.a_end <= ov.a_len).all()
    assert (ov.b_start >= 0).all() and (ov.b_end <= ov.b_len).all()
    assert (ov.a_end > ov.a_start).all()
    assert (ov.b_end > ov.b_start).all()
    # lengths consistent with the read table
    assert (ov.a_len == rs.length[ov.a_id]).all()
    # sorted by a_id
    assert (np.diff(ov.a_id) >= 0).all()


def test_simulator_overlap_bases_match(small_sim):
    """Error-free reads: the matched substrings must be identical
    (reverse-complemented when rc=1)."""
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    rng = np.random.default_rng(0)
    for k in rng.choice(ov.n, size=min(25, ov.n), replace=False):
        a = rs.get_bases(int(ov.a_id[k]))[ov.a_start[k] : ov.a_end[k]]
        b = rs.get_bases(int(ov.b_id[k]))[ov.b_start[k] : ov.b_end[k]]
        if ov.rc[k]:
            b = revcomp_codes(b)
        # circular repeats can cause slight length mismatch at boundaries;
        # require near-total agreement of the aligned prefix
        m = min(len(a), len(b))
        assert m > 0
        frac = (a[:m] == b[:m]).mean()
        assert frac > 0.99, (k, frac)


def test_trace_points_sum_to_b_span(small_sim):
    ov = small_sim["overlaps"]
    for k in range(min(50, ov.n)):
        pairs = ov.trace_pairs(k)
        assert int(pairs[:, 1].sum()) == int(ov.b_end[k] - ov.b_start[k])
        # number of pairs matches the DALIGNER segment count
        nseg = (ov.a_end[k] - 1) // ov.tspace - ov.a_start[k] // ov.tspace + 1
        assert len(pairs) == nseg


def test_las_roundtrip(tmp_path, small_sim):
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    path = str(tmp_path / "test.las")
    write_las(path, ov)
    back = read_las(path, read_lengths=rs.length)
    assert back.n == ov.n
    for f in ("a_id b_id a_start a_end b_start b_end rc tlen".split()):
        np.testing.assert_array_equal(getattr(back, f), getattr(ov, f), err_msg=f)
    # traces identical
    for k in range(0, ov.n, max(1, ov.n // 20)):
        np.testing.assert_array_equal(back.trace_pairs(k), ov.trace_pairs(k))


def test_las_large_tspace(tmp_path, small_sim):
    """tspace > TRACE_XOVR stores uint16 traces."""
    ov = small_sim["overlaps"]
    path = str(tmp_path / "t16.las")
    write_las(path, ov, tspace=126)
    back = read_las(path)
    assert back.tspace == 126
    np.testing.assert_array_equal(back.a_id, ov.a_id)


def test_split_las(small_sim):
    ov = small_sim["overlaps"]
    n_reads = small_sim["read_store"].n_reads
    parts = split_las(ov, n_reads, max_records=max(10, ov.n // 3))
    assert sum(p.n for p in parts) == ov.n
    # parts are contiguous and don't split pileups
    last_a = -1
    for p in parts:
        assert p.a_id[0] > last_a
        last_a = p.a_id[-1]


def test_split_las_mid_pileup(small_sim):
    """split_pileups=True cuts at exact record counts: one A-read's
    records can straddle parts (the block-aligned-LAsplit shape that
    parity profile 93 feeds the reference binaries)."""
    ov = small_sim["overlaps"]
    n_reads = small_sim["read_store"].n_reads
    k = max(7, ov.n // 4)
    parts = split_las(ov, n_reads, k, split_pileups=True)
    assert sum(p.n for p in parts) == ov.n
    assert all(p.n == k for p in parts[:-1])
    # record order is preserved across the concatenation
    import numpy as np

    np.testing.assert_array_equal(
        np.concatenate([p.a_id for p in parts]), ov.a_id)
    # at least one boundary falls inside a pileup for this workload
    straddles = any(parts[i].a_id[-1] == parts[i + 1].a_id[0]
                    for i in range(len(parts) - 1))
    assert straddles, "workload too small to exercise the straddle shape"


def test_write_db_multi_block_roundtrip(tmp_path, small_sim):
    """A DBsplit-style block index (blocks = N + N+1 boundary lines,
    DB.h:299-311) round-trips through read_db and keeps the stub
    parseable by the same grammar the reference's Open_DB uses."""
    from hinge_tpu.io.dazz_db import read_db, write_db

    rs = small_sim["read_store"]
    path = str(tmp_path / "B.db")
    write_db(path, rs, n_blocks=3)
    stub = open(path).read().splitlines()
    nb_line = [l for l in stub if l.startswith("blocks")][0]
    assert int(nb_line.split("=")[1]) == 3
    # boundary lines: N+1 of them, first 0, last n_reads, non-decreasing
    import re

    bdata = [tuple(map(int, re.findall(r"\d+", l)))
             for l in stub if re.fullmatch(r" +\d+ +\d+", l)]
    assert len(bdata) == 4
    assert bdata[0] == (0, 0) and bdata[-1] == (rs.n_reads, rs.n_reads)
    assert all(a[0] <= b[0] for a, b in zip(bdata, bdata[1:]))
    rs2 = read_db(path)
    assert rs2.n_reads == rs.n_reads
    import numpy as np

    np.testing.assert_array_equal(rs2.length, rs.length)
    np.testing.assert_array_equal(rs2.bases, rs.bases)


def test_merge_las(tmp_path, small_sim):
    """LAmerge equivalent: split parts merge back to the original store
    byte-for-byte, and block-vs-block (interleaved) parts merge into
    (aread, bread, comp, abpos) order with stable ties."""
    from hinge_tpu.io.las import merge_las

    ov = small_sim["overlaps"]
    n_reads = small_sim["read_store"].n_reads
    parts = split_las(ov, n_reads, max_records=max(10, ov.n // 3))
    paths = []
    for i, p in enumerate(parts):
        path = str(tmp_path / f"part.{i + 1}.las")
        write_las(path, p)
        paths.append(path)
    out = str(tmp_path / "merged.las")
    merge_las(paths, out_path=out)
    # merged file == the whole store LAsorted (aread, bread, comp, abpos)
    whole = str(tmp_path / "whole.las")
    order = np.lexsort((ov.a_start, ov.rc, ov.b_id, ov.a_id))
    write_las(whole, ov.take(order).compact_traces())
    assert open(out, "rb").read() == open(whole, "rb").read()

    # block-vs-block parts (B-id split, the HPC.daligner layout): every
    # part covers all A-reads; the merge must interleave by sort key
    mid = int(np.median(ov.b_id))
    lo = ov.take(np.nonzero(ov.b_id <= mid)[0])
    hi = ov.take(np.nonzero(ov.b_id > mid)[0])
    p1, p2 = str(tmp_path / "b1.las"), str(tmp_path / "b2.las")
    write_las(p1, lo)
    write_las(p2, hi)
    merged = merge_las([p1, p2])
    assert merged.n == ov.n
    key = np.stack([merged.a_id, merged.b_id, merged.rc, merged.a_start])
    assert (np.lexsort(key[::-1]) == np.arange(merged.n)).all() or all(
        tuple(key[:, i]) <= tuple(key[:, i + 1]) for i in range(merged.n - 1)
    )


def test_merge_las_tspace_mismatch(tmp_path, small_sim):
    from hinge_tpu.io.las import merge_las

    ov = small_sim["overlaps"]
    p1, p2 = str(tmp_path / "a.las"), str(tmp_path / "b.las")
    write_las(p1, ov, tspace=100)
    write_las(p2, ov, tspace=126)
    with pytest.raises(ValueError, match="tspace"):
        merge_las([p1, p2])


def test_paf_roundtrip(tmp_path, small_sim):
    ov = small_sim["overlaps"]
    path = str(tmp_path / "test.paf")
    write_paf(path, ov)
    back = read_paf(path)
    np.testing.assert_array_equal(back.a_id, ov.a_id)
    np.testing.assert_array_equal(back.b_start, ov.b_start)
    np.testing.assert_array_equal(back.rc, ov.rc)


def test_fasta_roundtrip(tmp_path, small_sim):
    rs = small_sim["read_store"]
    path = str(tmp_path / "reads.fasta")
    write_fasta(path, ((rs.names[i], rs.get_seq(i)) for i in range(min(20, rs.n_reads))))
    back = read_fasta(path)
    assert back.n_reads == min(20, rs.n_reads)
    for i in range(back.n_reads):
        assert back.get_seq(i) == rs.get_seq(i)
        assert back.names[i] == rs.names[i]
