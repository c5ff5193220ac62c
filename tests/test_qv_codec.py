"""QV codec round-trip: hinge_tpu/io/qv.py decoding vs the REFERENCE's
vendored compressor (QV.c, built by refbuild/build.sh + qv_harness).

Covers all four scheme layouts: deletion run-coding on/off (delChar),
substitution run-coding on/off (subChar needs >=200k chars with a dominant
symbol, QV.c:912 Create_QVcoding), plus the lossy ins/mrg scaling.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFBUILD = os.path.join(REPO, "refbuild")
HARNESS = os.path.join(REFBUILD, "bin", "qv_harness")


@pytest.fixture(scope="session")
def harness():
    r = subprocess.run(["bash", os.path.join(REFBUILD, "build.sh")],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(HARNESS)
    return HARNESS


def _make_quiva(path, n_reads, mean_len, rng, with_runs):
    """Synthetic .quiva; returns the raw 5 streams per read (bytes)."""
    qv_lo, qv_hi = 0x21, 0x68  # printable QV band
    del_char = ord("o")
    entries = []
    with open(path, "w") as f:
        for i in range(n_reads):
            rlen = int(mean_len + rng.integers(-mean_len // 4, mean_len // 4))
            tag = rng.choice(list(b"acgt"), rlen)
            dqv = rng.integers(qv_lo, qv_hi, rlen)
            if with_runs:
                # 'n' tag positions carry the (future) delChar with long runs
                run_at = rng.random(rlen) < 0.45
                # lengthen into runs
                for k in range(1, rlen):
                    if run_at[k - 1] and rng.random() < 0.7:
                        run_at[k] = True
                tag[run_at] = ord("n")
                dqv[run_at] = del_char
                # one run >= 255 to force the 16-bit escape
                if i == 0 and rlen > 400:
                    tag[50:350] = ord("n")
                    dqv[50:350] = del_char
            iqv = rng.integers(qv_lo, qv_hi, rlen)
            mqv = rng.integers(qv_lo, qv_hi, rlen)
            if with_runs:
                # dominant sub char (>=50% of total) to enable subChar
                sqv = np.where(rng.random(rlen) < 0.7, ord("f"),
                               rng.integers(qv_lo, qv_hi, rlen))
            else:
                sqv = rng.integers(qv_lo, qv_hi, rlen)
            streams = tuple(
                bytes(bytearray(int(x) for x in arr))
                for arr in (dqv, tag, iqv, mqv, sqv)
            )
            entries.append(streams)
            f.write(f"@fake/{i}/0_{rlen} RQ=0.850\n")
            for s in streams:
                f.write(s.decode("latin-1") + "\n")
    return entries


@pytest.mark.parametrize("with_runs,lossy", [(False, 0), (True, 0), (True, 1)])
def test_qvs_roundtrip_vs_reference_compressor(harness, tmp_path, with_runs, lossy):
    from hinge_tpu.io.qv import read_quiva_qvs

    rng = np.random.default_rng(17 + with_runs + lossy)
    quiva = str(tmp_path / "in.quiva")
    qvs = str(tmp_path / "out.qvs")
    if with_runs:
        n_reads, mean_len = 300, 800  # >=200k chars: enables subChar
    else:
        n_reads, mean_len = 20, 500
    entries = _make_quiva(quiva, n_reads, mean_len, rng, with_runs)
    r = subprocess.run([harness, quiva, str(lossy), qvs],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]

    rlens = [len(e[0]) for e in entries]
    decoded = read_quiva_qvs(qvs, rlens)
    assert len(decoded) == len(entries)
    n_checked = 0
    for got, (dqv, tag, iqv, mqv, sqv) in zip(decoded, entries):
        assert got["del_qv"] == dqv
        assert got["del_tag"] == tag
        if lossy:
            assert got["ins_qv"] == bytes((b >> 1) << 1 for b in iqv)
            assert got["mrg_qv"] == bytes((b >> 2) << 2 for b in mqv)
        else:
            assert got["ins_qv"] == iqv
            assert got["mrg_qv"] == mqv
        assert got["sub_qv"] == sqv
        n_checked += 1
    assert n_checked == n_reads


def test_qvs_run_paths_actually_taken(harness, tmp_path):
    """The with_runs dataset must exercise BOTH run-coded schemes."""
    from hinge_tpu.io.qv import read_qvcoding

    rng = np.random.default_rng(99)
    quiva = str(tmp_path / "in.quiva")
    qvs = str(tmp_path / "out.qvs")
    _make_quiva(quiva, 300, 800, rng, with_runs=True)
    subprocess.run([harness, quiva, "0", qvs], check=True, timeout=120)
    with open(qvs, "rb") as f:
        coding = read_qvcoding(f)
    assert coding.del_char == ord("o")
    assert coding.sub_char == ord("f")
    assert coding.drun_scheme is not None and coding.srun_scheme is not None


def test_qvs_truncated_raises(harness, tmp_path):
    from hinge_tpu.io.qv import read_quiva_qvs

    rng = np.random.default_rng(5)
    quiva = str(tmp_path / "in.quiva")
    qvs = str(tmp_path / "out.qvs")
    entries = _make_quiva(quiva, 5, 400, rng, with_runs=False)
    subprocess.run([harness, quiva, "0", qvs], check=True, timeout=120)
    data = open(qvs, "rb").read()
    open(qvs, "wb").write(data[: len(data) // 2])
    with pytest.raises(ValueError, match="qvs"):
        read_quiva_qvs(qvs, [len(e[0]) for e in entries])


def test_read_db_qvs_integration(harness, tmp_path):
    """Full DB path: write_db + a harness-compressed .qvs alongside the
    hidden .idx/.bps, decoded via read_db_qvs (DB.c Open_QVs layout)."""
    from hinge_tpu.data.simulator import SimParams, simulate
    from hinge_tpu.io.dazz_db import write_db, _db_paths
    from hinge_tpu.io.qv import read_db_qvs

    rng = np.random.default_rng(23)
    _, _, rs, _ = simulate(SimParams(genome_len=15_000, coverage=4.0, seed=2))
    db = str(tmp_path / "reads.db")
    write_db(db, rs)
    quiva = str(tmp_path / "reads.quiva")
    entries = []
    with open(quiva, "w") as f:
        for i in range(rs.n_reads):
            rlen = int(rs.length[i])
            streams = tuple(
                bytes(bytearray(int(x) for x in arr))
                for arr in (
                    rng.integers(0x21, 0x68, rlen), rng.choice(list(b"acgt"), rlen),
                    rng.integers(0x21, 0x68, rlen), rng.integers(0x21, 0x68, rlen),
                    rng.integers(0x21, 0x68, rlen),
                )
            )
            entries.append(streams)
            f.write(f"@fake/{i}/0_{rlen} RQ=0.850\n")
            for s in streams:
                f.write(s.decode("latin-1") + "\n")
    stub, idx_path, _ = _db_paths(db)
    qvs_path = idx_path[: -len(".idx")] + ".qvs"
    subprocess.run([harness, quiva, "0", qvs_path], check=True, timeout=120)
    decoded = read_db_qvs(db)
    assert len(decoded) == rs.n_reads
    for got, (dqv, tag, iqv, mqv, sqv) in zip(decoded, entries):
        assert got["del_qv"] == dqv and got["del_tag"] == tag
        assert got["ins_qv"] == iqv and got["mrg_qv"] == mqv
        assert got["sub_qv"] == sqv


@pytest.mark.parametrize("with_runs,lossy", [(False, 0), (True, 0), (True, 1)])
def test_qvs_encode_roundtrip_own_decoder(tmp_path, with_runs, lossy):
    """Write path (QV.c Compress_QV side re-derived): encode entries and
    decode them back with our own decoder."""
    from hinge_tpu.io.qv import read_quiva_qvs, write_quiva_qvs

    rng = np.random.default_rng(23 + with_runs + lossy)
    quiva = str(tmp_path / "in.quiva")
    if with_runs:
        n_reads, mean_len = 300, 800
    else:
        n_reads, mean_len = 20, 500
    raw = _make_quiva(quiva, n_reads, mean_len, rng, with_runs)
    entries = [
        dict(del_qv=d, del_tag=t, ins_qv=i, mrg_qv=m, sub_qv=s)
        for d, t, i, m, s in raw
    ]
    qvs = str(tmp_path / "enc.qvs")
    enc = write_quiva_qvs(qvs, entries, lossy=bool(lossy))
    if with_runs:
        assert enc.del_char >= 0, "run path must engage"
        assert enc.sub_char >= 0
    decoded = read_quiva_qvs(qvs, [len(e["del_qv"]) for e in entries])
    for got, e in zip(decoded, entries):
        assert got["del_qv"] == e["del_qv"]
        assert got["del_tag"] == e["del_tag"]
        if lossy:
            assert got["ins_qv"] == bytes((b >> 1) << 1 for b in e["ins_qv"])
            assert got["mrg_qv"] == bytes((b >> 2) << 2 for b in e["mrg_qv"])
        else:
            assert got["ins_qv"] == e["ins_qv"]
            assert got["mrg_qv"] == e["mrg_qv"]
        assert got["sub_qv"] == e["sub_qv"]


@pytest.mark.parametrize("with_runs", [False, True])
def test_qvs_encode_decodes_with_reference_decompressor(harness, tmp_path,
                                                        with_runs):
    """Our encoder's output must decode bit-exactly with the VENDORED
    QV.c decompressor (refbuild/qv_unharness.c)."""
    from hinge_tpu.io.qv import write_quiva_qvs

    unharness = os.path.join(REFBUILD, "bin", "qv_unharness")
    assert os.path.exists(unharness)
    rng = np.random.default_rng(31 + with_runs)
    quiva = str(tmp_path / "in.quiva")
    if with_runs:
        n_reads, mean_len = 300, 800
    else:
        n_reads, mean_len = 20, 500
    raw = _make_quiva(quiva, n_reads, mean_len, rng, with_runs)
    entries = [
        dict(del_qv=d, del_tag=t, ins_qv=i, mrg_qv=m, sub_qv=s)
        for d, t, i, m, s in raw
    ]
    qvs = str(tmp_path / "enc.qvs")
    write_quiva_qvs(qvs, entries)
    lens_txt = str(tmp_path / "lens.txt")
    with open(lens_txt, "w") as f:
        for e in entries:
            f.write(f"{len(e['del_qv'])}\n")
    out_txt = str(tmp_path / "dec.txt")
    r = subprocess.run([unharness, qvs, lens_txt, out_txt],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]
    lines = open(out_txt, "rb").read().split(b"\n")
    for i, e in enumerate(entries):
        d, t, iq, m, s = lines[5 * i : 5 * i + 5]
        assert d == e["del_qv"], i
        assert t == e["del_tag"], i
        assert iq == e["ins_qv"], i
        assert m == e["mrg_qv"], i
        assert s == e["sub_qv"], i
