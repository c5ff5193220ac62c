"""Device-link health guard (utils/device_health.py)."""
import os

import numpy as np
import pytest

from hinge_tpu.utils import device_health as DH


@pytest.fixture(autouse=True)
def _reset_verdict():
    DH._reset_state()
    yield
    DH._reset_state()


def test_forced_modes(monkeypatch):
    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "0")
    assert DH.device_transfer_ok() is False
    assert DH.best_compute_device() is not None  # CPU fallback device
    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "1")
    assert DH.device_transfer_ok() is True
    assert DH.best_compute_device() is None


def test_forced_flip_applies_mid_process(monkeypatch):
    # the env var is re-read on EVERY check: a pipeline whose link flag
    # flips between stages demotes the remaining stages
    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "1")
    assert DH.device_transfer_ok() is True
    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "0")
    assert DH.device_transfer_ok() is False


def test_healthy_verdict_expires(monkeypatch):
    DH._STATE.update(ok=True, t=0.0)  # stamp far in the past
    monkeypatch.setattr(DH.time, "monotonic", lambda: 1e9)
    # the stale verdict forces a fresh probe (observable via the re-stamp);
    # on the cpu test backend the probe short-circuits healthy
    assert DH.device_transfer_ok() is True
    assert DH._STATE["t"] == 1e9


def test_mid_assemble_demotion_completes(tmp_path, monkeypatch):
    """Verdict r4 #5: flip the forced health flag while assemble() is
    between stages; the remaining stages demote to CPU and the pipeline
    still completes with a consensus output."""
    from hinge_tpu.data.simulator import SimParams, simulate
    from hinge_tpu.io.fasta import write_fasta
    from hinge_tpu import pipeline as P

    genome, reads, rs, ov = simulate(
        SimParams(genome_len=20_000, coverage=12, seed=7))
    fasta = tmp_path / "reads.fasta"
    write_fasta(str(fasta),
                ((rs.names[i], rs.get_seq(i)) for i in range(rs.n_reads)))

    import hinge_tpu.stages.maximal as maximal_mod

    orig = maximal_mod.run_maximal

    def flip_then_run(*a, **kw):
        os.environ["HINGE_DEVICE_HEALTH"] = "0"
        return orig(*a, **kw)

    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "1")
    monkeypatch.setattr(maximal_mod, "run_maximal", flip_then_run)
    # pipeline imports run_maximal by name inside _assemble_body
    res = P.assemble(fasta=str(fasta), workdir=str(tmp_path),
                     log=lambda *a: None)
    assert res["contigs"], "pipeline must finish after mid-run demotion"


def test_slow_fetch_demotes():
    DH._STATE.update(ok=True, t=DH.time.monotonic())
    # 1MB fetched in 10s = 0.1MB/s < MIN_FETCH_BPS
    DH.report_fetch(1 << 20, 10.0)
    assert DH._STATE["demoted"] is True
    assert DH.device_transfer_ok() is False
    # small fetches never demote (latency-dominated, not rate evidence)
    DH._reset_state()
    DH._STATE.update(ok=True, t=DH.time.monotonic())
    DH.report_fetch(1 << 10, 10.0)
    assert DH._STATE["demoted"] is False


def test_cpu_backend_always_healthy():
    # conftest pins the cpu backend; the probe must short-circuit
    assert DH.device_transfer_ok() is True


def test_filter_identical_under_forced_fallback(small_sim, tmp_path, monkeypatch):
    from hinge_tpu.config import nominal_config
    from hinge_tpu.stages.filter import run_filter

    rs, ov = small_sim["read_store"], small_sim["overlaps"]
    cfg = nominal_config()
    a = run_filter(rs, [ov], cfg, out_prefix=str(tmp_path / "A"))
    DH._reset_state()
    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "0")
    b = run_filter(rs, [ov], cfg, out_prefix=str(tmp_path / "B"))
    np.testing.assert_array_equal(a.maskvec, b.maskvec)
    np.testing.assert_array_equal(a.cmask, b.cmask)
    assert a.hinges == b.hinges
    for name in ("A.mas", "A.repeat.txt", "A.hinges.txt"):
        assert (tmp_path / name).read_bytes() == \
            (tmp_path / name.replace("A", "B")).read_bytes()
