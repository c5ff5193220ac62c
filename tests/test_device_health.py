"""Device-link health guard (utils/device_health.py)."""
import numpy as np
import pytest

from hinge_tpu.utils import device_health as DH


@pytest.fixture(autouse=True)
def _reset_verdict(monkeypatch):
    monkeypatch.setattr(DH, "_VERDICT", None)


def test_forced_modes(monkeypatch):
    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "0")
    assert DH.device_transfer_ok() is False
    assert DH.best_compute_device() is not None  # CPU fallback device
    monkeypatch.setattr(DH, "_VERDICT", None)
    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "1")
    assert DH.device_transfer_ok() is True
    assert DH.best_compute_device() is None


def test_cpu_backend_always_healthy():
    # conftest pins the cpu backend; the probe must short-circuit
    assert DH.device_transfer_ok() is True


def test_filter_identical_under_forced_fallback(small_sim, tmp_path, monkeypatch):
    from hinge_tpu.config import nominal_config
    from hinge_tpu.stages.filter import run_filter

    rs, ov = small_sim["read_store"], small_sim["overlaps"]
    cfg = nominal_config()
    a = run_filter(rs, [ov], cfg, out_prefix=str(tmp_path / "A"))
    monkeypatch.setattr(DH, "_VERDICT", None)
    monkeypatch.setenv("HINGE_DEVICE_HEALTH", "0")
    b = run_filter(rs, [ov], cfg, out_prefix=str(tmp_path / "B"))
    np.testing.assert_array_equal(a.maskvec, b.maskvec)
    np.testing.assert_array_equal(a.cmask, b.cmask)
    assert a.hinges == b.hinges
    for name in ("A.mas", "A.repeat.txt", "A.hinges.txt"):
        assert (tmp_path / name).read_bytes() == \
            (tmp_path / name.replace("A", "B")).read_bytes()
