"""The device-integrity guard (utils/integrity.py): host-golden checks of
the accelerator compute path, run by the trainer at startup/checkpoint/eval
and by bench.py.  Motivated by an observed incident where a degrading
remote TPU returned all-zero goal scores at full speed, fabricating
perfect prune-task results; see the module docstring."""

import numpy as np
import pytest

from safelife_tpu.utils import integrity


def test_integrity_passes_on_healthy_backend():
    assert integrity.check_device_integrity()


def test_integrity_detects_corrupted_outputs(monkeypatch):
    """Simulate the observed failure (score chain silently zeroed): the
    check must raise, naming the corrupted fields."""
    real = integrity._device_outputs

    def corrupted(*args):
        out = dict(real(*args))
        out["points"] = out["points"] * 0          # the incident signature
        out["completed"] = out["completed"] * 0
        return out

    monkeypatch.setattr(integrity, "_device_outputs", corrupted)
    with pytest.raises(integrity.DeviceIntegrityError) as err:
        integrity.check_device_integrity()
    assert "points" in str(err.value) and "completed" in str(err.value)
    assert integrity.check_device_integrity(raise_on_fail=False) is False


def test_integrity_detects_ca_corruption(monkeypatch):
    real = integrity._device_outputs

    def corrupted(*args):
        out = dict(real(*args))
        out["adv"] = out["adv"] ^ np.uint16(1)  # single flipped bitplane
        return out

    monkeypatch.setattr(integrity, "_device_outputs", corrupted)
    with pytest.raises(integrity.DeviceIntegrityError, match="adv"):
        integrity.check_device_integrity()


def test_integrity_kill_switch(monkeypatch):
    monkeypatch.setenv("SAFELIFE_INTEGRITY", "0")
    monkeypatch.setattr(integrity, "_device_outputs",
                        lambda *a: (_ for _ in ()).throw(AssertionError))
    assert integrity.check_device_integrity()
