"""Hung-RPC watchdog (--watchdog_secs) and crash-resume schedule
accounting (--resume_remaining_epochs). The watchdog exists because a
dropped accelerator tunnel leaves the in-flight RPC blocked forever
(train/watchdog.py module docstring has the incident)."""
import time

import numpy as np
import pytest

from paig_reproduction_tpu.train import watchdog as wd_mod
from paig_reproduction_tpu.train.watchdog import EXIT_CODE, DeviceWatchdog


def test_fires_on_stale_heartbeat(monkeypatch):
    fired = []
    monkeypatch.setattr(wd_mod.os, "_exit", lambda code: fired.append(code))
    wd = DeviceWatchdog(timeout_secs=0.4)
    wd.start()
    # No pets: the monitor thread's first wake (>=1s interval floor)
    # already sees a stale heartbeat.
    for _ in range(40):
        if fired:
            break
        time.sleep(0.1)
    assert fired == [EXIT_CODE]


def test_petting_keeps_it_alive(monkeypatch):
    fired = []
    monkeypatch.setattr(wd_mod.os, "_exit", lambda code: fired.append(code))
    wd = DeviceWatchdog(timeout_secs=0.4)
    wd.start()
    t0 = time.monotonic()
    while time.monotonic() - t0 < 2.5:       # > 2 monitor wakes
        wd.pet()
        time.sleep(0.05)
    assert fired == []
    wd.stop()


def test_stop_disarms(monkeypatch):
    fired = []
    monkeypatch.setattr(wd_mod.os, "_exit", lambda code: fired.append(code))
    wd = DeviceWatchdog(timeout_secs=0.4)
    wd.start()
    wd.stop()
    time.sleep(1.6)
    assert fired == []


def test_zero_timeout_never_starts():
    wd = DeviceWatchdog(timeout_secs=0)
    wd.start()
    assert wd._thread is None


def test_trainer_pets_lazily():
    """Trainer._wd_pet must not spawn a thread when watchdog_secs is 0,
    and must arm exactly once when it is set."""
    from paig_reproduction_tpu.train.trainer import Trainer

    t = Trainer.__new__(Trainer)       # attribute surface only
    t.watchdog_secs = 0.0
    t._watchdog = None
    t._wd_pet()
    assert t._watchdog is None
    t.watchdog_secs = 3600.0
    t._wd_pet()
    assert t._watchdog is not None and t._watchdog._armed
    first = t._watchdog
    t._wd_pet()
    assert t._watchdog is first
    t._watchdog.stop()
