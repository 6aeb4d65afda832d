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


def test_adaptive_tightens_after_warmup():
    """With a floor set, steady fast pets shrink the effective timeout
    to clamp(ADAPT_FACTOR * ewma, floor, timeout) — the 2026-08-21
    wedge (2 s epochs under a 2100 s ceiling) detected in minutes."""
    wd = DeviceWatchdog(timeout_secs=2100.0, adaptive_floor_secs=120.0)
    assert wd.effective_timeout() == 2100.0          # pre-warmup: ceiling
    base = time.monotonic()
    ticks = iter(base + 0.02 * i for i in range(200))
    real = time.monotonic
    try:
        wd_mod.time.monotonic = lambda: next(ticks)
        for _ in range(wd_mod.WARMUP_PETS + 5):
            wd.pet()
    finally:
        wd_mod.time.monotonic = real
    # ewma ~0.02s -> factor*ewma ~2s -> clamped up to the floor.
    assert wd.effective_timeout() == 120.0


def test_adaptive_respects_ceiling_and_ignores_compile_gaps():
    """Intervals >= timeout (compiles/stalls) must not enter the
    estimate, and the adapted value never exceeds the fixed timeout."""
    wd = DeviceWatchdog(timeout_secs=30.0, adaptive_floor_secs=1.0)
    base = time.monotonic()
    t = [base]

    def fake():
        return t[0]

    real = time.monotonic
    try:
        wd_mod.time.monotonic = fake
        for _ in range(wd_mod.WARMUP_PETS):
            t[0] += 0.5
            wd.pet()
        t[0] += 1000.0                                # a "compile" gap
        wd.pet()
    finally:
        wd_mod.time.monotonic = real
    # ewma stays ~0.5s: 100*0.5=50 > timeout -> clamped to the ceiling.
    assert wd.effective_timeout() == 30.0
    assert wd._ewma == pytest.approx(0.5, rel=1e-6)


def test_adaptive_fires_fast_once_tight(monkeypatch):
    fired = []
    monkeypatch.setattr(wd_mod.os, "_exit", lambda code: fired.append(code))
    wd = DeviceWatchdog(timeout_secs=3600.0, adaptive_floor_secs=0.3)
    wd.start()
    for _ in range(wd_mod.WARMUP_PETS + 1):
        wd.pet()
        time.sleep(0.002)
    # effective timeout is now ~max(0.3, 100*0.002) < 1s; stop petting.
    deadline = time.monotonic() + 20.0
    while not fired and time.monotonic() < deadline:
        time.sleep(0.1)
    assert fired == [EXIT_CODE]


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
