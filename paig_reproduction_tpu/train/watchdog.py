"""Hung-accelerator watchdog (TPU-side extension, no reference
counterpart).

The TPU backend on this machine class is reached through a network
tunnel, and a dropped tunnel does not error the in-flight RPC — it
leaves the client blocked forever inside a C++ wait (observed 2026-08-20:
a 400-epoch run froze at epoch 63 when the tunnel restarted; the process
sat on a futex for 35+ minutes with the socket ESTABLISHED and had to be
killed by hand, wasting its whole budget). Preempted/restarted
accelerator backends are a fact of life for long TPU jobs, so the
framework treats a wedged device RPC as a *detectable failure*, like NaNs
or OOM, instead of an eternal hang:

- the training/eval loops ``pet()`` the watchdog once per dispatched
  batch/chunk (host-side progress);
- a daemon thread checks the heartbeat; if no pet lands for
  ``timeout_secs``, it logs the stall, flushes logs, and hard-exits the
  process with :data:`EXIT_CODE` (75, EX_TEMPFAIL);
- a supervisor (e.g. ``tools/tpu_queue_r5d.sh``) distinguishes that exit
  code and relaunches with ``--use_ckpt`` to resume from the last
  checkpoint.

``timeout_secs`` must exceed the worst single XLA compile on the target
(first fused-chunk compiles through the tunnel run minutes); the CLI
default (``--watchdog_secs=900``, 0 = off) clears the observed worst
case with margin while still converting an infinite hang into a bounded
one.

**Adaptive mode** (``adaptive_floor_secs`` > 0, CLI
``--watchdog_floor_secs``): a fixed timeout sized for the worst-case
compile wastes most of its window once the loop reaches steady state —
a 2100 s ceiling on a task stepping every ~2 s burned 35 idle minutes
before a 2026-08-21 tunnel wedge at epoch 120 was noticed (it was killed
by hand; this mode is that incident's fix). After ``WARMUP_PETS``
heartbeats the effective timeout tightens to
``clamp(ADAPT_FACTOR * ewma(inter-pet interval), floor, timeout)``:
the ceiling still covers the first compiles (no pets have landed, so
adaptation is inactive), and the floor is the user's bound on mid-run
recompiles (graph swaps for aux triggers/rescues; keep >= 300 s unless
the compile cache is warm). A false fire only costs one bounded
resume cycle — the supervisor relaunches from the last checkpoint —
so the floor trades minutes-of-detection against rare resume churn.

``os._exit`` (not ``sys.exit``) is deliberate: the main thread is stuck
in non-returning C++ and Python-level exceptions or signal handlers
never run. State loss is bounded by the last checkpoint, exactly as for
a power failure.
"""

from __future__ import annotations

import logging
import os
import sys
import threading
import time

logger = logging.getLogger("paig")

#: Process exit code when the watchdog fires (EX_TEMPFAIL: retryable).
EXIT_CODE = 75

#: Heartbeats observed before the adaptive timeout activates (lets the
#: interval estimate settle past the first compiles' long gaps).
WARMUP_PETS = 20

#: Adaptive effective timeout = ADAPT_FACTOR x EWMA(inter-pet interval),
#: clamped to [adaptive_floor_secs, timeout].
ADAPT_FACTOR = 100.0


class DeviceWatchdog:
    """Heartbeat monitor for blocking accelerator calls.

    ``start()`` is idempotent; ``pet()`` is cheap enough for per-batch
    call sites (one ``time.monotonic`` store); ``stop()`` disarms
    without killing the thread (it exits on its next wake)."""

    def __init__(self, timeout_secs: float, note: str = "",
                 adaptive_floor_secs: float = 0.0):
        self.timeout = float(timeout_secs)
        self.floor = float(adaptive_floor_secs)
        self.note = note
        self._last = time.monotonic()
        self._armed = False
        self._thread: threading.Thread | None = None
        self._pets = 0
        self._ewma = 0.0

    def pet(self):
        now = time.monotonic()
        if self.floor > 0:
            dt = now - self._last
            # Gaps at the ceiling scale are compiles/stalls, not loop
            # cadence; folding them in would only loosen the estimate.
            if 0.0 < dt < self.timeout:
                self._ewma = dt if self._pets == 0 else (
                    0.9 * self._ewma + 0.1 * dt)
                self._pets += 1
        self._last = now

    def effective_timeout(self) -> float:
        """Fixed ``timeout`` until warm-up completes; then the adapted
        value clamped to [floor, timeout]."""
        if self.floor <= 0 or self._pets < WARMUP_PETS:
            return self.timeout
        return max(self.floor, min(self.timeout, ADAPT_FACTOR * self._ewma))

    def start(self):
        if self.timeout <= 0 or self._armed:
            return
        self._armed = True
        self._last = time.monotonic()
        self._thread = threading.Thread(
            target=self._watch, name="paig-device-watchdog", daemon=True)
        self._thread.start()
        logger.info("device watchdog armed (%.0fs heartbeat timeout)",
                    self.timeout)

    def stop(self):
        self._armed = False

    def _watch(self):
        base = max(1.0, min(15.0, self.timeout / 4.0))
        if self.floor > 0:
            # Adaptive mode exists to notice wedges on the minutes
            # scale; poll at 1 Hz so a tightened limit is honored
            # promptly (one wake/sec is noise next to a train step).
            base = 1.0
        while self._armed:
            limit = self.effective_timeout()
            time.sleep(max(1.0, min(base, limit / 4.0)))
            stale = time.monotonic() - self._last
            limit = self.effective_timeout()
            if self._armed and stale > limit:
                self._fire(stale, limit)
                return

    def _fire(self, stale: float, limit: float):
        logger.error(
            "device watchdog: no loop progress for %.0fs (> %.0fs) — "
            "accelerator RPC presumed hung%s; exiting %d so a "
            "supervisor can resume from the last checkpoint",
            stale, limit,
            " [%s]" % self.note if self.note else "", EXIT_CODE)
        for h in logger.handlers:
            try:
                h.flush()
            except Exception:
                pass
        try:
            sys.stdout.flush()
            sys.stderr.flush()
        except Exception:
            pass
        os._exit(EXIT_CODE)
