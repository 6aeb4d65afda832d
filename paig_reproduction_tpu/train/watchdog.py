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


class DeviceWatchdog:
    """Heartbeat monitor for blocking accelerator calls.

    ``start()`` is idempotent; ``pet()`` is cheap enough for per-batch
    call sites (one ``time.monotonic`` store); ``stop()`` disarms
    without killing the thread (it exits on its next wake)."""

    def __init__(self, timeout_secs: float, note: str = ""):
        self.timeout = float(timeout_secs)
        self.note = note
        self._last = time.monotonic()
        self._armed = False
        self._thread: threading.Thread | None = None

    def pet(self):
        self._last = time.monotonic()

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
        interval = max(1.0, min(15.0, self.timeout / 4.0))
        while self._armed:
            time.sleep(interval)
            stale = time.monotonic() - self._last
            if self._armed and stale > self.timeout:
                self._fire(stale)
                return

    def _fire(self, stale: float):
        logger.error(
            "device watchdog: no loop progress for %.0fs (> %.0fs) — "
            "accelerator RPC presumed hung%s; exiting %d so a "
            "supervisor can resume from the last checkpoint",
            stale, self.timeout,
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
