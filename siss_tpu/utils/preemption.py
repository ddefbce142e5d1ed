"""Preemption-safe training: save a resumable checkpoint on SIGTERM.

The reference has no failure handling beyond a 7200 s NCCL timeout
(SURVEY §5); TPU pods are routinely preempted, so tasks register a
SIGTERM/SIGINT hook that requests a graceful stop — the training loop
checks ``should_stop`` once per step, saves a full ``state`` bundle, and
exits cleanly so ``resume_from_checkpoint=latest`` continues the run.
"""

from __future__ import annotations

import signal
import threading

# Process-wide stop flag: a preemption signal concerns the whole process,
# regardless of which guard instance was installed when it arrived.
_STOP = threading.Event()


class PreemptionGuard:
    def __init__(self):
        self._stop = _STOP
        self._installed = False
        self._prev = {}

    def install(self):
        """Idempotent; only from the main thread (signal module rule)."""
        if self._installed or threading.current_thread() is not threading.main_thread():
            return self
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):
                pass
        self._installed = True
        return self

    def _handler(self, signum, frame):
        print(f"[preemption] signal {signum} received; will checkpoint and stop")
        self._stop.set()
        # second signal falls through to the previous handler (force-quit)
        prev = self._prev.get(signum, signal.SIG_DFL)
        try:
            signal.signal(signum, prev)
        except (ValueError, OSError):
            pass

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()

    def reset(self):
        """Clear the process-wide flag (tests / deliberate multi-run)."""
        self._stop.clear()
        return self
