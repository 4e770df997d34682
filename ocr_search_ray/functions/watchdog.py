"""Per-row watchdog timeouts — the reference's skip-don't-fail semantics.

The reference wraps every convert/extract/tokenize task in a timeout and
resolves EMPTY on expiry so one pathological file never stalls the run
(``src/util/TaskQueueManager.class.js:49-53``; limits in
``src/config/AppConfig.const.js:11-19`` — 600 s convert/extract, 60 s
tokenize). The engine's counterpart is a SIGALRM interval timer around the
per-row kernel inside the batch function: on expiry the row yields a
quarantine/empty result and the batch continues.

Mechanics: Ray executes map_batches functions on the worker process's main
thread, where ``signal.setitimer(ITIMER_REAL)`` may deliver SIGALRM into
running Python bytecode — this interrupts pure-Python loops, which is
exactly the failure mode here (adversarial inputs driving a parser). Off
the main thread (or with ``timeout_s=None``) the call runs unguarded —
documented fallback, not an error, so the same code works under unusual
executors. A C extension that never re-enters the interpreter cannot be
interrupted by any in-process mechanism; a real OCR deployment pairs this
with a subprocess-level kill for the native backend (the reference's
LibreOffice/pdftoppm child processes die the same way).
"""

from __future__ import annotations

import signal
import threading


class WatchdogTimeout(Exception):
    """Raised inside the guarded call when the row budget expires."""


def run_with_timeout(fn, timeout_s: float | None, *args, **kwargs):
    """Run ``fn(*args, **kwargs)`` with a wall-clock budget.

    Raises :class:`WatchdogTimeout` on expiry. ``timeout_s=None`` or a
    non-main-thread caller runs unguarded (see module docstring).
    """
    if timeout_s is None or threading.current_thread() is not threading.main_thread():
        return fn(*args, **kwargs)

    def _handler(_signum, _frame):
        raise WatchdogTimeout()

    old_handler = signal.signal(signal.SIGALRM, _handler)
    signal.setitimer(signal.ITIMER_REAL, timeout_s)
    try:
        return fn(*args, **kwargs)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old_handler)
