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
the main thread (or with ``timeout_s=None``) calls run unguarded —
documented fallback, not an error, so the same code works under unusual
executors. A C extension that never re-enters the interpreter cannot be
interrupted by any in-process mechanism; a real OCR deployment pairs this
with a subprocess-level kill for the native backend (the reference's
LibreOffice/pdftoppm child processes die the same way).

Cost model (measured): arming costs ~4-15 µs/row (4 syscalls), which is
~20% of END-TO-END ingest throughput when the guarded kernel itself runs in
tens of µs (the memoized tokenizer). :class:`BatchWatchdog` amortizes it
two ways: the handler installs once per BATCH, and rows arm the timer only
when their ``cost_hint`` (input size) could plausibly reach the budget —
for a LINEAR-time kernel a small row cannot time out, so the hot path stays
syscall-free, while heavyweight backends (native OCR at ~seconds/row) arm
every row at negligible relative cost.
"""

from __future__ import annotations

import signal
import threading


class WatchdogTimeout(Exception):
    """Raised inside the guarded call when the row budget expires."""


def _raise_timeout(_signum, _frame):
    raise WatchdogTimeout()


class BatchWatchdog:
    """Context manager guarding many per-row calls with one handler install.

    ``arm_min_hint``: rows whose ``cost_hint`` is below this run unguarded.
    Callers set it ONLY for kernels with known (linear) cost in the hint —
    e.g. the engine's tokenizer at ~30 ns/char can't reach a 60 s budget
    below ~10^9 chars, so a 100 KB gate is conservative by four orders of
    magnitude. Pass 0 (default) to arm every guarded row.
    """

    def __init__(self, timeout_s: float | None, *, arm_min_hint: int = 0) -> None:
        self.timeout_s = timeout_s
        self.arm_min_hint = arm_min_hint
        self._installed = False
        self._old_handler = None

    def __enter__(self) -> "BatchWatchdog":
        if (self.timeout_s is not None
                and threading.current_thread() is threading.main_thread()):
            self._old_handler = signal.signal(signal.SIGALRM, _raise_timeout)
            self._installed = True
        return self

    def __exit__(self, *_exc) -> None:
        if self._installed:
            signal.setitimer(signal.ITIMER_REAL, 0)
            signal.signal(signal.SIGALRM, self._old_handler)
            self._installed = False

    def run(self, fn, *args, cost_hint: int | None = None):
        """Run ``fn(*args)`` under the budget; :class:`WatchdogTimeout` on
        expiry. Unguarded when the scope is inactive or ``cost_hint`` is
        below ``arm_min_hint``."""
        if not self._installed or (
            cost_hint is not None and cost_hint < self.arm_min_hint
        ):
            return fn(*args)
        signal.setitimer(signal.ITIMER_REAL, self.timeout_s)
        try:
            return fn(*args)
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0)


def run_with_timeout(fn, timeout_s: float | None, *args, **kwargs):
    """One-shot convenience wrapper around :class:`BatchWatchdog`."""
    with BatchWatchdog(timeout_s) as wd:
        return wd.run(lambda: fn(*args, **kwargs))
