"""Polling cadence for the continuous replication loop — the reference's
``Waiter`` (``ohsome-replication-update/.../utils/Waiter.java:11-47``,
behavior pinned by its ``WaiterTest.java``):

- interruptible sleep at 1-second granularity so a shutdown request is
  honored mid-wait (graceful stop, not a killed JVM);
- the changeset-wait decision: contributions wait for the changeset
  stream ONLY while changesets are at most ``CHANGESET_WAIT_ESCAPE_S``
  (120 s) behind — older than that, proceed without them (the holdback
  escape valve; the quantitative holdback itself is
  ``replication.process_until``);
- exponential retry backoff 5 → 60 s (doubling, capped) when a pass
  found nothing new, reset to 5 s as soon as progress happens.
"""

from __future__ import annotations

import threading

BASE_RETRY_S = 5
MAX_RETRY_S = 60
CHANGESET_WAIT_ESCAPE_S = 120


def not_waiting_for_changesets(contribution_ts, changeset_ts) -> bool:
    """True when the contribution loop need NOT wait on the changeset
    stream: changesets are already newer, or they lag by more than the
    120 s escape window (``Waiter.notWaitingForChangesets``)."""
    if contribution_ts < changeset_ts:
        return True
    return (contribution_ts - changeset_ts).total_seconds() > CHANGESET_WAIT_ESCAPE_S


class Waiter:
    def __init__(self, shutdown_event: threading.Event | None = None, clock=None):
        self._shutdown = shutdown_event or threading.Event()
        self._sleep1 = clock or (lambda: threading.Event().wait(1))
        self.retry_seconds = BASE_RETRY_S
        self.waits: list[tuple[int, str]] = []  # observable for tests/logs

    def sleep(self, seconds: int, reason: str) -> None:
        """Wait ``seconds``, checking the shutdown flag every second;
        raises InterruptedError on shutdown (the graceful-stop contract)."""
        self.waits.append((int(seconds), reason))
        for _ in range(int(seconds)):
            self._sleep1()
            if self._shutdown.is_set():
                raise InterruptedError(
                    "interrupted during waiting; shutting down"
                )

    def wait_for_retry(self) -> None:
        self.sleep(self.retry_seconds, "any state to change")
        self.retry_seconds = min(MAX_RETRY_S, self.retry_seconds * 2)

    def reset_retry(self) -> None:
        self.retry_seconds = BASE_RETRY_S
