"""Cooperative query cancellation + deadlines (task-kill parity).

The reference aborts a running native task when Spark kills it: the JNI
bridge polls `TaskContext.isCompleted`/interrupt state between record-batch
polls and tears down the tokio runtime
(/root/reference/native-engine/auron/src/rt.rs spawn + is_task_running
checks). XLA programs are not interruptible mid-dispatch, so the TPU-native
analog is the same *cooperative* contract at the same granularity: the
executor checks a token between plan-node dispatches (eager mode), the
streaming runtime between micro-batches, and `Session.sql`/`collect`
surfaces `QueryCancelled`. Deadlines ride the same token: a query-level
time budget converts to cancellation at the next check point.
"""

from __future__ import annotations

import time
from typing import Optional


class QueryCancelled(RuntimeError):
    """Raised at the next cooperative check point after cancel()/deadline."""


class CancelToken:
    __slots__ = ("_cancelled", "_deadline", "_reason")

    def __init__(self):
        self._cancelled = False
        self._deadline: Optional[float] = None
        self._reason = ""

    def cancel(self, reason: str = "cancelled by caller") -> None:
        self._cancelled = True
        self._reason = reason

    def set_deadline(self, seconds: float) -> None:
        """Cancel automatically once `seconds` of wall time elapse."""
        self._deadline = time.monotonic() + seconds

    def clear(self) -> None:
        self._cancelled = False
        self._deadline = None
        self._reason = ""

    @property
    def cancelled(self) -> bool:
        if self._cancelled:
            return True
        if self._deadline is not None and time.monotonic() > self._deadline:
            self._cancelled = True
            self._reason = "deadline exceeded"
            return True
        return False

    def check(self) -> None:
        if self.cancelled:
            raise QueryCancelled(self._reason)
