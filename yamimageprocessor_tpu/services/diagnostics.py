"""Headless diagnostics stream: log buffer + background-task monitor.

Parity with the reference diagnostics panel
(``yam_processor/ui/diagnostics_panel.py:13-189``) without Qt: a bounded
log record buffer fed by a logging handler (2000-record cap, matching the
panel's block cap), a task table mirroring ThreadController lifecycle
events (id / name / status / progress), and subscription callbacks any
shell can render.
"""
from __future__ import annotations

import logging
import threading
from collections import deque
from dataclasses import dataclass
from typing import Callable, Deque, Dict, List, Optional

from yamimageprocessor_tpu.core.threading import ThreadController, ThreadTask

MAX_LOG_RECORDS = 2000


@dataclass
class TaskRow:
    task_id: int
    name: str
    status: str
    progress: float


class DiagnosticsHub:
    """Aggregates log lines and task states for display."""

    def __init__(self, *, capacity: int = MAX_LOG_RECORDS) -> None:
        self._lock = threading.Lock()
        self._logs: Deque[str] = deque(maxlen=capacity)
        self._tasks: Dict[int, TaskRow] = {}
        self._subscribers: List[Callable[[str], None]] = []
        self._handler: Optional[logging.Handler] = None
        self._controller: Optional[ThreadController] = None

    # ------------------------------------------------------------------
    # logging bridge (QtLogHandler equivalent)
    def attach_logger(self, logger: Optional[logging.Logger] = None) -> None:
        logger = logger or logging.getLogger()
        if self._handler is not None:
            # re-attach = move, never stack: a second handler on the same
            # (or another) logger would duplicate every line
            self.detach_logger()
        hub = self

        class _HubHandler(logging.Handler):
            def emit(self, record: logging.LogRecord) -> None:
                try:
                    hub._append_log(self.format(record))
                except Exception:
                    pass

        handler = _HubHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s")
        )
        logger.addHandler(handler)
        self._handler = handler
        self._logger = logger

    def detach_logger(self) -> None:
        if self._handler is not None and self._logger is not None:
            self._logger.removeHandler(self._handler)
            self._handler = None

    def _append_log(self, line: str) -> None:
        with self._lock:
            self._logs.append(line)
        for callback in tuple(self._subscribers):
            try:
                callback(line)
            except Exception:
                pass

    def log_lines(self) -> List[str]:
        with self._lock:
            return list(self._logs)

    def subscribe(self, callback: Callable[[str], None]) -> None:
        self._subscribers.append(callback)

    # ------------------------------------------------------------------
    # task monitor
    def attach_controller(self, controller: ThreadController) -> None:
        controller.add_listener(self._on_task_event)
        self._controller = controller

    def detach_controller(self) -> None:
        if self._controller is not None:
            self._controller.remove_listener(self._on_task_event)
            self._controller = None

    #: finished rows beyond this cap are evicted oldest-first (the log
    #: deque is bounded; the task table must be too)
    MAX_TASK_ROWS = 500

    def _on_task_event(self, event: str, task: ThreadTask) -> None:
        with self._lock:
            self._tasks[task.task_id] = TaskRow(
                task_id=task.task_id,
                name=task.name,
                status=task.status.value,
                progress=task.progress,
            )
            if len(self._tasks) > self.MAX_TASK_ROWS:
                terminal = ("finished", "failed", "cancelled")
                for key in sorted(self._tasks):
                    if len(self._tasks) <= self.MAX_TASK_ROWS:
                        break
                    if self._tasks[key].status in terminal:
                        del self._tasks[key]

    def task_rows(self) -> List[TaskRow]:
        with self._lock:
            return [self._tasks[k] for k in sorted(self._tasks)]


__all__ = ["DiagnosticsHub", "TaskRow", "MAX_LOG_RECORDS"]
