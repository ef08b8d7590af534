"""Error reporting: structured reports with resolution actions, headless.

Parity with ``yam_processor/ui/error_dialog.py:10-154`` and
``error_reporter.py:20-133``: an :class:`ErrorReport` carries the message,
sanitized metadata (paths redacted through the sandbox), the traceback text
and pluggable actions; ``present_error_report`` resolves to an
:class:`ErrorResolution` via a presenter callback (a dialog in a Qt shell,
a prompt or policy in headless runs).
"""
from __future__ import annotations

import traceback
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

from yamimageprocessor_tpu.core.path_sanitizer import redact_path_for_metadata


class ErrorResolution(Enum):
    DISMISS = "dismiss"
    RETRY = "retry"
    OPEN_LOGS = "open_logs"
    DISCARD_AUTOSAVE = "discard_autosave"


@dataclass
class ErrorAction:
    label: str
    resolution: ErrorResolution


@dataclass
class ErrorReport:
    message: str
    metadata: Dict[str, Any] = field(default_factory=dict)
    traceback_text: str = ""
    actions: List[ErrorAction] = field(default_factory=list)

    @classmethod
    def from_exception(
        cls,
        exc: BaseException,
        *,
        message: Optional[str] = None,
        metadata: Optional[Dict[str, Any]] = None,
    ) -> "ErrorReport":
        sanitized: Dict[str, Any] = {}
        for key, value in (metadata or {}).items():
            if isinstance(value, (Path, str)) and "/" in str(value):
                sanitized[key] = redact_path_for_metadata(Path(value))
            else:
                sanitized[key] = value
        return cls(
            message=message or str(exc),
            metadata=sanitized,
            traceback_text="".join(
                traceback.format_exception(type(exc), exc, exc.__traceback__)
            ),
        )

    def clipboard_text(self) -> str:
        """Copy-to-clipboard payload (message + metadata + traceback)."""

        lines = [self.message, ""]
        for key in sorted(self.metadata):
            lines.append(f"{key}: {self.metadata[key]}")
        if self.traceback_text:
            lines += ["", self.traceback_text]
        return "\n".join(lines)


Presenter = Callable[[ErrorReport], ErrorResolution]


def default_actions(*, has_autosave: bool = False) -> List[ErrorAction]:
    actions = [
        ErrorAction("Open logs", ErrorResolution.OPEN_LOGS),
        ErrorAction("Retry", ErrorResolution.RETRY),
    ]
    if has_autosave:
        actions.append(
            ErrorAction("Discard autosave", ErrorResolution.DISCARD_AUTOSAVE)
        )
    return actions


def present_error_report(
    report: ErrorReport,
    *,
    presenter: Optional[Presenter] = None,
    has_autosave: bool = False,
) -> ErrorResolution:
    """Resolve a report through the configured presenter
    (``yam_processor/ui/error_reporter.py:108-130``)."""

    if not report.actions:
        report.actions = default_actions(has_autosave=has_autosave)
    if presenter is None:
        return ErrorResolution.DISMISS
    return presenter(report)


__all__ = [
    "ErrorResolution",
    "ErrorAction",
    "ErrorReport",
    "present_error_report",
    "default_actions",
]
