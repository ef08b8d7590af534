"""Pipeline failure isolation.

Parity with the packaged manager's failure handling
(``yam_processor/processing/pipeline_manager.py:668-716,965-981``): a step
that raises is disabled, its traceback is written under a per-failure
recovery directory, and a :class:`PipelineExecutionError` carrying the
:class:`PipelineFailure` detail is raised to the caller.
"""
from __future__ import annotations

import datetime as _dt
import traceback
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Optional


@dataclass
class PipelineFailure:
    step_name: str
    step_index: int
    error: BaseException
    recovery_dir: Optional[Path] = None

    @property
    def message(self) -> str:
        return (
            f"Pipeline step '{self.step_name}' (index {self.step_index}) "
            f"failed: {self.error}"
        )


class PipelineExecutionError(RuntimeError):
    def __init__(self, failure: PipelineFailure) -> None:
        super().__init__(failure.message)
        self.failure = failure


def write_failure_traceback(
    recovery_root: Optional[Path], failure: PipelineFailure
) -> Optional[Path]:
    """Persist ``traceback.txt`` under a per-failure directory."""

    if recovery_root is None:
        return None
    stamp = _dt.datetime.now().strftime("%Y%m%d-%H%M%S")
    directory = Path(recovery_root) / f"failure-{stamp}-{uuid.uuid4().hex[:8]}"
    try:
        directory.mkdir(parents=True, exist_ok=True)
        text = "".join(
            traceback.format_exception(
                type(failure.error), failure.error, failure.error.__traceback__
            )
        )
        (directory / "traceback.txt").write_text(
            f"step: {failure.step_name} (index {failure.step_index})\n\n{text}",
            encoding="utf-8",
        )
    except OSError:
        return None
    failure.recovery_dir = directory
    return directory


__all__ = ["PipelineFailure", "PipelineExecutionError", "write_failure_traceback"]
