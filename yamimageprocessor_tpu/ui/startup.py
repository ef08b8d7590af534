"""Startup stage selection (headless StartupDialog equivalent).

Parity with ``ui/startup.py:28-184``: a pre-launch multi-select of pipeline
stages persisted at ``ui/startup/selected_stages`` plus the diagnostics
flag; shells render it however they like, the selection logic and
persistence live here.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from yamimageprocessor_tpu.ops.schema import Stage

SELECTED_STAGES_KEY = "ui/startup/selected_stages"
DIAGNOSTICS_KEY = "diagnostics/enabled"

_ALL = (Stage.PREPROCESSING, Stage.SEGMENTATION, Stage.ANALYSIS)


@dataclass
class StartupSelection:
    stages: List[Stage] = field(default_factory=lambda: list(_ALL))
    diagnostics: bool = False

    @classmethod
    def load(cls, settings) -> "StartupSelection":
        raw = str(settings.get(SELECTED_STAGES_KEY, "") or "")
        stages: List[Stage] = []
        for token in raw.split(","):
            token = token.strip()
            if not token:
                continue
            try:
                stages.append(Stage(token))
            except ValueError:
                continue
        if not stages:
            stages = list(_ALL)
        return cls(
            stages=stages,
            diagnostics=settings.get_bool(DIAGNOSTICS_KEY, False),
        )

    def save(self, settings) -> None:
        settings.set(
            SELECTED_STAGES_KEY, ",".join(stage.value for stage in self.stages)
        )
        settings.set(DIAGNOSTICS_KEY, bool(self.diagnostics))

    def toggle(self, stage: Stage) -> None:
        if stage in self.stages:
            if len(self.stages) > 1:  # at least one stage stays selected
                self.stages.remove(stage)
        else:
            self.stages = [s for s in _ALL if s in self.stages or s is stage]

    def is_selected(self, stage: Stage) -> bool:
        return stage in self.stages


__all__ = ["StartupSelection", "SELECTED_STAGES_KEY", "DIAGNOSTICS_KEY"]
