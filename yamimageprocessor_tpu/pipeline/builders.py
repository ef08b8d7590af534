"""Stage builders: settings snapshots -> ordered step chains.

Parity with the reference's builder trio
(``processing/segmentation_pipeline.py:84-194``,
``processing/extraction_pipeline.py:77-137``,
``processing/preprocessing_pipeline.py:10-40``): a stage's persisted
``<prefix>/order`` CSV lists the enabled methods in execution order; each
method's params come from its settings keys.  Unknown methods are skipped.
The settings key namespace is the wire format and is owned by
:mod:`yamimageprocessor_tpu.ops.schema`.
"""
from __future__ import annotations

from typing import Any, List, Mapping, Optional

import numpy as np

from yamimageprocessor_tpu.ops.schema import (
    STAGE_SETTINGS_PREFIX,
    Stage,
    op_by_method,
)
from yamimageprocessor_tpu.pipeline.manager import PipelineManager
from yamimageprocessor_tpu.pipeline.step import PipelineStep


class ProcessingPipeline:
    """Thin ordered-step runner (the builder-facing API of the reference's
    ``ProcessingPipeline``, ``processing/segmentation_pipeline.py:49-65``)."""

    def __init__(self, app_core: Optional[Any] = None) -> None:
        self.steps: List[PipelineStep] = []
        self.app_core = app_core
        self.thread_controller = getattr(app_core, "thread_controller", None)

    def add_step(self, step: PipelineStep) -> None:
        self.steps.append(step)

    def clear_steps(self) -> None:
        self.steps = []

    def apply(self, image: np.ndarray) -> np.ndarray:
        manager = PipelineManager(self.steps)
        return manager.apply(image)

    def apply_host(self, image: np.ndarray) -> np.ndarray:
        processed = image.copy()
        for step in self.steps:
            processed = step.apply(processed)
        return processed


def get_settings_snapshot(source: Any, *, prefix: str | None = None) -> dict:
    """Snapshot from an AppCore/SettingsManager/plain mapping
    (``processing/segmentation_pipeline.py:68-81``)."""

    if hasattr(source, "ensure_bootstrapped"):
        source.ensure_bootstrapped()
        return source.settings.snapshot(prefix=prefix)
    if hasattr(source, "snapshot"):
        return source.snapshot(prefix=prefix)
    data = dict(source)
    if prefix is None:
        return data
    return {k: v for k, v in data.items() if k.startswith(prefix)}


def _steps_from_order(stage: Stage, settings: Mapping[str, Any]) -> List[PipelineStep]:
    prefix = STAGE_SETTINGS_PREFIX[stage]
    order_str = str(settings.get(f"{prefix}/order", "") or "")
    order = order_str.split(",") if order_str else []
    steps: List[PipelineStep] = []
    for method in order:
        op = op_by_method(stage, method)
        if op is None:
            continue
        params = op.params_from_settings(settings)
        if op.identifier == "segmentation.border_removal":
            # the reference builder's fallback default is 100, not the
            # settings default 25 (processing/segmentation_pipeline.py:179)
            if f"{prefix}/Border Removal/border_distance" not in settings:
                params["border_distance"] = 100
        steps.append(
            PipelineStep(
                name=op.step_name,
                op_id=op.identifier,
                enabled=True,
                params=params,
                stage=stage,
            )
        )
    return steps


def build_segmentation_pipeline_from_dict(
    settings_dict: Mapping[str, Any], app_core: Optional[Any] = None
) -> ProcessingPipeline:
    pipeline = ProcessingPipeline(app_core)
    for step in _steps_from_order(Stage.SEGMENTATION, settings_dict):
        pipeline.add_step(step)
    return pipeline


def build_extraction_pipeline_from_dict(
    settings_dict: Mapping[str, Any], app_core: Optional[Any] = None
) -> ProcessingPipeline:
    pipeline = ProcessingPipeline(app_core)
    for step in _steps_from_order(Stage.ANALYSIS, settings_dict):
        pipeline.add_step(step)
    return pipeline


def build_preprocessing_pipeline_from_dict(
    settings_dict: Mapping[str, Any], app_core: Optional[Any] = None
) -> ProcessingPipeline:
    """Preprocessing steps from settings: explicit ``preprocess/order`` when
    present, else the canonical module order with per-module enabled flags
    (the template AppCore builds from registered modules,
    ``core/app_core.py:361-454``)."""

    from yamimageprocessor_tpu.ops.schema import PREPROCESS_OPS

    pipeline = ProcessingPipeline(app_core)
    order_str = str(settings_dict.get("preprocess/order", "") or "")
    if order_str:
        by_name = {op.step_name: op for op in PREPROCESS_OPS}
        selected = [by_name[n] for n in order_str.split(",") if n in by_name]
        for op in selected:
            pipeline.add_step(
                PipelineStep(
                    name=op.step_name,
                    op_id=op.identifier,
                    enabled=True,
                    params=op.params_from_settings(settings_dict),
                    stage=Stage.PREPROCESSING,
                )
            )
        return pipeline
    for op in PREPROCESS_OPS:
        if not op.persisted:
            continue
        enabled = settings_dict.get(op.settings_enabled_key, False)
        # string flags BEFORE bool(): QSettings-style backends persist
        # booleans as strings, and bool('false') is True
        if isinstance(enabled, str):
            enabled = enabled.lower() in {"1", "true"}
        pipeline.add_step(
            PipelineStep(
                name=op.step_name,
                op_id=op.identifier,
                enabled=bool(enabled),
                params=op.params_from_settings(settings_dict),
                stage=Stage.PREPROCESSING,
            )
        )
    return pipeline


def build_segmentation_pipeline(app_core: Any, settings: Any = None) -> ProcessingPipeline:
    src = app_core if settings is None else settings
    return build_segmentation_pipeline_from_dict(
        get_settings_snapshot(src, prefix="segmentation/"), app_core
    )


def build_extraction_pipeline(app_core: Any, settings: Any = None) -> ProcessingPipeline:
    src = app_core if settings is None else settings
    return build_extraction_pipeline_from_dict(
        get_settings_snapshot(src, prefix="extraction/"), app_core
    )


__all__ = [
    "ProcessingPipeline",
    "get_settings_snapshot",
    "build_segmentation_pipeline_from_dict",
    "build_extraction_pipeline_from_dict",
    "build_preprocessing_pipeline_from_dict",
    "build_segmentation_pipeline",
    "build_extraction_pipeline",
]
