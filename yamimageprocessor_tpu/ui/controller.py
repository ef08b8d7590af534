"""UnifiedPipelineController: the cross-stage coordinator, headless.

Capability parity with ``ui/unified.py:375-675``: owns the shared
PipelineManager; stage ranges recomputed by scanning ``step.stage``; cached
per-stage results with linear upstream dependencies (each stage depends on
everything before it); step insert/remove/update APIs that fire the same
event names (``stage_steps_inserted`` / ``stage_steps_removed`` /
``stage_steps_updated`` / ``stage_cache_updated`` / ``pipeline_recomputed``);
``run_enabled_stages(source, seeded_results)`` executing stages sequentially
and caching per-stage images; downstream invalidation when an upstream
stage changes; subscription to manager change events.

Events are plain callables ``(event_name, payload_dict)`` instead of Qt
signals, so any shell can subscribe.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.pipeline.manager import PipelineManager
from yamimageprocessor_tpu.pipeline.step import PipelineStep

LOGGER = logging.getLogger(__name__)

_STAGE_ORDER = (Stage.PREPROCESSING, Stage.SEGMENTATION, Stage.ANALYSIS)

ControllerListener = Callable[[str, Dict[str, Any]], None]


class UnifiedPipelineController:
    """Cross-stage coordination over one shared step list."""

    def __init__(self, app_core: Any = None, manager: Optional[PipelineManager] = None):
        self.app_core = app_core
        if manager is not None:
            self._manager = manager
        elif app_core is not None:
            self._manager = app_core.get_pipeline_manager()
        else:
            self._manager = PipelineManager()
        self._listeners: List[ControllerListener] = []
        self._stage_results: Dict[Stage, Optional[np.ndarray]] = {
            stage: None for stage in _STAGE_ORDER
        }
        self._ranges: Dict[Stage, Tuple[int, int]] = {}
        self._recalculate_stage_ranges()
        self._manager.add_change_listener(self._on_manager_changed)

    # ------------------------------------------------------------------
    @property
    def manager(self) -> PipelineManager:
        return self._manager

    def add_listener(self, listener: ControllerListener) -> None:
        if listener not in self._listeners:
            self._listeners.append(listener)

    def remove_listener(self, listener: ControllerListener) -> None:
        try:
            self._listeners.remove(listener)
        except ValueError:
            pass

    def _emit(self, event: str, **payload: Any) -> None:
        for listener in tuple(self._listeners):
            try:
                listener(event, dict(payload))
            except Exception:
                LOGGER.debug("Controller listener failed", exc_info=True)

    # ------------------------------------------------------------------
    # stage ranges (``ui/unified.py:613-628``)
    def _recalculate_stage_ranges(self) -> None:
        ranges: Dict[Stage, Tuple[int, int]] = {}
        steps = self._manager.steps
        cursor = 0
        for stage in _STAGE_ORDER:
            count = sum(1 for s in steps if s.stage == stage)
            ranges[stage] = (cursor, cursor + count)
            cursor += count
        self._ranges = ranges

    def stage_bounds(self, stage: Stage) -> Tuple[int, int]:
        return self._ranges.get(stage, (0, 0))

    def stage_steps(self, stage: Stage) -> Tuple[PipelineStep, ...]:
        start, end = self.stage_bounds(stage)
        return tuple(self._manager.steps[start:end])

    def stage_dependencies(self, stage: Stage) -> Tuple[Stage, ...]:
        """Linear chain: every upstream stage (``ui/unified.py:622-628``)."""

        idx = _STAGE_ORDER.index(stage)
        return _STAGE_ORDER[:idx]

    # ------------------------------------------------------------------
    # step mutation
    def insert_stage_step(
        self, stage: Stage, index: int, step: PipelineStep
    ) -> None:
        start, end = self.stage_bounds(stage)
        position = min(start + max(index, 0), end)
        step.stage = stage
        self._manager.add_step(step, position)
        self._recalculate_stage_ranges()
        self._invalidate_stage_results(stage)
        self._emit("stage_steps_inserted", stage=stage, index=index, step=step)

    def remove_stage_step(self, stage: Stage, index: int) -> PipelineStep:
        start, end = self.stage_bounds(stage)
        if not (0 <= index < end - start):
            raise IndexError(index)
        removed = self._manager.remove_step(start + index)
        self._recalculate_stage_ranges()
        self._invalidate_stage_results(stage)
        self._emit("stage_steps_removed", stage=stage, index=index, step=removed)
        return removed

    def replace_stage_steps(
        self, stage: Stage, steps: Iterable[PipelineStep]
    ) -> None:
        """Swap a stage's slice wholesale (the panes' rebuild path,
        e.g. ``ui/segmentation.py`` order rebuilds)."""

        new_steps = [s.clone() for s in steps]
        for s in new_steps:
            s.stage = stage
        start, end = self.stage_bounds(stage)
        combined = list(self._manager.steps)
        combined[start:end] = new_steps
        self._manager.replace_steps(combined, preserve_history=True)
        self._recalculate_stage_ranges()
        self._invalidate_stage_results(stage)
        self._emit("stage_steps_updated", stage=stage, steps=tuple(new_steps))

    def update_stage_step(
        self,
        stage: Stage,
        index: int,
        *,
        params: Optional[Dict[str, Any]] = None,
        enabled: Optional[bool] = None,
    ) -> None:
        start, end = self.stage_bounds(stage)
        if not (0 <= index < end - start):
            raise IndexError(index)
        step = self._manager.steps[start + index]
        if params is not None:
            self._manager.update_step_params(start + index, params)
        if enabled is not None:
            self._manager.set_step_enabled(start + index, enabled)
        self._invalidate_stage_results(stage)
        self._emit("stage_steps_updated", stage=stage, index=index, step=step)

    # ------------------------------------------------------------------
    # execution (``ui/unified.py:515-566``)
    def run_enabled_stages(
        self,
        source: Optional[np.ndarray],
        seeded_results: Optional[Dict[Stage, np.ndarray]] = None,
    ) -> Dict[Stage, Optional[np.ndarray]]:
        seeds = dict(seeded_results or {})
        results: Dict[Stage, Optional[np.ndarray]] = {}
        current: Optional[np.ndarray] = None

        for stage in _STAGE_ORDER:
            if stage in seeds:
                current = np.asarray(seeds[stage])
                results[stage] = current
                self._set_stage_result(stage, current)
                continue
            deps = self.stage_dependencies(stage)
            stage_input = source
            for dep in reversed(deps):
                if results.get(dep) is not None:
                    stage_input = results[dep]
                    break
            if stage_input is None:
                results[stage] = None
                # clear any previous run's image: consumers must not read
                # a stale cache as if it were this run's result
                self._set_stage_result(stage, None)
                continue
            stage_manager = PipelineManager(self.stage_steps(stage))
            result = stage_manager.apply(np.asarray(stage_input))
            results[stage] = np.asarray(result)
            self._set_stage_result(stage, results[stage])

        self._emit("pipeline_recomputed", results=dict(results))
        return results

    def _set_stage_result(self, stage: Stage, image: Optional[np.ndarray]) -> None:
        self._stage_results[stage] = None if image is None else np.array(image)
        self._emit("stage_cache_updated", stage=stage)

    def cached_stage_result(self, stage: Stage) -> Optional[np.ndarray]:
        result = self._stage_results.get(stage)
        return None if result is None else np.array(result)

    # ------------------------------------------------------------------
    # invalidation (``ui/unified.py:630-651``)
    def _expand_downstream(self, stage: Stage) -> Tuple[Stage, ...]:
        idx = _STAGE_ORDER.index(stage)
        return _STAGE_ORDER[idx:]

    def _invalidate_stage_results(self, stage: Stage) -> None:
        for downstream in self._expand_downstream(stage):
            if self._stage_results.get(downstream) is not None:
                self._stage_results[downstream] = None
                self._emit("stage_cache_updated", stage=downstream)

    # ------------------------------------------------------------------
    def recompute_pipeline(self) -> None:
        self._recalculate_stage_ranges()
        self._emit("pipeline_recomputed", results=dict(self._stage_results))

    def _on_manager_changed(self, event: str, payload: Dict[str, Any]) -> None:
        """React to direct manager mutations (``ui/unified.py:671-675``)."""

        self._recalculate_stage_ranges()
        step = payload.get("step")
        stage = getattr(step, "stage", None)
        if isinstance(stage, Stage):
            self._invalidate_stage_results(stage)
        elif event in {
            "steps_replaced",
            "pipeline_restored",
            "pipeline_reset",
            # step-less reorder events (set_order/swap_steps) change every
            # stage's effective pipeline — stale caches must not survive
            "steps_reordered",
            "steps_swapped",
        }:
            self._invalidate_stage_results(Stage.PREPROCESSING)


__all__ = ["UnifiedPipelineController"]
