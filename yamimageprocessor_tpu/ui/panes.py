"""Headless stage panes: the reference's pane behaviors without Qt.

Capability parity with the pane layer (SURVEY §2.4):

* :class:`PreprocessingPane` (``ui/preprocessing.py:610-2852``): image
  states (original / committed / current preview + cache signatures),
  async pipeline execution through the PipelineCache on the
  ThreadController with progressive per-tile preview updates and
  cancellation restoring the baseline frame, cache-hit preview
  short-circuit, undo/redo pulling cached images by signature, autosave
  mark-dirty on commit, mass folder processing, pipeline JSON
  import/export, preview pyramid construction, save with pipeline +
  settings metadata;
* :class:`SegmentationPane` (``ui/segmentation.py:994-2676``): persisted
  ``segmentation/order`` with duplicates allowed, stage rebuild through
  the controller, upstream re-seeding from the preprocessing cache;
* :class:`ExtractionPane` (``ui/extraction.py:458-2023``): controller
  step sync, upstream image resolution, CSV data export, mass
  extract/export, region-crop export.

Rendering is delegated to whoever hosts the pane; events arrive via plain
callbacks (``on_preview``, ``on_progress``, ``on_tile``).
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.pipeline.builders import (
    build_extraction_pipeline_from_dict,
    build_preprocessing_pipeline_from_dict,
    build_segmentation_pipeline_from_dict,
)
from yamimageprocessor_tpu.pipeline.cache import PipelineCacheTileUpdate
from yamimageprocessor_tpu.pipeline.step import PipelineStep
from yamimageprocessor_tpu.ui import ModulePane
from yamimageprocessor_tpu.ui.preview import (
    CoalescingPreviewScheduler,
    PreviewRecord,
)

LOGGER = logging.getLogger(__name__)


class _ProgressivePreviewState:
    """Tile-paste buffer with a generation counter
    (``ui/preprocessing.py:69-84``)."""

    def __init__(self, baseline: Optional[np.ndarray]) -> None:
        self.generation = 0
        self.baseline = None if baseline is None else baseline.copy()
        self.buffer: Optional[np.ndarray] = None

    def begin(self) -> int:
        self.generation += 1
        self.buffer = None
        return self.generation

    def paste(self, update: PipelineCacheTileUpdate) -> np.ndarray:
        if self.buffer is None:
            self.buffer = np.zeros(update.shape, dtype=update.dtype)
        left, top, right, bottom = update.box
        self.buffer[top:bottom, left:right, ...] = update.tile
        return self.buffer

    def cancel(self) -> Optional[np.ndarray]:
        # bump the generation so any tile still in flight when the restore
        # lands is recognised as stale and dropped
        self.generation += 1
        self.buffer = None
        return self.baseline


class _BasePane(ModulePane):
    stage: Stage

    def __init__(self, app_core, controller) -> None:
        self.app_core = app_core
        self.controller = controller
        self.on_preview: Optional[Callable[[np.ndarray], None]] = None
        self.on_progress: Optional[Callable[[int], None]] = None
        self.on_tile: Optional[Callable[[PipelineCacheTileUpdate], None]] = None

    def pane_title(self) -> str:
        return self.stage.value.title()

    # ------------------------------------------------------------------
    def _settings(self):
        return self.app_core.settings

    def _emit_preview(self, image: Optional[np.ndarray]) -> None:
        if image is not None and self.on_preview is not None:
            self.on_preview(image)


class PreprocessingPane(_BasePane):
    stage = Stage.PREPROCESSING

    def __init__(self, app_core, controller) -> None:
        super().__init__(app_core, controller)
        self.original: Optional[np.ndarray] = None
        self.committed: Optional[np.ndarray] = None
        self.current_preview: Optional[np.ndarray] = None
        self.source_id: Optional[str] = None
        self.committed_signature: Optional[str] = None
        self._undo: List[str] = []
        self._redo: List[str] = []
        self._progressive = _ProgressivePreviewState(None)
        self.preview_record: Optional[PreviewRecord] = None
        self._lazy_record = None  # set by load_image for gigapixel sources
        self._active_task = None
        self._preview_scheduler: Optional[CoalescingPreviewScheduler] = None
        #: steps the in-flight/last preview was computed with (commit must
        #: sign the pixels it actually commits, incl. params_override runs)
        self._preview_steps: Optional[List[PipelineStep]] = None

    # ------------------------------------------------------------------
    # loading (``ui/preprocessing.py:2263-2319``)
    def load_image(self, path: Path, *, lazy: bool | str = "auto") -> None:
        record = self.app_core.io_manager.load_image(path, lazy=lazy)
        if hasattr(record, "iter_tiles") and not hasattr(record, "pixels"):
            array = None
            self._lazy_record = record
        else:
            array = np.asarray(record.to_array())
            self._lazy_record = None
        cache = self.app_core.pipeline_cache
        if self.source_id is not None:
            cache.discard_cache(self.source_id)
        if array is not None:
            self.source_id = cache.register_source(array, hint=str(path))
            self.original = array
            self.preview_record = PreviewRecord.build(array)
        else:
            stat = Path(path).stat()
            self.source_id = cache.register_source_by_token(
                f"file:{path}:{stat.st_size}:{stat.st_mtime_ns}", hint=str(path)
            )
            self.original = None
            # lazy pyramid: levels materialize from region reads only — the
            # gigapixel source is never pulled dense for a preview
            # (ref yam_processor/ui/dialogs.py:63-91)
            self.preview_record = PreviewRecord.from_tiled(record)
        self.committed = None if array is None else array.copy()
        self.committed_signature = self.source_id
        self._progressive = _ProgressivePreviewState(self.committed)
        self._emit_preview(self.committed)

    # ------------------------------------------------------------------
    def _steps(self) -> List[PipelineStep]:
        return list(self.controller.stage_steps(self.stage))

    def replace_steps_from_settings(self) -> None:
        snapshot = self._settings().snapshot()
        pipeline = build_preprocessing_pipeline_from_dict(snapshot)
        self.controller.replace_stage_steps(self.stage, pipeline.steps)

    # ------------------------------------------------------------------
    # async preview (``ui/preprocessing.py:1863-1977,2365-2419``)
    def update_preview(self, *, params_override: Optional[Dict[str, Any]] = None):
        source = self.original if self.original is not None else self._lazy_record
        if source is None or self.source_id is None:
            return None
        steps = self._steps()
        if params_override:
            steps = [s.clone() for s in steps]
            for name, params in params_override.items():
                for step in steps:
                    if step.name == name:
                        step.params.update(params)
        cache = self.app_core.pipeline_cache
        final_sig, _ = cache.predict(self.source_id, steps)
        cached = cache.cached_image(self.source_id, final_sig)
        if cached is not None:  # cache-hit short circuit (:2365-2379)
            self.current_preview = cached
            self._preview_steps = steps
            self._emit_preview(cached)
            return None

        # a still-running older preview must not race the new one: cancel
        # it BEFORE bumping the generation so its late callbacks are stale
        if self._active_task is not None:
            self._active_task.cancel()
        generation = self._progressive.begin()

        def on_incremental(update: PipelineCacheTileUpdate) -> None:
            if generation != self._progressive.generation:
                return  # stale tiles after cancel/restart
            buffer = self._progressive.paste(update)
            if self.on_tile is not None:
                self.on_tile(update)
            self._emit_preview(buffer)

        def task(cancel_event=None, progress_callback=None):
            operand = (
                self._lazy_record
                if self.original is None
                else self.original
            )
            from yamimageprocessor_tpu.pipeline.tiled_records import (
                TiledPipelineImage,
            )

            if operand is not None and hasattr(operand, "iter_tiles"):
                operand = TiledPipelineImage(operand, tile_size=(512, 512))
            return cache.compute(
                self.source_id,
                operand,
                steps,
                cancel_event=cancel_event,
                # the cache emits integer percents; the controller's
                # injected callback expects a 0..1 fraction (it clamps, so
                # raw percents pinned the progress bar at 100 immediately)
                progress=(
                    (lambda pct: progress_callback(pct / 100.0))
                    if progress_callback is not None
                    else None
                ),
                incremental=on_incremental,
            )

        def finished(result) -> None:
            if result is None or generation != self._progressive.generation:
                return  # a newer preview superseded this task
            self.current_preview = result.image
            self._preview_steps = steps
            self._emit_preview(result.image)

        def cancelled() -> None:
            if generation != self._progressive.generation:
                return  # late cancel of an old task: leave the new preview
            baseline = self._progressive.cancel()
            self._emit_preview(baseline)

        self._active_task = self.app_core.thread_controller.submit(
            task,
            name=f"preview-{generation}",
            on_finished=finished,
            on_cancelled=cancelled,
            on_progress=(
                (lambda frac: self.on_progress(int(frac * 100)))
                if self.on_progress
                else None
            ),
        )
        return self._active_task

    def cancel_preview(self) -> None:
        if self._active_task is not None:
            self._active_task.cancel()

    # ------------------------------------------------------------------
    # coalesced parameter preview (``yam_processor/ui/dialogs.py:508-807``):
    # rapid slider updates overwrite one pending slot; at most 2 computes
    def schedule_preview_update(
        self, params_override: Optional[Dict[str, Any]] = None
    ) -> Optional[CoalescingPreviewScheduler]:
        if self.source_id is None:
            return None
        if self._preview_scheduler is None:

            def compute(params):
                steps = [s.clone() for s in self._steps()]
                if params:
                    for name, p in params.items():
                        for step in steps:
                            if step.name == name:
                                step.params.update(p)
                operand = (
                    self.original if self.original is not None else self._lazy_record
                )
                if operand is None:
                    return
                if hasattr(operand, "iter_tiles") and not isinstance(
                    operand, np.ndarray
                ):
                    from yamimageprocessor_tpu.pipeline.tiled_records import (
                        TiledPipelineImage,
                    )

                    operand = TiledPipelineImage(operand, tile_size=(512, 512))
                result = self.app_core.pipeline_cache.compute(
                    self.source_id, operand, steps
                )
                self.current_preview = result.image
                self._emit_preview(result.image)

            def submit(work):
                self.app_core.thread_controller.submit(
                    lambda cancel_event=None, progress_callback=None: work(),
                    name="param-preview",
                )

            self._preview_scheduler = CoalescingPreviewScheduler(compute, submit)
        self._preview_scheduler.schedule(params_override)
        return self._preview_scheduler

    # ------------------------------------------------------------------
    # commit + undo/redo (``ui/preprocessing.py:996-1043,2013-2035``)
    def commit_current(self) -> None:
        if self.current_preview is None or self.source_id is None:
            return
        # sign the pixels actually being committed: a params_override
        # preview was computed with MODIFIED steps, and signing it with the
        # unmodified list would make undo/redo restore different pixels
        sign_steps = (
            self._preview_steps if self._preview_steps is not None else self._steps()
        )
        final_sig, _ = self.app_core.pipeline_cache.predict(
            self.source_id, sign_steps
        )
        if self.committed_signature is not None:
            self._undo.append(self.committed_signature)
            self._redo.clear()
        self.committed = self.current_preview.copy()
        self.committed_signature = final_sig
        # a later cancelled preview restores the newly committed frame, not
        # the load-time original (``ui/preprocessing.py:1990-2007`` restores
        # the previous preview state on cancellation)
        self._progressive.baseline = self.committed.copy()
        from yamimageprocessor_tpu.core.persistence import AutosavePayload

        self.app_core.autosave.mark_dirty(
            AutosavePayload(
                image=self.committed,
                pipeline={"steps": [s.to_dict() for s in self._steps()]},
                metadata={"stage": self.stage.value},
            )
        )

    def undo(self) -> bool:
        if not self._undo or self.source_id is None:
            return False
        cache = self.app_core.pipeline_cache
        signature = self._undo.pop()
        image = cache.cached_image(self.source_id, signature)
        if image is None and self.original is not None:
            image = self.original.copy()
        if image is None:
            return False
        if self.committed_signature is not None:
            self._redo.append(self.committed_signature)
        self.committed = image
        self.committed_signature = signature
        self._progressive.baseline = image.copy()
        self._emit_preview(image)
        return True

    def redo(self) -> bool:
        if not self._redo or self.source_id is None:
            return False
        signature = self._redo.pop()
        image = self.app_core.pipeline_cache.cached_image(self.source_id, signature)
        if image is None:
            return False
        if self.committed_signature is not None:
            self._undo.append(self.committed_signature)
        self.committed = image
        self.committed_signature = signature
        self._progressive.baseline = image.copy()
        self._emit_preview(image)
        return True

    # ------------------------------------------------------------------
    # persistence (``ui/preprocessing.py:2057-2363``)
    def save_processed_image(self, path: Path) -> Optional[Path]:
        if self.committed is None:
            return None
        return self.app_core.io_manager.save_image(
            path,
            self.committed,
            metadata={
                "pipeline": {"steps": [s.to_dict() for s in self._steps()]},
                "settings": self._settings().snapshot(prefix="preprocess/"),
            },
        )

    def export_pipeline_json(self, path: Path) -> None:
        payload = {"steps": [s.to_dict() for s in self._steps()]}
        Path(path).write_text(json.dumps(payload, indent=2), encoding="utf-8")

    def import_pipeline_json(self, path: Path) -> None:
        payload = json.loads(Path(path).read_text(encoding="utf-8"))
        steps = [PipelineStep.from_dict(item) for item in payload.get("steps", [])]
        self.controller.replace_stage_steps(self.stage, steps)

    def mass_preprocess(
        self,
        input_folder: Path,
        output_folder: Path,
        *,
        cancel_event=None,
        progress: Optional[Callable[[int], None]] = None,
    ) -> List[Path]:
        from yamimageprocessor_tpu.services.batch import process_folder

        return process_folder(
            input_folder,
            output_folder,
            self._steps(),
            io_manager=self.app_core.io_manager,
            settings_snapshot=self._settings().snapshot(prefix="preprocess/"),
            stage=self.stage.value,
            progress=progress,
            cancel_event=cancel_event,
        )


class _OrderedStagePane(_BasePane):
    """Shared behavior for order-driven stages (segmentation/extraction)."""

    order_key: str
    builder = None

    def order(self) -> List[str]:
        text = str(self._settings().get(self.order_key, "") or "")
        return text.split(",") if text else []

    def set_order(self, methods: Sequence[str]) -> None:
        """Duplicates allowed (``ui/segmentation.py:179-194``)."""

        self._settings().set(self.order_key, ",".join(methods))
        self.rebuild_from_settings()

    def append_method(self, method: str) -> None:
        self.set_order([*self.order(), method])

    def remove_method(self, index: int) -> None:
        methods = self.order()
        if 0 <= index < len(methods):
            methods.pop(index)
            self.set_order(methods)

    def rebuild_from_settings(self) -> None:
        snapshot = self._settings().snapshot()
        pipeline = type(self).builder(snapshot)
        self.controller.replace_stage_steps(self.stage, pipeline.steps)

    def resolve_upstream_image(self) -> Optional[np.ndarray]:
        """Nearest upstream cached stage result (``ui/extraction.py:969``)."""

        for stage in reversed(self.controller.stage_dependencies(self.stage)):
            cached = self.controller.cached_stage_result(stage)
            if cached is not None:
                return cached
        return None

    def apply_to(self, image: np.ndarray) -> np.ndarray:
        from yamimageprocessor_tpu.pipeline.manager import PipelineManager

        return np.asarray(
            PipelineManager(list(self.controller.stage_steps(self.stage))).apply(
                np.asarray(image)
            )
        )

    def update_preview(self, *, params_override=None):
        """Run the stage's CURRENT controller steps on the upstream image
        and emit the result.  Non-destructive: shells route their 'run'
        action here, and rebuilding from settings instead would wipe any
        controller-only edits (inline parameter editor, Space toggles)."""

        image = self.resolve_upstream_image()
        if image is None:
            return None
        result = self.apply_to(image)
        self._emit_preview(result)
        return None


class SegmentationPane(_OrderedStagePane):
    stage = Stage.SEGMENTATION
    order_key = "segmentation/order"
    builder = staticmethod(build_segmentation_pipeline_from_dict)

    def process_segmentation_file(
        self, input_path: Path, output_path: Path
    ) -> Path:
        """Batch helper (``ui/segmentation.py:956-988``)."""

        record = self.app_core.io_manager.load_image(input_path, lazy=False)
        result = self.apply_to(np.asarray(record.to_array()))
        return self.app_core.io_manager.save_image(
            output_path,
            result,
            metadata={"stage": self.stage.value, "source": str(input_path.name)},
        )


class ExtractionPane(_OrderedStagePane):
    stage = Stage.ANALYSIS
    order_key = "extraction/order"
    builder = staticmethod(build_extraction_pipeline_from_dict)

    def export_all_extraction_data(
        self, image: np.ndarray, output_folder: Path, *, base_name: str = "extraction"
    ) -> List[Path]:
        from yamimageprocessor_tpu.services.batch import export_all_extraction_data

        return export_all_extraction_data(
            image,
            list(self.controller.stage_steps(self.stage)),
            output_folder,
            base_name=base_name,
        )

    def export_segmented_regions(self, image: np.ndarray, image_path: Path) -> int:
        from yamimageprocessor_tpu.ops.extraction import export_segmented_regions

        return export_segmented_regions(np.asarray(image), image_path)

    def mass_extract_folder(
        self, input_folder: Path, output_folder: Path, **kwargs
    ) -> List[Path]:
        from yamimageprocessor_tpu.services.batch import process_folder

        return process_folder(
            input_folder,
            output_folder,
            list(self.controller.stage_steps(self.stage)),
            io_manager=self.app_core.io_manager,
            stage=self.stage.value,
            **kwargs,
        )

    def mass_export_data(
        self, input_folder: Path, output_folder: Path, **kwargs
    ):
        from yamimageprocessor_tpu.services.batch import mass_export_data

        return mass_export_data(
            input_folder,
            output_folder,
            list(self.controller.stage_steps(self.stage)),
            **kwargs,
        )


__all__ = [
    "PreprocessingPane",
    "SegmentationPane",
    "ExtractionPane",
]
