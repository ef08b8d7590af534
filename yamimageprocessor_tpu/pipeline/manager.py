"""Ordered pipeline manager: step list, undo/redo history, change events.

API-parity rebuild of ``processing/pipeline_manager.py:189-589``: template +
working step lists, add/remove/move/swap/set_order/toggle/update_params,
undo/redo stacks of full pipeline snapshots, change-listener events with the
same event names (``step_added``, ``steps_reordered``, ``pipeline_restored``,
...), class-level default cache/recovery directories, and the accelerator
executor hook with host fallback.

Execution is where the design diverges: ``apply`` routes an ndarray through
the fused-chain compiler (one XLA program per chain signature) instead of a
per-step numpy loop; ND stacks batch through ``vmap`` instead of python
slice loops when every enabled step is device-capable; tiled handles stream
through the tile runtime.  The reference's per-step host semantics remain
available via ``apply_host`` and are what ``PipelineStep.apply`` itself runs.
"""
from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from pathlib import Path
from typing import (
    Any,
    Callable,
    Dict,
    Iterable,
    Iterator,
    List,
    Optional,
    Protocol,
    Tuple,
)

import numpy as np

from yamimageprocessor_tpu.pipeline.step import PipelineStep

LOGGER = logging.getLogger(__name__)

PipelineChangeListener = Callable[[str, Dict[str, Any]], None]


def _is_colour_array(array: np.ndarray) -> bool:
    return array.ndim == 3 and array.shape[2] in (3, 4)


class AcceleratorExecutor(Protocol):
    """Executes steps marked ``requires_gpu`` (the reference's GpuExecutor
    protocol, ``processing/pipeline_manager.py:69-73``)."""

    def execute(self, step: PipelineStep, image: np.ndarray) -> np.ndarray: ...


def _prepared_dir(path) -> Optional[Path]:
    """Coerce an optional path-like to a created directory (None passes
    through) — shared by every cache/recovery directory setter below."""

    if path is None:
        return None
    resolved = Path(path)
    resolved.mkdir(parents=True, exist_ok=True)
    return resolved


@dataclass
class PipelineState:
    """History snapshot (steps + optional image + cache signature)."""

    steps: List[PipelineStep]
    image: Optional[np.ndarray] = None
    cache_signature: Optional[str] = None

    def clone(self) -> "PipelineState":
        image = self.image
        return PipelineState(
            steps=[step.clone() for step in self.steps],
            image=image.copy() if image is not None else None,
            cache_signature=self.cache_signature,
        )


class PipelineManager:
    """Ordered steps with undo/redo and compiled execution."""

    _default_cache_dir: Optional[Path] = None
    _default_recovery_root: Optional[Path] = None

    def __init__(
        self,
        steps: Optional[Iterable[PipelineStep]] = None,
        *,
        cache_dir: Optional[os.PathLike[str] | str] = None,
        recovery_root: Optional[os.PathLike[str] | str] = None,
        gpu_executor: Optional[AcceleratorExecutor] = None,
        prefer_device: bool = True,
        isolate_failures: bool = False,
    ) -> None:
        self._isolate_failures = isolate_failures
        self._template: List[PipelineStep] = [s.clone() for s in (steps or [])]
        self._steps: List[PipelineStep] = [s.clone() for s in self._template]
        self._undo: List[PipelineState] = []
        self._redo: List[PipelineState] = []
        self._listeners: List[PipelineChangeListener] = []
        self._gpu_executor = gpu_executor
        self._prefer_device = prefer_device
        if cache_dir is None:
            cache_dir = self._default_cache_dir
        if recovery_root is None:
            recovery_root = self._default_recovery_root
        self._cache_directory = _prepared_dir(cache_dir)
        self._recovery_root = _prepared_dir(recovery_root)

    # ------------------------------------------------------------------
    # directories
    @classmethod
    def set_default_cache_directory(cls, path) -> None:
        cls._default_cache_dir = _prepared_dir(path)

    @classmethod
    def set_default_recovery_root(cls, path) -> None:
        cls._default_recovery_root = _prepared_dir(path)

    @property
    def cache_directory(self) -> Optional[Path]:
        return self._cache_directory

    @property
    def recovery_root(self) -> Optional[Path]:
        return self._recovery_root

    def set_cache_directory(self, path) -> None:
        self._cache_directory = _prepared_dir(path)

    def set_recovery_root(self, path) -> None:
        self._recovery_root = _prepared_dir(path)

    # ------------------------------------------------------------------
    # step access
    def __iter__(self) -> Iterator[PipelineStep]:
        return iter(self._steps)

    @property
    def steps(self) -> Tuple[PipelineStep, ...]:
        return tuple(self._steps)

    def iter_enabled_steps(self) -> Iterator[PipelineStep]:
        return (s for s in self._steps if s.enabled)

    def template_steps(self) -> Tuple[PipelineStep, ...]:
        return tuple(s.clone() for s in self._template)

    def clone(self) -> "PipelineManager":
        duplicate = PipelineManager(
            self._template,
            cache_dir=self._cache_directory,
            recovery_root=self._recovery_root,
            gpu_executor=self._gpu_executor,
            prefer_device=self._prefer_device,
            isolate_failures=self._isolate_failures,
        )
        duplicate._steps = [s.clone() for s in self._steps]
        return duplicate

    def reset(self) -> None:
        self._steps = [s.clone() for s in self._template]
        self.clear_history()
        self._emit("pipeline_reset", steps=tuple(self._steps))

    def clear_history(self) -> None:
        self._undo.clear()
        self._redo.clear()

    def set_gpu_executor(self, executor: Optional[AcceleratorExecutor]) -> None:
        self._gpu_executor = executor

    def replace_steps(
        self,
        steps: Iterable[PipelineStep],
        *,
        update_template: bool = False,
        preserve_history: bool = False,
    ) -> None:
        cloned = [s.clone() for s in steps]
        self._steps = cloned
        if update_template:
            self._template = [s.clone() for s in cloned]
        if not preserve_history:
            self.clear_history()
        self._emit("steps_replaced", steps=tuple(self._steps))

    # ------------------------------------------------------------------
    # mutation
    def add_step(self, step: PipelineStep, index: Optional[int] = None) -> None:
        if index is None:
            self._steps.append(step)
            index = len(self._steps) - 1
        else:
            self._steps.insert(index, step)
        self._emit("step_added", step=step, index=index)

    def remove_step(self, index: int) -> PipelineStep:
        removed = self._steps.pop(index)
        self._emit("step_removed", step=removed, index=index)
        return removed

    def move_step(self, old_index: int, new_index: int) -> None:
        moved = self._steps.pop(old_index)
        self._steps.insert(new_index, moved)
        # event payload (names + kwargs) is the wire contract panes rely on
        detail = dict(step=moved, old_index=old_index, new_index=new_index)
        self._emit("steps_reordered", steps=tuple(self._steps), **detail)

    def swap_steps(self, index_a: int, index_b: int) -> None:
        order = self._steps
        order[index_a], order[index_b] = order[index_b], order[index_a]
        self._emit(
            "steps_swapped",
            first_index=index_a,
            second_index=index_b,
            steps=tuple(order),
        )

    def set_order(self, order: Iterable[str]) -> None:
        # FIFO per name: duplicate step names are legal (the reference's
        # order managers allow repeats), so a name->step dict would
        # silently drop all but one duplicate
        remaining: Dict[str, List[PipelineStep]] = {}
        for s in self._steps:
            remaining.setdefault(s.name, []).append(s)
        reordered: List[PipelineStep] = []
        for name in order:
            bucket = remaining.get(name)
            if not bucket:
                raise KeyError(f"Unknown pipeline step '{name}'")
            reordered.append(bucket.pop(0))
        for step in self._steps:
            bucket = remaining.get(step.name)
            if bucket and bucket[0] is step:
                reordered.append(bucket.pop(0))
        self._steps = reordered
        self._emit("steps_reordered", steps=tuple(self._steps))

    def get_step(self, identifier: int | str) -> PipelineStep:
        if isinstance(identifier, int):
            return self._steps[identifier]
        match = next((s for s in self._steps if s.name == identifier), None)
        if match is None:
            raise KeyError(f"No pipeline step named '{identifier}'")
        return match

    def set_step_enabled(self, identifier: int | str, enabled: bool) -> None:
        step = self.get_step(identifier)
        if step.enabled != enabled:
            step.enabled = enabled
            self._emit("step_state_changed", step=step, enabled=enabled)

    def toggle_step(self, identifier: int | str) -> bool:
        step = self.get_step(identifier)
        step.enabled = not step.enabled
        self._emit("step_state_changed", step=step, enabled=step.enabled)
        return step.enabled

    def update_step_params(
        self, identifier: int | str, params: Dict[str, Any], *, replace: bool = False
    ) -> None:
        step = self.get_step(identifier)
        if replace:
            step.params = dict(params)
        else:
            step.params.update(params)
        self._emit("step_params_updated", step=step, replace=replace)

    # ------------------------------------------------------------------
    # execution
    def apply(self, image: Any) -> Any:
        """Run enabled steps; device-compiled when possible."""

        if hasattr(image, "iter_tiles"):
            return self._apply_tiled(image)
        array = np.asarray(image)
        if self._requires_slice_processing(array):
            return self._apply_slice_wise_nd(array)
        enabled = [s for s in self._steps if s.enabled]
        if not enabled:
            return array.copy()
        needs_executor = any(s.execution.requires_gpu for s in enabled)
        if self._prefer_device and not needs_executor:
            try:
                from yamimageprocessor_tpu.pipeline.compiler import get_compiled_chain

                chain = get_compiled_chain(enabled, array.shape, array.dtype)
                return chain.run_final(array, enabled)
            except Exception:
                LOGGER.exception(
                    "Compiled chain execution failed; falling back to host path"
                )
        return self.apply_host(array)

    def apply_host(self, image: Any) -> Any:
        """Reference-semantics host execution (per-step, executor-aware).

        With ``isolate_failures`` (the packaged manager's contract,
        ``yam_processor/processing/pipeline_manager.py:668-716``) a raising
        step is disabled, its traceback lands under the recovery root, and
        a PipelineExecutionError is raised.
        """

        if isinstance(image, np.ndarray) and self._requires_slice_processing(image):
            # recurse to 2-D planes (or 3-D colour images): reference
            # semantics run each plane through the whole chain
            # (processing/pipeline_manager.py:467-492); handing a step a
            # (Z, H, W) stack would misread the leading axis as channels
            slices = [self.apply_host(image[i]) for i in range(image.shape[0])]
            try:
                return np.stack(slices, axis=0)
            except ValueError:
                return np.array(slices, dtype=object)
        result = image.copy() if isinstance(image, np.ndarray) else image
        for index, step in enumerate(self._steps):
            if not step.enabled:
                continue
            if not self._isolate_failures:
                result = self._run_step(step, result)
                continue
            try:
                result = self._run_step(step, result)
            except Exception as exc:
                from yamimageprocessor_tpu.pipeline.errors import (
                    PipelineExecutionError,
                    PipelineFailure,
                    write_failure_traceback,
                )

                step.enabled = False
                failure = PipelineFailure(
                    step_name=step.name, step_index=index, error=exc
                )
                write_failure_traceback(self._recovery_root, failure)
                self._emit("step_failed", step=step, index=index, failure=failure)
                raise PipelineExecutionError(failure) from exc
        return result

    run_host = apply_host

    def _apply_tiled(self, image: Any) -> Any:
        from yamimageprocessor_tpu.parallel.tiling import apply_steps_tiled

        enabled = [s for s in self._steps if s.enabled]
        if not enabled:
            return image
        if any(s.supports_tiled_input for s in enabled):
            result: Any = image
            for step in enabled:
                result = self._run_step(step, result)
            return result
        return apply_steps_tiled(enabled, image)

    def _run_step(self, step: PipelineStep, image: Any) -> Any:
        if step.execution.requires_gpu and self._gpu_executor is not None:
            array = image if isinstance(image, np.ndarray) else image.to_array()
            result = self._gpu_executor.execute(step, array)
            return array if result is None else result
        if step.execution.requires_gpu and self._gpu_executor is None:
            LOGGER.warning(
                "Step '%s' requires accelerator execution but no executor is "
                "configured; falling back to host.",
                step.name,
            )
            array = image if isinstance(image, np.ndarray) else image.to_array()
            return step.apply(array)
        if isinstance(image, np.ndarray) and self._requires_slice_processing(image):
            return self._apply_slice_wise_step(step, image)
        return step.apply(image)

    @staticmethod
    def _requires_slice_processing(array: np.ndarray) -> bool:
        # plain 2-D frames and HxWx{3,4} colour frames process whole;
        # anything deeper is an ND stack handled plane-by-plane
        return array.ndim > 2 and not _is_colour_array(array)

    def _apply_slice_wise_nd(self, array: np.ndarray) -> np.ndarray:
        """ND stacks: batch the whole chain when device-capable, else loop
        planes (reference semantics, ``pipeline_manager.py:467-492``)."""

        enabled = [s for s in self._steps if s.enabled]
        if not enabled:
            return array.copy()
        leading = array.shape[0]
        if self._prefer_device and all(s.is_device_capable() for s in enabled):
            try:
                from yamimageprocessor_tpu.pipeline.compiler import get_compiled_chain

                # flatten EVERY leading axis so each vmapped item is one
                # image plane: batching only axis 0 of a (T, Z, H, W) stack
                # hands 3-D non-colour items to device ops, which would
                # misread the Z axis as BGR channels
                item_nd = 3 if array.shape[-1] in (3, 4) else 2
                flat = array.reshape((-1,) + array.shape[-item_nd:])
                chain = get_compiled_chain(
                    enabled, flat.shape, flat.dtype, batch=flat.shape[0]
                )
                out = chain.run_final(flat, enabled)
                return out.reshape(array.shape[: array.ndim - item_nd] + out.shape[1:])
            except Exception:
                LOGGER.exception("Batched chain failed; slice-wise host fallback")
        slices = [self.apply_host(array[i]) for i in range(leading)]
        if not slices:
            return array.copy()
        try:
            return np.stack(slices, axis=0)
        except ValueError:
            return np.array(slices, dtype=object)

    def _apply_slice_wise_step(self, step: PipelineStep, array: np.ndarray):
        slices = []
        for i in range(array.shape[0]):
            result = step.apply(array[i])
            if hasattr(result, "to_array"):
                result = result.to_array()
            slices.append(np.asarray(result))
        if not slices:
            return array.copy()
        try:
            return np.stack(slices, axis=0)
        except ValueError:
            return np.array(slices, dtype=object)

    @staticmethod
    def extract_preview(array: np.ndarray, axis: int = 0) -> np.ndarray:
        """Representative 2-D slice (``pipeline_manager.py:494-504``)."""

        array = np.asarray(array)
        if array.ndim <= 2 or _is_colour_array(array):
            return array
        axis = int(np.clip(axis, 0, array.ndim - 1))
        return np.take(array, array.shape[axis] // 2, axis=axis)

    # ------------------------------------------------------------------
    # history
    def _snapshot(self, image, cache_signature) -> PipelineState:
        return PipelineState(
            [s.clone() for s in self._steps],
            None if image is None else image.copy(),
            cache_signature,
        )

    def push_state(self, *, image=None, cache_signature=None) -> None:
        self._undo.append(self._snapshot(image, cache_signature))
        self._redo.clear()

    def undo(self, *, current_image=None, current_cache_signature=None):
        if not self._undo:
            return None
        self._redo.append(self._snapshot(current_image, current_cache_signature))
        previous = self._undo.pop()
        self._steps = [s.clone() for s in previous.steps]
        self._emit("pipeline_restored", source="undo", steps=tuple(self._steps))
        return previous.clone()

    def redo(self, *, current_image=None, current_cache_signature=None):
        if not self._redo:
            return None
        self._undo.append(self._snapshot(current_image, current_cache_signature))
        nxt = self._redo.pop()
        self._steps = [s.clone() for s in nxt.steps]
        self._emit("pipeline_restored", source="redo", steps=tuple(self._steps))
        return nxt.clone()

    def history_depth(self) -> Tuple[int, int]:
        return len(self._undo), len(self._redo)

    def can_undo(self) -> bool:
        return bool(self._undo)

    def can_redo(self) -> bool:
        return bool(self._redo)

    def to_dict(self) -> Dict[str, Any]:
        return {"steps": [s.to_dict() for s in self._steps]}

    # ------------------------------------------------------------------
    # listeners
    def add_change_listener(self, listener: PipelineChangeListener) -> None:
        if listener not in self._listeners:
            self._listeners.append(listener)

    def remove_change_listener(self, listener: PipelineChangeListener) -> None:
        try:
            self._listeners.remove(listener)
        except ValueError:
            pass

    def _emit(self, event: str, **metadata: Any) -> None:
        for listener in tuple(self._listeners):
            try:
                listener(event, dict(metadata))
            except Exception:
                LOGGER.debug("Pipeline change listener failed", exc_info=True)


__all__ = [
    "AcceleratorExecutor",
    "PipelineChangeListener",
    "PipelineManager",
    "PipelineState",
    "PipelineStep",
]
