"""Base classes for dynamically discovered processing modules.

Union of the two reference plugin contracts (SURVEY §2.3):

* active ABC (``plugins/module_base.py:19-160``): frozen
  :class:`ModuleMetadata`, ``menu_entries()``, ``activate(pane)``,
  parameter metadata + ``default_parameters``/``sanitize_parameters``,
  ``create_pipeline_step()`` template factory, execution hints and the
  tiled-input opt-in;
* packaged additions (``yam_processor/plugins/base.py:28-161``):
  :class:`ModuleCapabilities` and ``parameter_schema()``/``preview()``.

Parameter metadata comes from the op schema registry
(:mod:`yamimageprocessor_tpu.ops.schema`) instead of a UI-side table, so
headless and UI callers share one source of truth.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Dict, Iterable, Mapping, Optional, Sequence, Tuple

import numpy as np

from yamimageprocessor_tpu.ops.schema import (
    OpSchema,
    ParamSpec,
    Stage as ModuleStage,
    op_by_identifier,
)
from yamimageprocessor_tpu.pipeline.step import PipelineStep, StepExecutionMetadata


@dataclass(frozen=True)
class ModuleMetadata:
    """Descriptive metadata for menus and diagnostics."""

    identifier: str
    title: str
    stage: ModuleStage
    description: str = ""
    menu_path: Tuple[str, ...] = ("Pre-Processing",)
    shortcut: Optional[str] = None
    default_enabled: bool = False


@dataclass(frozen=True)
class MenuEntry:
    path: Tuple[str, ...]
    text: str
    description: str = ""
    shortcut: Optional[str] = None


@dataclass(frozen=True)
class ModuleCapabilities:
    """Execution capabilities (``yam_processor/plugins/base.py:28-45``)."""

    supports_batch: bool = True
    requires_gpu: bool = False
    is_deterministic: bool = True


class ModuleBase(ABC):
    """A discoverable processing module."""

    #: registry op backing this module (None for custom python modules)
    op_identifier: Optional[str] = None

    def __init__(self) -> None:
        self._metadata = self._build_metadata()

    # ------------------------------------------------------------------
    @property
    def metadata(self) -> ModuleMetadata:
        return self._metadata

    @abstractmethod
    def _build_metadata(self) -> ModuleMetadata:
        """Construct the immutable metadata descriptor."""

    @property
    def op_schema(self) -> Optional[OpSchema]:
        if self.op_identifier is None:
            return None
        return op_by_identifier(self.op_identifier)

    def capabilities(self) -> ModuleCapabilities:
        return ModuleCapabilities()

    # ------------------------------------------------------------------
    # parameters
    def parameter_schema(self) -> Sequence[ParamSpec]:
        schema = self.op_schema
        return tuple(schema.params) if schema is not None else ()

    def parameter_metadata(self) -> Mapping[str, ParamSpec]:
        return {spec.name: spec for spec in self.parameter_schema()}

    def default_parameters(self) -> Dict[str, Any]:
        return {spec.name: spec.default for spec in self.parameter_schema()}

    def sanitize_parameters(self, params: Mapping[str, Any]) -> Dict[str, Any]:
        sanitized = dict(self.default_parameters())
        sanitized.update(params)
        for name, spec in self.parameter_metadata().items():
            if name in sanitized:
                sanitized[name] = spec.coerce(sanitized[name])
        return sanitized

    # ------------------------------------------------------------------
    # menus / activation
    def menu_entries(self) -> Sequence[MenuEntry]:
        meta = self.metadata
        return (
            MenuEntry(
                path=meta.menu_path,
                text=meta.title,
                description=meta.description,
                shortcut=meta.shortcut,
            ),
        )

    def activate(self, pane: Any) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} does not implement an activation handler"
        )

    # ------------------------------------------------------------------
    # pipeline integration
    def pipeline_execution_metadata(self) -> StepExecutionMetadata:
        caps = self.capabilities()
        return StepExecutionMetadata(requires_gpu=caps.requires_gpu)

    def supports_tiled_input(self) -> bool:
        return False

    def create_pipeline_step(self) -> PipelineStep:
        return PipelineStep(
            name=self.metadata.identifier,
            function=None if self.op_identifier else self.process,
            op_id=self.op_identifier,
            enabled=self.metadata.default_enabled,
            params=self.default_parameters(),
            execution=self.pipeline_execution_metadata(),
            supports_tiled_input=self.supports_tiled_input(),
            stage=self.metadata.stage,
        )

    def process(self, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        """Host execution; registry-backed modules dispatch to their op."""

        schema = self.op_schema
        if schema is None:
            raise NotImplementedError(
                f"{type(self).__name__} must implement process()"
            )
        from yamimageprocessor_tpu.ops.registry import get_impl

        params = self.sanitize_parameters(kwargs)
        return get_impl(schema.identifier).golden_fn(image, **params)

    def preview(self, image: np.ndarray, **kwargs: Any) -> np.ndarray:
        return self.process(image, **kwargs)

    # ------------------------------------------------------------------
    @classmethod
    def iter_modules(cls) -> Iterable[type["ModuleBase"]]:
        yield from cls.__subclasses__()


__all__ = [
    "MenuEntry",
    "ModuleBase",
    "ModuleCapabilities",
    "ModuleMetadata",
    "ModuleStage",
]
