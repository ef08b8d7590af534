"""Pipeline step: one op application with parameters and execution hints.

API-parity rebuild of the reference step contract
(``processing/pipeline_manager.py:45-170``): same ``to_dict``/``from_dict``
wire schema (name / enabled / params / execution / supports_tiled_input /
stage), same ``apply`` semantics (disabled steps pass through; tiled handles
materialize unless the step opts in; in-place buffer reuse hint honored).

Differences by design: a step references an op from the registry by
identifier instead of holding a bare python function; the registry gives the
runtime both the host (golden) path used by ``apply`` and the jittable
device path used by the fused-chain compiler.  Plugin-supplied raw callables
are still supported — they simply become host-only steps.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np

from yamimageprocessor_tpu.ops.schema import Stage, op_by_step_name


@dataclass
class StepExecutionMetadata:
    """Execution hints (``processing/pipeline_manager.py:45-66``)."""

    supports_inplace: bool = False
    requires_gpu: bool = False  # historical name; means "wants accelerator"

    def to_dict(self) -> Dict[str, Any]:
        return {
            "supports_inplace": self.supports_inplace,
            "requires_gpu": self.requires_gpu,
        }

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "StepExecutionMetadata":
        return cls(
            supports_inplace=bool(data.get("supports_inplace", False)),
            requires_gpu=bool(data.get("requires_gpu", False)),
        )

    def is_default(self) -> bool:
        return not (self.supports_inplace or self.requires_gpu)


@dataclass
class PipelineStep:
    """One named op application in an ordered chain."""

    name: str
    function: Optional[Callable[..., Any]] = None
    op_id: Optional[str] = None
    enabled: bool = True
    params: Dict[str, Any] = field(default_factory=dict)
    execution: StepExecutionMetadata = field(default_factory=StepExecutionMetadata)
    supports_tiled_input: bool = False
    stage: Optional[Stage] = None

    def __post_init__(self) -> None:
        if self.op_id is None and self.function is None and self.stage is not None:
            schema = op_by_step_name(self.stage, self.name)
            if schema is not None:
                self.op_id = schema.identifier

    # ------------------------------------------------------------------
    @property
    def impl(self):
        """The registered OpImpl, or None for custom-function steps."""

        if self.op_id is None:
            return None
        from yamimageprocessor_tpu.ops.registry import get_impl

        return get_impl(self.op_id)

    def is_device_capable(self) -> bool:
        impl = self.impl
        return impl is not None and impl.jittable and impl.device_fn is not None

    def halo(self) -> int:
        impl = self.impl
        return impl.halo_for(self.params) if impl is not None else 0

    # ------------------------------------------------------------------
    def apply(self, image: Any) -> Any:
        """Host-path execution (reference semantics, lines 92-111)."""

        if not self.enabled:
            return image
        operand = image
        if hasattr(image, "to_array") and not self.supports_tiled_input:
            operand = image.to_array()

        if self.function is not None:
            result = self.function(operand, **self.params)
        elif self.impl is not None:
            result = self.impl.golden_fn(operand, **self.params)
        else:
            raise RuntimeError(
                f"Step '{self.name}' has neither a registered op nor a function"
            )
        if result is None:
            result = operand
        if self.execution.supports_inplace:
            if isinstance(operand, np.ndarray) and isinstance(result, np.ndarray):
                if result is operand:
                    return operand
                if result.shape == operand.shape and result.dtype == operand.dtype:
                    operand[...] = result
                    return operand
        return result

    def clone(self) -> "PipelineStep":
        return PipelineStep(
            name=self.name,
            function=self.function,
            op_id=self.op_id,
            enabled=self.enabled,
            params=dict(self.params),
            execution=StepExecutionMetadata(
                supports_inplace=self.execution.supports_inplace,
                requires_gpu=self.execution.requires_gpu,
            ),
            supports_tiled_input=self.supports_tiled_input,
            stage=self.stage,
        )

    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        payload: Dict[str, Any] = {
            "name": self.name,
            "enabled": self.enabled,
            "params": dict(self.params),
        }
        if not self.execution.is_default():
            payload["execution"] = self.execution.to_dict()
        if self.supports_tiled_input:
            payload["supports_tiled_input"] = True
        if self.stage is not None:
            payload["stage"] = self.stage.value
        if self.op_id is not None:
            # optional extra key (absent from reference payloads, which
            # resolve by stage+name): without it a step built with an
            # explicit op_id but no stage cannot re-resolve after round-trip
            payload["op_id"] = self.op_id
        return payload

    @classmethod
    def from_dict(
        cls,
        data: Dict[str, Any],
        function: Optional[Callable[..., Any]] = None,
    ) -> "PipelineStep":
        stage: Optional[Stage] = None
        stage_value = data.get("stage")
        if isinstance(stage_value, str):
            try:
                stage = Stage(stage_value)
            except ValueError:
                stage = None
        elif isinstance(stage_value, Stage):
            stage = stage_value
        return cls(
            name=data["name"],
            function=function,
            op_id=data.get("op_id"),
            enabled=bool(data.get("enabled", True)),
            params=dict(data.get("params", {})),
            execution=StepExecutionMetadata.from_dict(data.get("execution", {})),
            supports_tiled_input=bool(data.get("supports_tiled_input", False)),
            stage=stage,
        )


__all__ = ["PipelineStep", "StepExecutionMetadata"]
