"""Control metadata registry — UI-facing view over the op schemas.

Parity with ``ui/control_metadata.py:29-146``: per-module parameter
metadata (type/min/max/step/decimals/choices), clamping & odd-size
coercion, auto-tooltips with ranges and defaults, and the
``MODULE_CONTROL_METADATA`` mapping keyed by module identifier.  The data
source is :mod:`yamimageprocessor_tpu.ops.schema` — one registry feeds both
headless and UI callers.
"""
from __future__ import annotations

from typing import Dict, Mapping

from yamimageprocessor_tpu.ops.schema import ALL_OPS, ParamSpec

ControlMetadata = ParamSpec  # the schema spec IS the control metadata


def _module_identifier(op) -> str:
    return op.step_name


MODULE_CONTROL_METADATA: Dict[str, Dict[str, ParamSpec]] = {
    _module_identifier(op): {spec.name: spec for spec in op.params}
    for op in ALL_OPS
}


def get_module_control_metadata(identifier: str) -> Mapping[str, ParamSpec]:
    """Metadata for one module (``ui/control_metadata.py:146``)."""

    return MODULE_CONTROL_METADATA.get(identifier, {})


def tooltip_text(identifier: str, parameter: str) -> str:
    spec = get_module_control_metadata(identifier).get(parameter)
    return "" if spec is None else spec.tooltip_text()


def format_parameter_tooltip(
    description: str,
    minimum=None,
    maximum=None,
    shortcuts: str | None = None,
) -> str:
    """Standalone tooltip formatter (``yam_processor/ui/tooltips.py``)."""

    parts = [description] if description else []
    bounds = []
    if minimum is not None:
        bounds.append(f"min {minimum:g}")
    if maximum is not None:
        bounds.append(f"max {maximum:g}")
    if bounds:
        parts.append("(" + ", ".join(bounds) + ")")
    if shortcuts:
        parts.append(f"[{shortcuts}]")
    return " ".join(parts)


__all__ = [
    "ControlMetadata",
    "MODULE_CONTROL_METADATA",
    "get_module_control_metadata",
    "tooltip_text",
    "format_parameter_tooltip",
]
