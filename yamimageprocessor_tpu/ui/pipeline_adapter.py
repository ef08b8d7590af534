"""ControllerBackedPipeline: the pane-facing execution adapter.

Parity with ``ui/pipeline_adapter.py:16-111`` — the public contract the
north star requires preserved: panes get an object with ``apply(image)``
and ``steps`` backed by the controller; source and seed images come from
resolver callables; ``apply`` runs the enabled stages and returns this
stage's cached result; ``coerce_pipeline_image`` densifies tiled handles.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from yamimageprocessor_tpu.ops.schema import Stage

SourceResolver = Callable[[], Optional[np.ndarray]]
SeedResolver = Callable[[], Dict[Stage, np.ndarray]]


def coerce_pipeline_image(image: Any) -> Optional[np.ndarray]:
    """Densify tiled/lazy handles (``ui/pipeline_adapter.py:16-35``)."""

    if image is None:
        return None
    if hasattr(image, "to_array"):
        return np.asarray(image.to_array())
    return np.asarray(image)


class ControllerBackedPipeline:
    """Stage-scoped pipeline view over the unified controller."""

    def __init__(
        self,
        controller: Any,
        stage: Stage,
        *,
        source_resolver: Optional[SourceResolver] = None,
        seed_resolver: Optional[SeedResolver] = None,
    ) -> None:
        self._controller = controller
        self._stage = stage
        self._source_resolver = source_resolver
        self._seed_resolver = seed_resolver

    @property
    def stage(self) -> Stage:
        return self._stage

    @property
    def steps(self) -> Tuple[Any, ...]:
        return self._controller.stage_steps(self._stage)

    def apply(self, image: Any) -> Optional[np.ndarray]:
        """Run enabled stages and return this stage's result
        (``ui/pipeline_adapter.py:67-111``)."""

        source = coerce_pipeline_image(image)
        if source is None and self._source_resolver is not None:
            source = coerce_pipeline_image(self._source_resolver())
        seeds: Dict[Stage, np.ndarray] = {}
        if self._seed_resolver is not None:
            seeds = {
                stage: coerce_pipeline_image(value)
                for stage, value in (self._seed_resolver() or {}).items()
            }
        self._controller.run_enabled_stages(source, seeds)
        result = self._controller.cached_stage_result(self._stage)
        return coerce_pipeline_image(result)


__all__ = ["ControllerBackedPipeline", "coerce_pipeline_image"]
