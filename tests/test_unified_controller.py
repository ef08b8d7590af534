"""UnifiedPipelineController: stage bounds, events, seeded runs,
downstream invalidation (models tests/ui/test_unified_pipeline_controller.py)."""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.pipeline.manager import PipelineManager
from yamimageprocessor_tpu.pipeline.step import PipelineStep
from yamimageprocessor_tpu.ui.controller import UnifiedPipelineController
from yamimageprocessor_tpu.ui.pipeline_adapter import (
    ControllerBackedPipeline,
    coerce_pipeline_image,
)


def _add(image, amount=10):
    return np.clip(image.astype(np.int32) + amount, 0, 255).astype(np.uint8)


def _steps():
    return [
        PipelineStep(name="pre-a", function=_add, params={"amount": 1},
                     stage=Stage.PREPROCESSING),
        PipelineStep(name="pre-b", function=_add, params={"amount": 2},
                     stage=Stage.PREPROCESSING),
        PipelineStep(name="seg-a", function=_add, params={"amount": 4},
                     stage=Stage.SEGMENTATION),
        PipelineStep(name="ext-a", function=_add, params={"amount": 8},
                     stage=Stage.ANALYSIS),
    ]


@pytest.fixture()
def controller():
    return UnifiedPipelineController(manager=PipelineManager(_steps()))


@pytest.fixture()
def probe(controller):
    events = []
    controller.add_listener(lambda ev, payload: events.append((ev, payload)))
    return events


def test_stage_bounds(controller):
    assert controller.stage_bounds(Stage.PREPROCESSING) == (0, 2)
    assert controller.stage_bounds(Stage.SEGMENTATION) == (2, 3)
    assert controller.stage_bounds(Stage.ANALYSIS) == (3, 4)
    assert [s.name for s in controller.stage_steps(Stage.PREPROCESSING)] == [
        "pre-a",
        "pre-b",
    ]


def test_dependencies_are_linear(controller):
    assert controller.stage_dependencies(Stage.PREPROCESSING) == ()
    assert controller.stage_dependencies(Stage.ANALYSIS) == (
        Stage.PREPROCESSING,
        Stage.SEGMENTATION,
    )


def test_run_enabled_stages(controller):
    img = np.zeros((8, 8), np.uint8)
    results = controller.run_enabled_stages(img)
    assert results[Stage.PREPROCESSING].max() == 3
    assert results[Stage.SEGMENTATION].max() == 7
    assert results[Stage.ANALYSIS].max() == 15
    cached = controller.cached_stage_result(Stage.SEGMENTATION)
    assert (cached == results[Stage.SEGMENTATION]).all()


def test_seeded_run_skips_upstream(controller):
    img = np.zeros((8, 8), np.uint8)
    seed = np.full((8, 8), 100, np.uint8)
    results = controller.run_enabled_stages(img, {Stage.PREPROCESSING: seed})
    assert results[Stage.PREPROCESSING].max() == 100
    assert results[Stage.SEGMENTATION].max() == 104


def test_insert_remove_fire_events(controller, probe):
    step = PipelineStep(name="seg-b", function=_add, params={"amount": 16})
    controller.insert_stage_step(Stage.SEGMENTATION, 1, step)
    assert controller.stage_bounds(Stage.SEGMENTATION) == (2, 4)
    removed = controller.remove_stage_step(Stage.SEGMENTATION, 1)
    assert removed.name == "seg-b"
    names = [ev for ev, _ in probe]
    assert "stage_steps_inserted" in names and "stage_steps_removed" in names


def test_downstream_invalidation(controller, probe):
    img = np.zeros((8, 8), np.uint8)
    controller.run_enabled_stages(img)
    probe.clear()
    controller.update_stage_step(Stage.SEGMENTATION, 0, params={"amount": 5})
    assert controller.cached_stage_result(Stage.SEGMENTATION) is None
    assert controller.cached_stage_result(Stage.ANALYSIS) is None
    # preprocessing result untouched
    assert controller.cached_stage_result(Stage.PREPROCESSING) is not None


def test_replace_stage_steps(controller):
    new = [PipelineStep(name="seg-x", function=_add, params={"amount": 32})]
    controller.replace_stage_steps(Stage.SEGMENTATION, new)
    assert [s.name for s in controller.stage_steps(Stage.SEGMENTATION)] == ["seg-x"]
    assert controller.stage_bounds(Stage.ANALYSIS) == (3, 4)


def test_controller_backed_pipeline(controller):
    img = np.zeros((8, 8), np.uint8)
    adapter = ControllerBackedPipeline(
        controller,
        Stage.SEGMENTATION,
        source_resolver=lambda: img,
    )
    out = adapter.apply(None)
    assert out.max() == 7
    assert [s.name for s in adapter.steps] == ["seg-a"]


def test_coerce_pipeline_image():
    class Lazy:
        def to_array(self):
            return np.ones((2, 2))

    assert coerce_pipeline_image(None) is None
    assert (coerce_pipeline_image(Lazy()) == 1).all()


def test_manager_mid_stage_mutation_invalidates_downstream_only(controller):
    """Mutating through the MANAGER (not the controller API) still invalidates
    the right stages via the change-listener hookup
    (tests/ui/test_unified_pipeline_controller.py:251-293)."""
    img = np.zeros((8, 8), np.uint8)
    controller.run_enabled_stages(img)
    for stage in (Stage.PREPROCESSING, Stage.SEGMENTATION, Stage.ANALYSIS):
        assert controller.cached_stage_result(stage) is not None

    controller.manager.toggle_step("seg-a")

    assert controller.cached_stage_result(Stage.PREPROCESSING) is not None
    assert controller.cached_stage_result(Stage.SEGMENTATION) is None
    assert controller.cached_stage_result(Stage.ANALYSIS) is None
    seg_steps = controller.stage_steps(Stage.SEGMENTATION)
    assert seg_steps and not seg_steps[0].enabled

    # a re-run repopulates the invalidated stages
    controller.run_enabled_stages(img)
    assert controller.cached_stage_result(Stage.SEGMENTATION) is not None
    assert controller.cached_stage_result(Stage.ANALYSIS) is not None


def test_manager_upstream_mutation_invalidates_all(controller):
    """Toggling a preprocessing step clears every stage's cached result
    (tests/ui/test_unified_pipeline_controller.py:295-330)."""
    img = np.ones((4, 4), np.uint8)
    controller.run_enabled_stages(img)
    controller.manager.toggle_step("pre-a")
    for stage in (Stage.PREPROCESSING, Stage.SEGMENTATION, Stage.ANALYSIS):
        assert controller.cached_stage_result(stage) is None


def test_reorder_events_invalidate_stage_caches(rng):
    """set_order/swap_steps emit step-less events; stage caches must still
    invalidate (r3 review: stale results survived direct reorders)."""

    from yamimageprocessor_tpu.ops.schema import Stage
    from yamimageprocessor_tpu.pipeline.step import PipelineStep
    from yamimageprocessor_tpu.ui.controller import UnifiedPipelineController

    controller = UnifiedPipelineController()
    controller.replace_stage_steps(
        Stage.PREPROCESSING,
        [
            PipelineStep(name="Gamma", stage=Stage.PREPROCESSING, params={"value": 2.0}),
            PipelineStep(name="Grayscale", stage=Stage.PREPROCESSING),
        ],
    )
    src = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    controller.run_enabled_stages(src)
    assert controller.cached_stage_result(Stage.PREPROCESSING) is not None
    controller.manager.set_order(["Grayscale", "Gamma"])
    assert controller.cached_stage_result(Stage.PREPROCESSING) is None
    controller.run_enabled_stages(src)
    assert controller.cached_stage_result(Stage.PREPROCESSING) is not None
    controller.manager.swap_steps(0, 1)
    assert controller.cached_stage_result(Stage.PREPROCESSING) is None


def test_skipped_stage_clears_previous_result(rng):
    from yamimageprocessor_tpu.ops.schema import Stage
    from yamimageprocessor_tpu.pipeline.step import PipelineStep
    from yamimageprocessor_tpu.ui.controller import UnifiedPipelineController

    controller = UnifiedPipelineController()
    controller.replace_stage_steps(
        Stage.PREPROCESSING,
        [PipelineStep(name="Gamma", stage=Stage.PREPROCESSING, params={"value": 2.0})],
    )
    src = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    controller.run_enabled_stages(src)
    assert controller.cached_stage_result(Stage.PREPROCESSING) is not None
    controller.run_enabled_stages(None)  # no source: stages are skipped
    assert controller.cached_stage_result(Stage.PREPROCESSING) is None
