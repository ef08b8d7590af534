"""PipelineManager semantics (parity with reference tests/test_pipeline_manager.py)."""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.pipeline import (
    PipelineManager,
    PipelineStep,
    StepExecutionMetadata,
)


def _add(image, amount=10):
    return np.clip(image.astype(np.int32) + amount, 0, 255).astype(np.uint8)


def _mul(image, factor=2):
    return np.clip(image.astype(np.int32) * factor, 0, 255).astype(np.uint8)


@pytest.fixture()
def manager():
    return PipelineManager(
        [
            PipelineStep(name="add", function=_add, params={"amount": 10}),
            PipelineStep(name="mul", function=_mul, params={"factor": 2}),
        ]
    )


@pytest.fixture()
def image(rng):
    return rng.integers(0, 100, (16, 16), dtype=np.uint8)


def test_apply_order(manager, image):
    out = manager.apply(image)
    assert (out == _mul(_add(image))).all()


def test_move_and_swap(manager, image):
    manager.move_step(0, 1)
    assert [s.name for s in manager.steps] == ["mul", "add"]
    out = manager.apply(image)
    assert (out == _add(_mul(image))).all()
    manager.swap_steps(0, 1)
    assert [s.name for s in manager.steps] == ["add", "mul"]


def test_set_order(manager):
    manager.set_order(["mul", "add"])
    assert [s.name for s in manager.steps] == ["mul", "add"]
    with pytest.raises(KeyError):
        manager.set_order(["bogus"])


def test_toggle_and_params(manager, image):
    manager.set_step_enabled("mul", False)
    out = manager.apply(image)
    assert (out == _add(image)).all()
    manager.update_step_params("add", {"amount": 50})
    out = manager.apply(image)
    assert (out == _add(image, 50)).all()


def test_undo_redo(manager):
    manager.push_state()
    manager.remove_step(0)
    assert len(manager.steps) == 1
    state = manager.undo()
    assert state is not None
    assert len(manager.steps) == 2
    manager.redo()
    assert len(manager.steps) == 1
    assert manager.can_undo()


def test_serialization_roundtrip(manager):
    payload = manager.to_dict()
    assert payload["steps"][0]["name"] == "add"
    step = PipelineStep.from_dict(payload["steps"][0], function=_add)
    assert step.params == {"amount": 10}


def test_registry_step_serialization():
    step = PipelineStep(
        name="Global",
        stage=Stage.SEGMENTATION,
        params={"threshold": 99},
    )
    assert step.op_id == "segmentation.global_threshold"
    data = step.to_dict()
    restored = PipelineStep.from_dict(data)
    assert restored.op_id == "segmentation.global_threshold"
    assert restored.stage == Stage.SEGMENTATION


def test_change_listeners(manager):
    events = []
    manager.add_change_listener(lambda ev, meta: events.append(ev))
    manager.add_step(PipelineStep(name="x", function=_add))
    manager.remove_step(2)
    manager.toggle_step("add")
    manager.push_state()
    manager.undo()
    assert events == [
        "step_added",
        "step_removed",
        "step_state_changed",
        "pipeline_restored",
    ]


class _RecordingExecutor:
    def __init__(self):
        self.calls = []

    def execute(self, step, image):
        self.calls.append(step.name)
        return np.zeros_like(image)


def test_gpu_executor_dispatch(image):
    executor = _RecordingExecutor()
    manager = PipelineManager(
        [
            PipelineStep(
                name="accel",
                function=_add,
                execution=StepExecutionMetadata(requires_gpu=True),
            )
        ],
        gpu_executor=executor,
    )
    out = manager.apply(image)
    assert executor.calls == ["accel"]
    assert (out == 0).all()


def test_gpu_fallback_warns(image, caplog):
    manager = PipelineManager(
        [
            PipelineStep(
                name="accel",
                function=_add,
                execution=StepExecutionMetadata(requires_gpu=True),
            )
        ]
    )
    import logging

    with caplog.at_level(logging.WARNING):
        out = manager.apply(image)
    assert (out == _add(image)).all()
    assert any("falling back" in rec.message for rec in caplog.records)


def test_slice_wise_nd(image):
    stack = np.stack([image, image + 1, image + 2])
    manager = PipelineManager([PipelineStep(name="add", function=_add)])
    out = manager.apply(stack)
    assert out.shape == stack.shape
    for i in range(3):
        assert (out[i] == _add(stack[i])).all()


def test_extract_preview():
    stack = np.zeros((5, 8, 8), np.uint8)
    stack[2] = 7
    preview = PipelineManager.extract_preview(stack)
    assert (preview == 7).all()
    colour = np.zeros((8, 8, 3), np.uint8)
    assert PipelineManager.extract_preview(colour).shape == (8, 8, 3)


def test_template_and_reset(manager):
    manager.remove_step(0)
    manager.reset()
    assert [s.name for s in manager.steps] == ["add", "mul"]


def test_device_matches_host_for_registry_chain(rng):
    image = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    steps = [
        PipelineStep(name="Grayscale", stage=Stage.PREPROCESSING),
        PipelineStep(
            name="BrightnessContrast",
            stage=Stage.PREPROCESSING,
            params={"alpha": 1.4, "beta": 12.0},
        ),
        PipelineStep(
            name="Gamma", stage=Stage.PREPROCESSING, params={"value": 1.8}
        ),
    ]
    manager = PipelineManager(steps)
    device_out = manager.apply(image)
    host_out = manager.apply_host(image)
    assert (device_out == host_out).all()


def test_module_requires_gpu_propagates():
    """Module-declared capabilities flow into step execution metadata
    (models tests/test_processing_pipeline_manager_gpu.py:103-121)."""

    from yamimageprocessor_tpu.plugins.module_base import (
        ModuleBase,
        ModuleCapabilities,
        ModuleMetadata,
        ModuleStage,
    )

    class AcceleratedModule(ModuleBase):
        op_identifier = "preprocessing.gamma"

        def _build_metadata(self):
            return ModuleMetadata(
                identifier="Accel",
                title="Accelerated",
                stage=ModuleStage.PREPROCESSING,
            )

        def capabilities(self):
            return ModuleCapabilities(requires_gpu=True)

    step = AcceleratedModule().create_pipeline_step()
    assert step.execution.requires_gpu is True
    payload = step.to_dict()
    assert payload["execution"]["requires_gpu"] is True
