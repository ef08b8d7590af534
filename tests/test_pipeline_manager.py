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


def test_set_order_preserves_duplicate_names(image):
    """Duplicate step names are legal (reference order managers allow
    repeats); reordering must keep every instance (r3 review: a name->step
    dict silently dropped all but the last duplicate)."""

    mgr = PipelineManager(
        [
            PipelineStep(name="add", function=_add, params={"amount": 1}),
            PipelineStep(name="add", function=_add, params={"amount": 2}),
            PipelineStep(name="mul", function=_mul, params={"factor": 2}),
        ]
    )
    mgr.set_order(["mul", "add"])
    names = [s.name for s in mgr.steps]
    assert names == ["mul", "add", "add"]
    # FIFO: the first listed 'add' is the first original instance
    assert mgr.steps[1].params["amount"] == 1
    assert mgr.steps[2].params["amount"] == 2


def test_clone_preserves_isolate_failures(tmp_path, image):
    def boom(img):
        raise RuntimeError("kaboom")

    from yamimageprocessor_tpu.pipeline.errors import PipelineExecutionError

    mgr = PipelineManager(
        [PipelineStep(name="boom", function=boom)],
        recovery_root=tmp_path,
        isolate_failures=True,
    )
    dup = mgr.clone()
    with pytest.raises(PipelineExecutionError):
        dup.apply_host(image)


def test_step_op_id_round_trips_without_stage():
    step = PipelineStep(name="Gamma", op_id="preprocessing.gamma")
    restored = PipelineStep.from_dict(step.to_dict())
    assert restored.op_id == "preprocessing.gamma"
    out = restored.apply(np.full((8, 8), 128, np.uint8))
    assert out.shape == (8, 8)


def test_nd4_stack_batches_as_planes(rng):
    """A (T, Z, H, W) non-colour stack must reach device ops as 2-D planes
    — batching only axis 0 would hand (Z, H, W) items to ops that misread
    ndim==3 as BGR (r3 review)."""

    stack = rng.integers(0, 255, (2, 3, 16, 16), dtype=np.uint8)
    mgr = PipelineManager(
        [
            PipelineStep(
                name="Gamma Correction",
                op_id="preprocessing.gamma",
                stage=Stage.PREPROCESSING,
                params={"value": 2.0},
            ),
            # per-plane global stats: catches both the device misbatching
            # AND an apply_host that hands a (Z, H, W) item to the op
            PipelineStep(name="Otsu", stage=Stage.SEGMENTATION, params={}),
        ]
    )
    out = mgr.apply(stack)
    host = mgr.apply_host(stack)
    assert out.shape == host.shape == stack.shape
    assert (np.asarray(out) == np.asarray(host)).all()
    # every plane equals its independently-processed self
    solo = PipelineManager(
        [
            PipelineStep(
                name="Gamma Correction",
                op_id="preprocessing.gamma",
                stage=Stage.PREPROCESSING,
                params={"value": 2.0},
            ),
            PipelineStep(name="Otsu", stage=Stage.SEGMENTATION, params={}),
        ]
    )
    for t in range(2):
        for z in range(3):
            assert (np.asarray(solo.apply_host(stack[t, z])) == host[t, z]).all()


def test_batched_chain_with_host_segment_applies_per_item(rng):
    """batch mode + a host-only step: the host segment (and any deferred
    device segment after it) must run per item, not on the stacked array
    (r3 review: golden_fn read the batch axis as image height)."""

    frames = rng.integers(0, 255, (3, 24, 24), dtype=np.uint8)

    def host_rot(img):
        # per-image host op whose output depends on the image layout: a
        # batched misapplication (rot of the stacked array) cannot match
        return np.rot90(img, 2).copy()

    steps = [
        PipelineStep(
            name="Gamma Correction",
            op_id="preprocessing.gamma",
            stage=Stage.PREPROCESSING,
            params={"value": 1.8},
        ),
        PipelineStep(name="host_rot", function=host_rot),
        PipelineStep(
            name="Opening",
            op_id="segmentation.opening",
            stage=Stage.SEGMENTATION,
            params={"kernel_size": 3, "iterations": 1},
        ),
    ]
    from yamimageprocessor_tpu.pipeline.compiler import CompiledChain

    chain = CompiledChain(steps, frames.shape, frames.dtype, batch=3)
    assert any(p.kind == "host" for p in chain.plans)
    outs = chain.run(frames, steps)
    final = np.asarray(outs[-1])
    for i in range(3):
        single = CompiledChain(steps, frames[i].shape, frames.dtype)
        assert (np.asarray(single.run(frames[i], steps)[-1]) == final[i]).all()


def test_reshaping_chain_derives_dyn_from_evolved_shape(rng, caplog):
    """crop (reshapes) followed by a shape-aware op (FCM sizes its
    membership init from the pixel count): dynamic params must come from
    the EVOLVED shape, or the compiled chain silently retraces/falls back
    on every call (r3 review: _dyn_for used the chain input shape)."""

    import logging

    frame = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    steps = [
        PipelineStep(
            name="Crop",
            op_id="preprocessing.crop",
            stage=Stage.PREPROCESSING,
            params={"x_offset": 4, "y_offset": 2, "width": 16, "height": 24},
        ),
        PipelineStep(
            name="FuzzyCMeans",
            op_id="segmentation.fuzzy_cmeans",
            stage=Stage.SEGMENTATION,
            params={"K": 2, "seed": 42},
        ),
    ]
    mgr = PipelineManager(steps)
    with caplog.at_level(logging.ERROR):
        out = mgr.apply(frame)
    assert "falling back" not in caplog.text
    host = mgr.apply_host(frame)
    assert np.asarray(out).shape == np.asarray(host).shape
    agree = (np.asarray(out) == np.asarray(host)).mean()
    assert agree > 0.99  # f32 vs f64 cluster boundaries only
