"""Headless pane behaviors: progressive preview, cancellation restoring the
baseline, undo/redo via cache signatures, mass processing (models the
reference's pytest-qt pane suites, SURVEY §4)."""
from __future__ import annotations

import contextlib
import threading
import time
from concurrent.futures import CancelledError
from pathlib import Path

import numpy as np
import pytest

from yamimageprocessor_tpu.core.app_core import AppConfiguration, AppCore
from yamimageprocessor_tpu.io import image_io
from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.ui.controller import UnifiedPipelineController
from yamimageprocessor_tpu.ui.panes import (
    ExtractionPane,
    PreprocessingPane,
    SegmentationPane,
)


@pytest.fixture()
def core(tmp_path):
    cfg = AppConfiguration(
        allowed_roots=(tmp_path,),
        session_root=tmp_path / "session",
        settings_path=tmp_path / "settings.json",
        max_workers=1,
    )
    core = AppCore(cfg)
    core.bootstrap()
    core.settings.set_autosave_interval(0.0)
    yield core
    core.shutdown()


@pytest.fixture()
def controller(core):
    return UnifiedPipelineController(core)


@pytest.fixture()
def pane(core, controller):
    pane = PreprocessingPane(core, controller)
    core.set_module_enabled("BrightnessContrast", True)
    core.get_pipeline_manager().update_step_params(
        "BrightnessContrast", {"alpha": 1.5, "beta": 0.0}
    )
    controller.recompute_pipeline()
    return pane


@pytest.fixture()
def frame(tmp_path, rng):
    img = rng.integers(0, 200, (64, 96, 3), dtype=np.uint8)
    path = tmp_path / "frame.png"
    image_io.save_image(path, img)
    return path, img


def _wait(task, timeout=30):
    assert task is not None
    task.future.result(timeout=timeout)


def test_load_and_preview(pane, frame):
    path, img = frame
    previews = []
    pane.on_preview = previews.append
    pane.load_image(path)
    assert pane.source_id is not None
    assert (pane.original == img).all()
    assert pane.preview_record is not None

    task = pane.update_preview()
    _wait(task)
    expected = pane._steps()[
        [s.name for s in pane._steps()].index("BrightnessContrast")
    ].impl.golden_fn(img, alpha=1.5, beta=0.0)
    assert (pane.current_preview == expected).all()

    # second call: cache-hit short circuit, no task
    previews.clear()
    assert pane.update_preview() is None
    assert previews and (previews[-1] == expected).all()


def test_commit_undo_redo(pane, frame):
    path, img = frame
    pane.load_image(path)
    _wait(pane.update_preview())
    pane.commit_current()
    first_commit = pane.committed.copy()
    first_sig = pane.committed_signature

    # change parameters, recompute, commit again
    pane.controller.manager.update_step_params(
        "BrightnessContrast", {"alpha": 2.0}
    )
    _wait(pane.update_preview())
    pane.commit_current()
    assert not (pane.committed == first_commit).all()

    assert pane.undo()
    assert pane.committed_signature == first_sig
    assert (pane.committed == first_commit).all()
    assert pane.redo()
    assert pane.committed_signature != first_sig


def test_progressive_tiled_preview(pane, core, tmp_path, rng):
    big = rng.integers(0, 255, (96, 128), dtype=np.uint8)
    path = tmp_path / "big.npy"
    image_io.save_image(path, big)
    pane.load_image(path, lazy=True)
    assert pane.original is None  # streaming, never materialized eagerly

    tiles = []
    pane.on_tile = tiles.append
    task = pane.update_preview()
    _wait(task)
    time.sleep(0.1)
    assert tiles, "expected incremental tile updates"
    boxes = [t.box for t in tiles]
    assert boxes == sorted(boxes, key=lambda b: (b[1], b[0]))  # row-major
    reassembled = np.zeros(tiles[0].shape, tiles[0].tile.dtype)
    for t in tiles:
        left, top, right, bottom = t.box
        reassembled[top:bottom, left:right] = t.tile
    assert (reassembled == pane.current_preview).all()


def test_cancellation_restores_baseline(pane, core, frame):
    path, img = frame
    pane.load_image(path)
    baseline = pane.committed.copy()
    previews = []
    pane.on_preview = previews.append

    # hold the pool hostage so cancel lands before compute starts
    core.thread_controller.pause()
    task = pane.update_preview()
    task.cancel()
    core.thread_controller.resume()
    task.future.result(timeout=10)
    assert task.status.value == "cancelled"
    assert previews and (previews[-1] == baseline).all()


def test_cancel_after_commit_restores_committed(pane, core, frame):
    """A cancelled preview restores the most recent COMMITTED frame, not the
    load-time original (tests/test_preprocessing_progressive.py:119-146
    restores the previous preview state)."""
    path, img = frame
    pane.load_image(path)
    _wait(pane.update_preview())
    pane.commit_current()
    committed = pane.committed.copy()
    assert not (committed == img).all()  # alpha=1.5 actually changed pixels

    pane.controller.manager.update_step_params("BrightnessContrast", {"alpha": 2.5})
    previews = []
    pane.on_preview = previews.append
    core.thread_controller.pause()
    task = pane.update_preview()
    task.cancel()
    core.thread_controller.resume()
    with contextlib.suppress(CancelledError):
        task.future.result(timeout=10)
    assert task.status.value == "cancelled"
    assert previews and (previews[-1] == committed).all()


def test_mid_stream_cancel_drops_stale_tiles(pane, core, tmp_path, rng):
    """Cancelling while tiles are streaming: no tile pasted after the restore
    (tests/test_preprocessing_progressive.py:119-146 clears progressive
    state; our generation bump makes in-flight tiles stale)."""
    big = rng.integers(0, 255, (96, 128), dtype=np.uint8)
    path = tmp_path / "big.npy"
    image_io.save_image(path, big)
    pane.load_image(path, lazy=True)

    events = []
    pane.on_tile = lambda update: events.append(("tile", update.box))
    pane.on_preview = lambda image: events.append(("preview", None))

    task = pane.update_preview()
    # fire the cancel as soon as the first tile lands
    seen = threading.Event()
    original_on_tile = pane.on_tile

    def cancel_on_first(update):
        original_on_tile(update)
        if not seen.is_set():
            seen.set()
            task.cancel()

    pane.on_tile = cancel_on_first
    task.future.result(timeout=30)
    time.sleep(0.05)
    if seen.is_set() and task.status.value == "cancelled":
        tile_events = [e for e in events if e[0] == "tile"]
        assert tile_events, "expected at least one streamed tile"
        # the restore is the final preview emission
        assert events[-1][0] == "preview"
    # else: run finished before the first tile was observed — nothing to check


def test_dense_preview_does_not_stream(pane, frame):
    """Small dense frames run as one fused device call with zero incremental
    tiles (tests/test_preprocessing_progressive.py:149-162)."""
    path, _ = frame
    tiles = []
    pane.on_tile = tiles.append
    pane.load_image(path)
    _wait(pane.update_preview())
    assert tiles == []


def test_mass_preprocess(pane, core, tmp_path, rng):
    src = tmp_path / "batch_in"
    src.mkdir()
    for i in range(3):
        image_io.save_image(
            src / f"f{i}.png", rng.integers(0, 200, (32, 32), dtype=np.uint8)
        )
    outputs = pane.mass_preprocess(src, tmp_path / "batch_out")
    assert len(outputs) == 3
    assert all(p.exists() for p in outputs)


def test_pipeline_json_roundtrip(pane, tmp_path, frame):
    target = tmp_path / "pipe.json"
    pane.controller.manager.update_step_params("BrightnessContrast", {"alpha": 1.9})
    pane.export_pipeline_json(target)
    pane.controller.manager.update_step_params("BrightnessContrast", {"alpha": 1.0})
    pane.import_pipeline_json(target)
    step = next(s for s in pane._steps() if s.name == "BrightnessContrast")
    assert step.params["alpha"] == 1.9


def test_segmentation_pane_order(core, controller, tmp_path, rng):
    pane = SegmentationPane(core, controller)
    pane.set_order(["Otsu", "Opening", "Otsu"])  # duplicates allowed
    names = [s.name for s in controller.stage_steps(Stage.SEGMENTATION)]
    assert names == ["Otsu", "Opening", "Otsu"]
    pane.remove_method(2)
    assert [s.name for s in controller.stage_steps(Stage.SEGMENTATION)] == [
        "Otsu",
        "Opening",
    ]

    img = rng.integers(0, 255, (48, 48), dtype=np.uint8)
    src = tmp_path / "in.png"
    image_io.save_image(src, img)
    out = pane.process_segmentation_file(src, tmp_path / "seg.png")
    produced = image_io.load_image(out, lazy=False).to_array()
    assert set(np.unique(produced)).issubset({0, 255})


def test_extraction_pane(core, controller, tmp_path):
    pane = ExtractionPane(core, controller)
    pane.set_order(["Histogram", "Region Properties"])
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 210
    written = pane.export_all_extraction_data(img, tmp_path / "csv", base_name="x")
    assert sorted(p.name for p in written) == [
        "x_Histogram.csv",
        "x_Region Properties.csv",
    ]
    count = pane.export_segmented_regions(img, tmp_path / "img.png")
    assert count == 1
    assert (tmp_path / "img_regions").is_dir()


def test_upstream_resolution(core, controller, rng):
    seg = SegmentationPane(core, controller)
    img = rng.integers(0, 255, (32, 32), dtype=np.uint8)
    controller.run_enabled_stages(img)
    upstream = seg.resolve_upstream_image()
    assert upstream is not None


def test_mass_export_data(core, controller, tmp_path, rng):
    from yamimageprocessor_tpu.io import image_io

    pane = ExtractionPane(core, controller)
    pane.set_order(["Histogram"])
    src = tmp_path / "exp_in"
    src.mkdir()
    for i in range(2):
        img = rng.integers(0, 200, (32, 32), dtype=np.uint8)
        image_io.save_image(src / f"s{i}.png", img)
    written = pane.mass_export_data(src, tmp_path / "exp_out")
    assert set(written) == {"s0.png", "s1.png"}
    assert (tmp_path / "exp_out" / "s0_Histogram.csv").exists()


def test_preview_before_load_returns_none(pane):
    assert pane.update_preview() is None  # r3 review: raised AttributeError


def test_lazy_raster_load_builds_preview(core, controller, tmp_path, rng):
    """PIL-raster-backed lazy records expose only .size until first read;
    the preview pyramid must still build (r3 review: TypeError on None
    shape killed the gigapixel raster path)."""

    from yamimageprocessor_tpu.io import image_io

    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    path = tmp_path / "big.png"
    image_io.save_image(path, img)
    pane = PreprocessingPane(core, controller)
    pane.load_image(path, lazy=True)
    assert pane._lazy_record is not None
    assert pane.preview_record is not None
    level = pane.preview_record.levels[-1]
    thumb = np.asarray(level.image)
    assert thumb.ndim == 3 and thumb.shape[2] == 3


def test_stale_preview_cannot_overwrite_newer(pane, tmp_path, rng):
    """An older in-flight preview is cancelled/ignored once a newer one
    starts (r3 review: no generation guard in finished/cancelled)."""

    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    from yamimageprocessor_tpu.io import image_io

    image_io.save_image(tmp_path / "img.png", img)
    pane.load_image(tmp_path / "img.png")
    t1 = pane.update_preview(params_override={"BrightnessContrast": {"beta": 10.0}})
    t2 = pane.update_preview(params_override={"BrightnessContrast": {"beta": 90.0}})
    for t in (t1, t2):
        if t is not None:
            try:
                t.future.result(timeout=30)
            except Exception:
                pass
    final = pane.current_preview.copy()
    t3 = pane.update_preview(params_override={"BrightnessContrast": {"beta": 90.0}})
    if t3 is not None:
        t3.future.result(timeout=30)
    assert np.array_equal(pane.current_preview, final)


def test_commit_signs_override_previews(pane, tmp_path, rng):
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    from yamimageprocessor_tpu.io import image_io

    image_io.save_image(tmp_path / "img.png", img)
    pane.load_image(tmp_path / "img.png")
    t = pane.update_preview()
    t and t.future.result(timeout=30)
    pane.commit_current()
    t = pane.update_preview(params_override={"BrightnessContrast": {"beta": 77.0}})
    t and t.future.result(timeout=30)
    pane.commit_current()
    committed = pane.committed.copy()
    assert pane.undo()
    assert pane.redo()
    # redo must restore the OVERRIDDEN pixels the user committed
    assert np.array_equal(pane.committed, committed)


def test_ordered_pane_preview_keeps_controller_edits(core, controller, tmp_path, rng):
    """'run' on a segmentation pane must not wipe controller-only edits by
    rebuilding from settings (r3 review: the inline editor was
    non-functional on ordered panes)."""

    core.settings.set("segmentation/order", "Global")
    pane = SegmentationPane(core, controller)
    pane.rebuild_from_settings()
    controller.update_stage_step(Stage.SEGMENTATION, 0, params={"threshold": 77})
    seen = {}
    pane.on_preview = lambda img: seen.__setitem__("img", np.asarray(img))
    upstream = rng.integers(0, 255, (24, 24), dtype=np.uint8)
    controller._set_stage_result(Stage.PREPROCESSING, upstream)
    pane.update_preview()
    step = controller.stage_steps(Stage.SEGMENTATION)[0]
    assert step.params["threshold"] == 77  # edit survived
    expected = (upstream > 77).astype(np.uint8) * 255
    assert np.array_equal(seen["img"], expected)
