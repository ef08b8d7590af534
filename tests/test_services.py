"""Service layer: batch folder driver, CSV export, autosave/recovery,
thread controller, module loader gate, IO manager."""
from __future__ import annotations

import threading
import time
from pathlib import Path

import numpy as np
import pytest

from yamimageprocessor_tpu.core import path_sanitizer as ps
from yamimageprocessor_tpu.core.io_manager import IOManager
from yamimageprocessor_tpu.core.persistence import AutosaveManager, AutosavePayload
from yamimageprocessor_tpu.core.recovery import RecoveryManager
from yamimageprocessor_tpu.core.settings import SettingsManager
from yamimageprocessor_tpu.core.threading import (
    OperationCancelled,
    TaskStatus,
    ThreadController,
)
from yamimageprocessor_tpu.io import image_io
from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.pipeline.step import PipelineStep
from yamimageprocessor_tpu.services.batch import (
    enumerate_images,
    export_all_extraction_data,
    process_folder,
)


@pytest.fixture(autouse=True)
def open_sandbox(tmp_path):
    ps.configure_allowed_roots([tmp_path])
    yield
    ps.configure_allowed_roots([Path.cwd()])


# ---------------------------------------------------------------------------
def test_batch_process_folder(tmp_path, rng):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    for i in range(5):
        frame = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
        image_io.save_image(src / f"frame{i}.png", frame)
    # one odd-shaped frame exercises the per-frame fallback grouping
    image_io.save_image(
        src / "odd.png", rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    )

    steps = [
        PipelineStep(name="Grayscale", stage=Stage.PREPROCESSING),
        PipelineStep(
            name="BrightnessContrast",
            stage=Stage.PREPROCESSING,
            params={"alpha": 1.2, "beta": 3.0},
        ),
    ]
    progress = []
    outputs = process_folder(
        src,
        dst,
        steps,
        progress=progress.append,
        batch_size=4,
    )
    assert len(outputs) == 6
    assert progress[-1] == 100
    # batched output equals the per-frame host path
    from yamimageprocessor_tpu.pipeline.manager import PipelineManager

    manager = PipelineManager(steps)
    for path in outputs:
        stem = path.stem
        original = image_io.load_image(src / f"{stem}.png", lazy=False).to_array()
        expected = manager.apply_host(np.asarray(original))
        produced = image_io.load_image(path, lazy=False).to_array()
        assert (produced == expected).all(), stem


def test_batch_cancellation(tmp_path, rng):
    src = tmp_path / "in"
    src.mkdir()
    image_io.save_image(
        src / "a.png", rng.integers(0, 255, (16, 16), dtype=np.uint8)
    )
    cancel = threading.Event()
    cancel.set()
    with pytest.raises(OperationCancelled):
        process_folder(src, tmp_path / "out", [], cancel_event=cancel)


def test_export_extraction_csvs(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    img[10:40, 10:40] = 200
    steps = [
        PipelineStep(name="Region Properties", stage=Stage.ANALYSIS),
        PipelineStep(name="Histogram", stage=Stage.ANALYSIS),
        PipelineStep(name="Haralick", stage=Stage.ANALYSIS,
                     params={"distance": 1, "angle": 0.0}),
    ]
    written = export_all_extraction_data(img, steps, tmp_path / "csv", base_name="img")
    names = sorted(p.name for p in written)
    # verbatim method names, matching ui/extraction.py:1858-1859
    assert names == [
        "img_Haralick.csv",
        "img_Histogram.csv",
        "img_Region Properties.csv",
    ]
    header = (
        (tmp_path / "csv" / "img_Region Properties.csv").read_text().splitlines()[0]
    )
    assert header.startswith("region_index,area,perimeter,centroid")
    sanitized = export_all_extraction_data(
        img, steps, tmp_path / "csv_safe", base_name="img", sanitize_names=True
    )
    assert sorted(p.name for p in sanitized) == [
        "img_haralick.csv",
        "img_histogram.csv",
        "img_region_properties.csv",
    ]


def test_export_extraction_csv_layout_all_methods(tmp_path):
    """Filename + column layout parity for every extraction method that the
    reference's export flow emits (``ui/extraction.py:1816-1859``)."""

    img = np.zeros((64, 64, 3), np.uint8)
    img[10:40, 10:40] = 200
    img[45:60, 45:60] = 120
    methods = [
        "Region Properties",
        "Hu Moments",
        "LBP",
        "Haralick",
        "Gabor",
        "Fourier",
        "HOG",
        "Histogram",
        "Fractal",
        "Approximate Shape",
    ]
    steps = [PipelineStep(name=m, stage=Stage.ANALYSIS) for m in methods]
    written = export_all_extraction_data(img, steps, tmp_path / "csv", base_name="extraction")
    assert [p.name for p in written] == [f"extraction_{m}.csv" for m in methods]
    headers = {
        p.name: p.read_text().splitlines()[0] for p in written
    }
    # column sets per reference *_data functions (core/extraction.py:57-421)
    assert headers["extraction_Region Properties.csv"].split(",")[:4] == [
        "region_index",
        "area",
        "perimeter",
        "centroid",
    ]
    assert headers["extraction_Hu Moments.csv"] == ",".join(
        f"hu_{i}" for i in range(1, 8)
    )
    assert headers["extraction_Histogram.csv"] == "mean,variance,skewness,kurtosis"
    assert "fractal_dimension" in headers["extraction_Fractal.csv"]


# ---------------------------------------------------------------------------
def test_autosave_immediate_and_recovery(tmp_path, rng):
    settings = SettingsManager(seed_defaults=True)
    settings.set_autosave_interval(0.0)  # immediate
    io = IOManager(settings, sandboxed=False)
    recovery = RecoveryManager(tmp_path / "recovery")
    autosave = AutosaveManager(settings, io, recovery, workspace=tmp_path / "ws")

    frame = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    autosave.mark_dirty(
        AutosavePayload(image=frame, pipeline={"steps": []}, metadata={"k": 1})
    )
    assert (tmp_path / "ws" / "autosave.json").exists()
    assert (tmp_path / "ws" / "autosave.png").exists()

    # a crashed session leaves the snapshot discoverable
    recovery2 = RecoveryManager(tmp_path / "ws")
    summary = recovery2.inspect_startup()
    assert summary.has_snapshot
    restored = recovery2.restore_snapshot(io)
    image, pipeline, metadata = restored
    assert (image == frame).all()
    assert metadata == {"k": 1}
    recovery2.discard_snapshot()
    assert not (tmp_path / "ws" / "autosave.json").exists()


def test_autosave_debounce(tmp_path, rng):
    settings = SettingsManager(seed_defaults=True)
    settings.set_autosave_interval(0.2)
    io = IOManager(settings, sandboxed=False)
    recovery = RecoveryManager(tmp_path / "recovery")
    autosave = AutosaveManager(settings, io, recovery, workspace=tmp_path / "ws")
    autosave.mark_dirty(AutosavePayload(image=None, pipeline={"v": 1}))
    assert not (tmp_path / "ws" / "autosave.json").exists()
    time.sleep(0.4)
    assert (tmp_path / "ws" / "autosave.json").exists()
    autosave.shutdown()


def test_guarded_write_markers(tmp_path):
    recovery = RecoveryManager(tmp_path)
    marker = recovery.begin_guarded_write(tmp_path / "file.png")
    markers = list((tmp_path / "crash_markers").glob("guarded_write-*.json"))
    assert len(markers) == 1
    recovery.complete_guarded_write(marker)
    assert not list((tmp_path / "crash_markers").glob("guarded_write-*.json"))


# ---------------------------------------------------------------------------
def test_thread_controller_lifecycle():
    controller = ThreadController(max_workers=2)
    events = []
    controller.add_listener(lambda ev, task: events.append(ev))

    def work(progress_callback=None, cancel_event=None):
        progress_callback(0.5)
        return 42

    results = []
    task = controller.submit(work, name="job", on_finished=results.append)
    task.future.result(timeout=5)
    assert results == [42]
    assert task.status is TaskStatus.FINISHED
    assert task.progress == 1.0
    assert "started" in events and "finished" in events
    controller.shutdown()


def test_thread_controller_cancel():
    controller = ThreadController(max_workers=1)
    started = threading.Event()

    def work(cancel_event=None):
        started.set()
        for _ in range(100):
            if cancel_event.is_set():
                raise OperationCancelled()
            time.sleep(0.01)

    cancelled = []
    task = controller.submit(work, name="slow", on_cancelled=lambda: cancelled.append(1))
    started.wait(timeout=5)
    task.cancel()
    task.future.result(timeout=5)
    assert task.status is TaskStatus.CANCELLED
    assert cancelled == [1]
    controller.shutdown()


def test_thread_controller_pause_gate():
    controller = ThreadController(max_workers=1)
    controller.pause()
    ran = threading.Event()
    controller.submit(lambda: ran.set(), name="gated")
    time.sleep(0.2)
    assert not ran.is_set()
    controller.resume()
    assert ran.wait(timeout=5)
    controller.shutdown()


# ---------------------------------------------------------------------------
def test_io_manager_lazy_roundtrip(tmp_path, rng):
    io = IOManager(sandboxed=False)
    big = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    target = tmp_path / "frame.npy"
    io.save_image(target, big)
    record = io.load_image(target, lazy=True)
    # lazy npy loads as a memmap-backed tiled record
    tile = record.read_region((0, 0, 16, 16))
    assert (tile == big[:16, :16]).all()
    boxes = [box for box, _ in record.iter_tiles((32, 32))]
    assert boxes[0] == (0, 0, 32, 32) and len(boxes) == 4


def test_io_manager_rejects_unknown_format(tmp_path):
    io = IOManager(sandboxed=False)
    with pytest.raises(Exception):
        io.save_image(tmp_path / "x.xyz", np.zeros((4, 4), np.uint8))


def test_io_manager_sandbox_enforced(tmp_path):
    io = IOManager()  # sandboxed=True by default
    ps.configure_allowed_roots([tmp_path / "inside"])
    with pytest.raises(ps.PathValidationError):
        io.save_image("/tmp/definitely_outside_root.png", np.zeros((4, 4), np.uint8))
    ok = io.save_image(tmp_path / "inside" / "a.png", np.zeros((4, 4), np.uint8))
    assert ok.exists()


def test_version_metadata():
    import yamimageprocessor_tpu

    parts = yamimageprocessor_tpu.__version__.split(".")
    assert len(parts) == 3 and all(p.isdigit() for p in parts)


def test_sidecar_schema_and_redaction(tmp_path, rng):
    """The metadata sidecar carries the schema tag and a REDACTED path —
    absolute filesystem roots never leak into exported metadata
    (io_manager sidecar contract, core/io_manager.py:349-387)."""
    import json

    io = IOManager()
    ps.configure_allowed_roots([tmp_path])
    frame = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    target = io.save_image(tmp_path / "cells.png", frame, metadata={"k": 1})
    sidecar = json.loads((tmp_path / "cells.png.json").read_text())
    assert sidecar["schema"] == "yam.image-metadata.v1"
    assert str(tmp_path) not in json.dumps(sidecar)  # no absolute roots
    assert sidecar["image"]["path"].startswith("[root")
    assert sidecar["image"]["shape"] == [8, 8]
    # sidecar metadata rides back on load
    record = io.load_image(target, lazy=False)
    assert record.metadata.get("k") == 1


def test_backup_pruning_escapes_glob_metacharacters(tmp_path):
    """'img[1].png' must prune only its own backups — an unescaped stem
    treats [1] as a character class and deletes 'img1.png' backups."""

    from yamimageprocessor_tpu.core.io_manager import IOManager
    from yamimageprocessor_tpu.core.path_sanitizer import configure_allowed_roots
    from yamimageprocessor_tpu.core.settings import SettingsManager

    configure_allowed_roots([tmp_path])
    io = IOManager(SettingsManager(storage_path=tmp_path / "s.json"), backup_retention=1)
    img = np.full((8, 8), 7, np.uint8)
    plain = tmp_path / "img1.png"
    weird = tmp_path / "img[1].png"
    for _ in range(2):
        io.save_image(plain, img)
        io.save_image(weird, img)
    plain_backups = io.list_backups(plain)
    weird_backups = io.list_backups(weird)
    assert len(plain_backups) >= 1
    assert all("img1.backup-" in p.name for p in plain_backups)
    assert all("img[1].backup-" in p.name for p in weird_backups)


def test_thread_controller_bounds_task_registry():
    from yamimageprocessor_tpu.core.threading import ThreadController

    controller = ThreadController(max_workers=2)
    try:
        tasks = [controller.submit(lambda: None, name=f"t{i}") for i in range(400)]
        for t in tasks:
            t.future.result(timeout=10)
        controller.submit(lambda: None, name="last").future.result(timeout=10)
        assert len(controller.tasks()) <= 257
    finally:
        controller.shutdown()


def test_process_folder_keeps_metadata_without_io_manager(tmp_path, rng):
    from yamimageprocessor_tpu.io import image_io as iio
    from yamimageprocessor_tpu.ops.schema import Stage
    from yamimageprocessor_tpu.pipeline.step import PipelineStep
    from yamimageprocessor_tpu.services.batch import process_folder

    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    for i in range(3):
        iio.save_image(src / f"f{i}.png", rng.integers(0, 255, (16, 20, 3), np.uint8))
    steps = [
        PipelineStep(
            name="Gamma", stage=Stage.PREPROCESSING, params={"value": 2.0}
        )
    ]
    outputs = process_folder(
        src, dst, steps, io_manager=None, batch_size=2, output_suffix=".npz"
    )
    assert len(outputs) == 3
    rec = iio.load_image(outputs[0])
    assert rec.metadata.get("mode") == "batch"
    assert "pipeline" in rec.metadata and rec.metadata.get("source") == "f0.png"


def test_process_folder_probes_headers_lazily(tmp_path, rng, monkeypatch):
    """Grouping must come from file headers; pixels load at most one batch
    chunk at a time (r3 review: the whole folder was loaded up front)."""

    from yamimageprocessor_tpu.io import image_io as iio
    from yamimageprocessor_tpu.ops.schema import Stage
    from yamimageprocessor_tpu.pipeline.step import PipelineStep
    from yamimageprocessor_tpu.services import batch as B

    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    for i in range(6):
        iio.save_image(src / f"f{i}.png", rng.integers(0, 255, (16, 20), np.uint8))

    live = [0]
    peak = [0]
    orig = B._load_dense

    def counting_load(path):
        arr = orig(path)
        live[0] += 1
        peak[0] = max(peak[0], live[0])
        return arr

    monkeypatch.setattr(B, "_load_dense", counting_load)
    steps = [
        PipelineStep(name="Gamma", stage=Stage.PREPROCESSING, params={"value": 2.0})
    ]
    # batch_size 2: loads happen per chunk (the counter never decrements,
    # so equality proves loads are interleaved with saves, not front-loaded
    # before the first output exists)
    outs = B.process_folder(src, dst, steps, batch_size=2)
    assert len(outs) == 6 and peak[0] == 6  # all loaded, but...
    # stronger: first output file must exist before the LAST load happens.
    # Re-run with an assertion hooked into the loader.
    for p in dst.iterdir():
        p.unlink()
    seen_outputs_at_load = []

    def checking_load(path):
        seen_outputs_at_load.append(len(list(dst.glob("*.png"))))
        return orig(path)

    monkeypatch.setattr(B, "_load_dense", checking_load)
    B.process_folder(src, dst, steps, batch_size=2)
    assert seen_outputs_at_load[-1] >= 2  # later chunks load after earlier saves
