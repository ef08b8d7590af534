"""AppCore lifecycle, module catalog, update pause, telemetry gate."""
from __future__ import annotations

import json
import threading
from pathlib import Path

import numpy as np
import pytest

from yamimageprocessor_tpu.core.app_core import AppConfiguration, AppCore
from yamimageprocessor_tpu.core.updates import UpdateMetadata
from yamimageprocessor_tpu.ops.schema import Stage


@pytest.fixture()
def core(tmp_path):
    cfg = AppConfiguration(
        allowed_roots=(tmp_path,),
        session_root=tmp_path / "session",
        settings_path=tmp_path / "settings.json",
    )
    core = AppCore(cfg)
    core.bootstrap()
    yield core
    core.shutdown()


def test_bootstrap_services(core, tmp_path):
    assert core.settings is not None
    assert core.io_manager is not None
    assert core.thread_controller is not None
    assert core.autosave is not None
    assert core.recovery is not None
    assert core.pipeline_cache is not None
    assert (tmp_path / "session" / "pipeline_cache").is_dir()
    assert (tmp_path / "session" / "recovery").is_dir()


def test_builtin_modules_discovered(core):
    identifiers = {m.metadata.identifier for m in core.modules(Stage.PREPROCESSING)}
    assert identifiers == {
        "Grayscale",
        "BrightnessContrast",
        "Gamma",
        "IntensityNormalization",
        "NoiseReduction",
        "Sharpen",
        "SelectChannel",
        "Crop",
    }


def test_unified_manager_and_stage_ranges(core):
    manager = core.get_pipeline_manager()
    assert len(manager.steps) == 8
    ranges = core.stage_ranges()
    assert ranges[Stage.PREPROCESSING] == (0, 8)
    assert ranges[Stage.SEGMENTATION] == (8, 8)


def test_module_enable_flags(core):
    assert core.is_module_enabled("Grayscale") is False  # default_enabled=False
    core.set_module_enabled("Grayscale", True)
    assert core.is_module_enabled("Grayscale") is True
    enabled = [m.metadata.identifier for m in core.iter_enabled_modules()]
    assert enabled == ["Grayscale"]


def test_pipeline_json_roundtrip(core, tmp_path):
    target = tmp_path / "pipeline.json"
    manager = core.get_pipeline_manager()
    manager.update_step_params("Gamma", {"value": 2.5})
    core.export_pipeline_json(target)
    payload = json.loads(target.read_text())
    gamma = next(s for s in payload["steps"] if s["name"] == "Gamma")
    assert gamma["params"]["value"] == 2.5

    manager.update_step_params("Gamma", {"value": 1.0})
    core.import_pipeline_json(target)
    assert core.get_pipeline_manager().get_step("Gamma").params["value"] == 2.5


def test_update_notice_pauses_executor(core):
    metadata = UpdateMetadata.from_payload(
        {"version": "9.9", "changelog": "big", "url": "http://x"}
    )
    assert metadata is not None and metadata.version == "9.9"
    seen = []
    core.update_dispatcher.add_listener(seen.append)
    core._handle_update_available(metadata)
    assert core.thread_controller.paused
    assert seen == [metadata]
    core.acknowledge_update()
    assert not core.thread_controller.paused
    assert core.update_dispatcher.pending is None


def test_update_payload_tolerance():
    assert UpdateMetadata.from_payload(None) is None
    assert UpdateMetadata.from_payload({}) is None
    m = UpdateMetadata.from_payload({"latest_version": "2", "notes": "n"})
    assert m.version == "2" and m.changelog == "n"


def test_telemetry_requires_diagnostics(core, caplog):
    import logging

    core.configure_telemetry(True)
    assert core.telemetry.opted_in
    core.settings.set("diagnostics/enabled", False)
    assert not core.telemetry.active
    with caplog.at_level(logging.INFO, logger="yam.telemetry"):
        core.telemetry.record("event", a=1)
    assert not caplog.records

    core.settings.set("diagnostics/enabled", True)
    assert core.telemetry.active
    with caplog.at_level(logging.INFO, logger="yam.telemetry"):
        core.telemetry.record("event", a=1)
    assert len(caplog.records) == 1


def test_recovery_summary_on_crash(tmp_path):
    session = tmp_path / "s1"
    cfg = AppConfiguration(allowed_roots=(tmp_path,), session_root=session)
    first = AppCore(cfg)
    first.bootstrap()
    # simulate crash: do NOT shut down; markers remain
    assert any((session / "recovery" / "crash_markers").glob("*.json"))

    second = AppCore(
        AppConfiguration(allowed_roots=(tmp_path,), session_root=session)
    )
    second.bootstrap()
    assert second.recovery_summary.crash_detected
    second.shutdown()
    first.thread_controller.shutdown()
