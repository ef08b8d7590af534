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


def test_default_config_persists_settings_and_recovery(tmp_path, monkeypatch):
    """Defaults must persist: bare AppConfiguration previously kept
    settings in memory and pointed recovery at a throwaway mkdtemp root,
    so selections/consents vanished and crash recovery never fired."""

    monkeypatch.setenv("YAM_SETTINGS_DIR", str(tmp_path))
    core = AppCore(AppConfiguration()).ensure_bootstrapped()
    try:
        core.settings.set("ui/startup/selected_stages", "segmentation")
        recovery_root = core.recovery.root
        assert str(tmp_path) in str(recovery_root)  # stable, not mkdtemp
    finally:
        core.shutdown()
    second = AppCore(AppConfiguration()).ensure_bootstrapped()
    try:
        assert second.settings.get("ui/startup/selected_stages") == "segmentation"
        assert second.recovery.root == recovery_root  # same place every run
    finally:
        second.shutdown()


def test_autosave_interval_config_is_applied(tmp_path):
    cfg = AppConfiguration(
        session_root=tmp_path / "s",
        settings_path=tmp_path / "settings.json",
        autosave_interval_seconds=5.0,
    )
    core = AppCore(cfg).ensure_bootstrapped()
    try:
        assert core.autosave.interval == 5.0
    finally:
        core.shutdown()


def test_update_notice_requires_newer_version(tmp_path, monkeypatch):
    """A poll reporting the installed (or an older) version must not raise
    a notice; and with no listener the controller must not pause (headless
    sessions would deadlock on a resume that never comes)."""

    import yamimageprocessor_tpu
    from yamimageprocessor_tpu.core import app_core as AC
    from yamimageprocessor_tpu.core.updates import UpdateMetadata

    cfg = AppConfiguration(
        session_root=tmp_path / "s",
        settings_path=tmp_path / "settings.json",
        update_endpoint="http://example.invalid/updates.json",
    )
    core = AppCore(cfg).ensure_bootstrapped()
    try:
        current = yamimageprocessor_tpu.__version__

        def fake_fetch(endpoint, timeout=10.0):
            return UpdateMetadata(version=current)

        monkeypatch.setattr(AC, "fetch_update_metadata", fake_fetch)
        assert core.check_for_updates() is None
        assert core.update_dispatcher.pending is None

        newer = UpdateMetadata(version="999.0.0")
        monkeypatch.setattr(
            AC, "fetch_update_metadata", lambda e, timeout=10.0: newer
        )
        # no listeners -> notice dispatched but tasks NOT paused
        result = core.check_for_updates()
        assert result is newer and core.update_dispatcher.pending is newer
        task = core.thread_controller.submit(lambda: 42, name="probe")
        assert task.future.result(timeout=5) == 42
    finally:
        core.shutdown()


def test_import_pipeline_json_normalizes_stage_order(tmp_path):
    import json as _json

    cfg = AppConfiguration(
        session_root=tmp_path / "s", settings_path=tmp_path / "settings.json"
    )
    core = AppCore(cfg).ensure_bootstrapped()
    try:
        payload = {
            "steps": [
                {"name": "Grayscale", "stage": "preprocessing"},
                {"name": "Otsu", "stage": "segmentation"},
                {"name": "Gamma", "stage": "preprocessing"},
            ]
        }
        src = tmp_path / "pipe.json"
        src.write_text(_json.dumps(payload))
        core.import_pipeline_json(src)
        stages = [s.stage for s in core.get_pipeline_manager().steps]
        assert stages == [Stage.PREPROCESSING, Stage.PREPROCESSING, Stage.SEGMENTATION]
        ranges = core.stage_ranges()
        start, end = ranges[Stage.SEGMENTATION]
        assert [s.name for s in core.get_pipeline_manager().steps[start:end]] == ["Otsu"]
    finally:
        core.shutdown()


def test_plugin_gate_blocks_import_side_effects(tmp_path, monkeypatch):
    """require_signatures must reject an unsigned plugin BEFORE importing
    it — import executes top-level code (r3 review)."""

    import sys

    pkg = tmp_path / "evilpkg"
    pkg.mkdir()
    marker = tmp_path / "executed.marker"
    (pkg / "__init__.py").write_text(
        f"import pathlib\npathlib.Path({str(marker)!r}).write_text('ran')\n"
        "def register_module(core):\n    pass\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    from yamimageprocessor_tpu.core.module_loader import ModuleLoader
    from yamimageprocessor_tpu.core.signing import ModuleSignatureVerifier

    import subprocess

    trust = tmp_path / "trust"
    trust.mkdir()
    priv = tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "genrsa", "-out", str(priv), "2048"],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["openssl", "rsa", "-in", str(priv), "-pubout", "-out", str(trust / "pub.pem")],
        check=True,
        capture_output=True,
    )
    loader = ModuleLoader(
        verifier=ModuleSignatureVerifier(trust_store=trust),
        require_signatures=True,
    )
    loaded = loader.discover_package("evilpkg", app_core=None)
    assert loaded == []
    assert not marker.exists()  # top-level code never ran
    sys.modules.pop("evilpkg", None)
