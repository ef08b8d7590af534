"""Settings store tests (parity with reference tests/test_settings_manager.py)."""
from __future__ import annotations

import ast
import json
from pathlib import Path

import pytest

from yamimageprocessor_tpu.core.settings import DEFAULT_SETTINGS, SettingsManager

REFERENCE_SETTINGS = Path("/root/reference/core/settings.py")


def _reference_defaults() -> dict:
    """Extract the reference DEFAULT_SETTINGS literal for a parity check."""

    tree = ast.parse(REFERENCE_SETTINGS.read_text(encoding="utf-8"))
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) or isinstance(node, ast.Assign):
            targets = (
                [node.target] if isinstance(node, ast.AnnAssign) else node.targets
            )
            for target in targets:
                if isinstance(target, ast.Name) and target.id == "DEFAULT_SETTINGS":
                    return ast.literal_eval(node.value)
    raise AssertionError("DEFAULT_SETTINGS not found in reference")


@pytest.mark.skipif(
    not REFERENCE_SETTINGS.exists(), reason="reference snapshot not mounted"
)
def test_default_namespace_matches_reference():
    expected = _reference_defaults()
    assert DEFAULT_SETTINGS == expected


def test_seed_defaults_and_typed_getters():
    mgr = SettingsManager(seed_defaults=True)
    assert mgr.get_bool("autosave/enabled") is True
    assert mgr.get_float("autosave/interval_seconds") == 120.0
    assert mgr.get_int("autosave/backup_retention") == 5
    assert mgr.get("io/default_format") == ".png"
    # string coercions
    mgr.set("diagnostics/enabled", "true")
    assert mgr.get_bool("diagnostics/enabled") is True
    mgr.set("diagnostics/enabled", "off")
    assert mgr.get_bool("diagnostics/enabled") is False
    mgr.set("autosave/backup_retention", "7")
    assert mgr.get_int("autosave/backup_retention") == 7


def test_snapshot_prefix_and_strip():
    mgr = SettingsManager(seed_defaults=True)
    snap = mgr.snapshot(prefix="segmentation/")
    assert all(k.startswith("segmentation/") for k in snap)
    assert snap["segmentation/Global/threshold"] == 127
    stripped = mgr.snapshot(prefix="segmentation/", strip_prefix=True)
    assert stripped["Global/threshold"] == 127


def test_json_roundtrip(tmp_path):
    mgr = SettingsManager(seed_defaults=True)
    mgr.set("segmentation/Global/threshold", 99)
    out = tmp_path / "settings.json"
    mgr.export_json(out)

    other = SettingsManager(seed_defaults=False)
    other.import_json(out)
    assert other.get("segmentation/Global/threshold") == 99
    assert other.get("io/default_format") == ".png"


def test_group_export_import(tmp_path):
    mgr = SettingsManager(seed_defaults=True)
    mgr.set("preprocess/gamma/value", 2.5)
    out = tmp_path / "preprocess.json"
    mgr.export_group(out, prefix="preprocess/")
    payload = json.loads(out.read_text())
    assert payload["gamma/value"] == 2.5

    other = SettingsManager(seed_defaults=False)
    other.import_group(out, prefix="preprocess/")
    assert other.get("preprocess/gamma/value") == 2.5


def test_file_persistence(tmp_path):
    path = tmp_path / "store.json"
    mgr = SettingsManager(seed_defaults=True, storage_path=path)
    mgr.set("preprocess/gamma/value", 3.0)
    assert path.exists()

    reloaded = SettingsManager(seed_defaults=False, storage_path=path)
    assert reloaded.get_float("preprocess/gamma/value") == 3.0


def test_autosave_preferences():
    mgr = SettingsManager(seed_defaults=True)
    prefs = mgr.autosave_preferences()
    assert prefs == {
        "enabled": True,
        "interval_seconds": 120.0,
        "backup_retention": 5,
        "workspace": "",
    }
    mgr.update_autosave_preferences(
        enabled=False, interval_seconds=10.0, backup_retention=2, workspace="/tmp/w"
    )
    assert mgr.autosave_enabled() is False
    assert mgr.autosave_interval() == 10.0
    assert mgr.autosave_backup_retention() == 2
    assert str(mgr.autosave_workspace()) == "/tmp/w"


def test_clear_prefix():
    mgr = SettingsManager(seed_defaults=True)
    mgr.clear(prefix="extraction/")
    assert not list(mgr.all_keys(prefix="extraction/"))
    assert mgr.contains("segmentation/Otsu/enabled")
