"""Single-stage StageWindow shell (packaged MainWindow equivalent,
reference ``yam_processor/ui/main_window.py:23-716``)."""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from yamimageprocessor_tpu.cli import main
from yamimageprocessor_tpu.core.launcher import (
    default_stage_specifications,
    launch_stage_applications,
)
from yamimageprocessor_tpu.core.updates import UpdateAction, UpdateMetadata
from yamimageprocessor_tpu.io import image_io
from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.ui.main_window import (
    DpiMetrics,
    StageWindow,
    WindowAction,
)
from yamimageprocessor_tpu.ui.startup import StartupSelection


@pytest.fixture()
def workspace(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    img = rng.integers(0, 220, (48, 64, 3), dtype=np.uint8)
    image_io.save_image(tmp_path / "cell.png", img)
    settings = tmp_path / "settings.json"
    main(["--settings", str(settings), "settings", "export", str(tmp_path / "s.json")])
    payload = json.loads((tmp_path / "s.json").read_text())
    payload["preprocess/order"] = "NoiseReduction,BrightnessContrast"
    (tmp_path / "s.json").write_text(json.dumps(payload))
    main(["--settings", str(settings), "settings", "import", str(tmp_path / "s.json")])
    return tmp_path, settings


def _host_window(settings, body, *, dpi: float = 96.0):
    from yamimageprocessor_tpu.core.app_core import AppConfiguration

    result = {}

    def run(session):
        pane = session.pane(Stage.PREPROCESSING)
        window = StageWindow(
            session.app_core, session.controller, pane, dpi=dpi
        )
        result["value"] = body(window, session)
        return 0

    rc = launch_stage_applications(
        default_stage_specifications(),
        configuration_factory=lambda: AppConfiguration(
            allowed_roots=(Path.cwd(),), settings_path=settings
        ),
        selection_provider=lambda core, specs: StartupSelection(
            stages=(Stage.PREPROCESSING,), diagnostics=False
        ),
        run=run,
    )
    assert rc == 0
    return result["value"]


def test_dpi_scaled_metrics():
    hi = DpiMetrics(dpi=192.0)
    assert hi.icon_size == 48
    assert hi.dock_width == 560
    assert DpiMetrics(dpi=96.0).scaled(17) == 17


def test_action_tooltips_from_metadata():
    action = WindowAction(
        "run", "Run pipeline", lambda: None, "Ctrl+R", "Recompute the preview"
    )
    tip = action.tooltip_text()
    assert "Run pipeline (Ctrl+R)" in tip and "Recompute the preview" in tip


def test_default_menus_and_docks(workspace):
    _, settings = workspace

    def body(window, session):
        menus = window.menus()
        assert {"Edit", "Pipeline", "View"} <= set(menus)
        assert {"steps", "preview", "diagnostics"} <= set(window.docks)
        # Alt+1..3 focus docks in registration order; Alt+0 the main view
        assert window.handle_shortcut("Alt+1")
        assert window.focused == "steps"
        assert window.handle_shortcut("Alt+3")
        assert window.focused == "diagnostics"
        assert window.docks["diagnostics"].visible  # focusing shows it
        assert window.handle_shortcut("Alt+0")
        assert window.focused == "main"
        # Tab cycles only through visible targets
        window.toggle_dock("diagnostics")
        seen = set()
        for _ in range(4):
            window.focus_next()
            seen.add(window.focused)
        assert "diagnostics" not in seen
        return True

    assert _host_window(settings, body)


def test_dock_state_persists_via_settings(workspace):
    _, settings = workspace

    def hide(window, session):
        window.toggle_dock("preview")
        return window.dock_state()

    state = _host_window(settings, hide)
    assert state["preview"][1] is False

    def reread(window, session):
        return window.dock_state()

    assert _host_window(settings, reread)["preview"][1] is False


def test_context_menu_mutates_pipeline(workspace):
    _, settings = workspace

    def body(window, session):
        steps = window.controller.stage_steps(Stage.PREPROCESSING)
        assert [s.name for s in steps] == ["NoiseReduction", "BrightnessContrast"]
        menu = window.context_menu_for_step(0)
        names = [a.name for a in menu]
        assert "toggle_step" in names and "move_down" in names
        assert "move_up" not in names  # first step can't move up
        # toggle disables the live step through the controller
        next(a for a in menu if a.name == "toggle_step").trigger()
        assert not window.controller.stage_steps(Stage.PREPROCESSING)[0].enabled
        # move_down reorders
        next(
            a
            for a in window.context_menu_for_step(0)
            if a.name == "move_down"
        ).trigger()
        reordered = window.controller.stage_steps(Stage.PREPROCESSING)
        assert [s.name for s in reordered] == [
            "BrightnessContrast",
            "NoiseReduction",
        ]
        return True

    assert _host_window(settings, body)


def test_undo_redo_delegate_and_shortcuts(workspace):
    tmp, settings = workspace

    def _wait(task):
        if task is not None:
            task.future.result(timeout=30)

    def body(window, session):
        pane = window.pane
        pane.load_image(tmp / "cell.png")
        _wait(pane.update_preview())
        pane.commit_current()
        baseline = pane.committed.copy()
        window.controller.update_stage_step(
            Stage.PREPROCESSING, 1, params={"alpha": 1.4, "beta": 60}
        )
        _wait(pane.update_preview())
        pane.commit_current()
        assert window.handle_shortcut("Ctrl+Z")
        assert window.status_message == "Undo"
        assert np.array_equal(pane.committed, baseline)
        assert window.handle_shortcut("Ctrl+Shift+Z")
        assert window.status_message == "Redo"
        assert not np.array_equal(pane.committed, baseline)
        return True

    assert _host_window(settings, body)


def test_update_notice_wiring(workspace):
    _, settings = workspace

    def body(window, session):
        meta = UpdateMetadata.from_payload(
            {"version": "9.9", "changelog": "Fixes", "mandatory": True}
        )
        notice = window.notify_update(meta)
        assert "9.9" in notice and window.pending_update is meta
        window.acknowledge_update(UpdateAction.ACKNOWLEDGE)
        assert window.pending_update is None
        assert window.update_notice == ""
        return True

    assert _host_window(settings, body)


def test_dock_toggle_shortcuts_do_not_collide_with_focus(workspace):
    """Alt+N focuses dock N (never toggles); Ctrl+N toggles visibility —
    the advertised action shortcuts must actually route to the actions."""

    _, settings = workspace

    def body(window, session):
        assert window.docks["steps"].visible
        assert window.handle_shortcut("Ctrl+1")
        assert not window.docks["steps"].visible  # toggle action fired
        assert window.handle_shortcut("Alt+1")
        assert window.focused == "steps"
        assert window.docks["steps"].visible  # focus re-shows, not toggles
        tip = window.action("toggle_steps").tooltip_text()
        assert "Ctrl+1" in tip
        return True

    assert _host_window(settings, body)
