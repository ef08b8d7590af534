"""Single-stage window shell: the packaged ``MainWindow`` equivalent.

Capability parity with the reference's alternative single-stage shell
(``/root/reference/yam_processor/ui/main_window.py:23-716``): dockable
panels with persisted layout state, DPI-scaled metrics, keyboard focus
navigation chains with Alt+0..3 focus shortcuts, per-step context menus,
tooltips derived from actions, update-dialog wiring, and undo/redo
delegating to the pipeline controller.  There is no Qt in the target
environment, so the window is a pure model: shells (curses, web, tests)
read ``menus()``/``docks``/``focus_order`` and feed ``handle_shortcut``.

Unlike :class:`~yamimageprocessor_tpu.ui.shell.ShellController` (the
tabbed multi-stage ``UnifiedMainWindow`` equivalent), a ``StageWindow``
hosts exactly ONE stage pane — the reference ships both shells and so do
we.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

from yamimageprocessor_tpu.core.updates import (
    UpdateAction,
    UpdateMetadata,
    format_update_notice,
)
from yamimageprocessor_tpu.ops.schema import Stage

_DOCK_STATE_KEY = "ui/main_window/docks"


@dataclass
class WindowAction:
    """A menu/toolbar action; tooltips are derived from the action itself
    (reference ``main_window.py`` builds tooltips from QAction text +
    shortcut + status tip rather than hand-writing them)."""

    name: str
    text: str
    callback: Callable[[], Any]
    shortcut: str = ""
    description: str = ""
    enabled: bool = True
    checkable: bool = False
    checked: bool = False

    def tooltip_text(self) -> str:
        parts = [self.text]
        if self.shortcut:
            parts[0] = f"{self.text} ({self.shortcut})"
        if self.description:
            parts.append(self.description)
        return "\n".join(parts)

    def trigger(self) -> Any:
        if not self.enabled:
            return None
        if self.checkable:
            self.checked = not self.checked
        return self.callback()


@dataclass
class DockPanel:
    """A dockable panel placeholder (diagnostics, preview, step list)."""

    name: str
    title: str
    area: str = "right"  # left | right | bottom
    visible: bool = True
    widget: Any = None


@dataclass
class DpiMetrics:
    """DPI-scaled layout metrics (reference scales dock minimum widths and
    icon sizes by ``logicalDpiX()/96``)."""

    dpi: float = 96.0
    base_icon: int = 24
    base_dock_width: int = 280
    base_spacing: int = 6

    def scaled(self, px: int) -> int:
        return max(1, round(px * self.dpi / 96.0))

    @property
    def icon_size(self) -> int:
        return self.scaled(self.base_icon)

    @property
    def dock_width(self) -> int:
        return self.scaled(self.base_dock_width)

    @property
    def spacing(self) -> int:
        return self.scaled(self.base_spacing)


class StageWindow:
    """Headless single-stage window over one pane + the shared controller."""

    def __init__(
        self,
        app_core: Any,
        controller: Any,
        pane: Any,
        *,
        dpi: float = 96.0,
    ) -> None:
        self.app_core = app_core
        self.controller = controller
        self.pane = pane
        self.stage: Stage = getattr(pane, "stage", Stage.PREPROCESSING)
        self.metrics = DpiMetrics(dpi=dpi)
        self.status_message: str = "ready"
        self.pending_update: Optional[UpdateMetadata] = None
        self.update_notice: str = ""
        self._actions: Dict[str, WindowAction] = {}
        self._menus: Dict[str, List[str]] = {}
        self.docks: Dict[str, DockPanel] = {}
        self.focus_order: List[str] = ["main"]
        self.focused: str = "main"
        self._build_default_actions()
        self._build_default_docks()
        self._restore_dock_state()
        # sync the stage slice from settings on construction (the reference
        # window rebuilds its pipeline from QSettings at init)
        for rebuild in ("replace_steps_from_settings", "rebuild_from_settings"):
            fn = getattr(pane, rebuild, None)
            if fn is not None:
                try:
                    fn()
                except Exception:
                    pass
                break

    # ------------------------------------------------------------------
    # actions + menus (File/Edit/Pipeline/View/Help, reference menu bar)
    def add_action(self, menu: str, action: WindowAction) -> None:
        self._actions[action.name] = action
        self._menus.setdefault(menu, []).append(action.name)

    def action(self, name: str) -> Optional[WindowAction]:
        return self._actions.get(name)

    def menus(self) -> Dict[str, List[WindowAction]]:
        return {
            menu: [self._actions[n] for n in names]
            for menu, names in self._menus.items()
        }

    def _build_default_actions(self) -> None:
        self.add_action(
            "Edit",
            WindowAction(
                "undo", "Undo", self.undo, "Ctrl+Z", "Revert the last pipeline change"
            ),
        )
        self.add_action(
            "Edit",
            WindowAction(
                "redo",
                "Redo",
                self.redo,
                "Ctrl+Shift+Z",
                "Re-apply the last undone change",
            ),
        )
        self.add_action(
            "Pipeline",
            WindowAction(
                "run", "Run pipeline", self.run_preview, "Ctrl+R",
                "Recompute the stage preview",
            ),
        )
        # Ctrl+N toggles visibility; Alt+N (handled by the focus-chain
        # branch of handle_shortcut, never the action registry) focuses
        for index, dock in enumerate(("steps", "preview", "diagnostics"), start=1):
            self.add_action(
                "View",
                WindowAction(
                    f"toggle_{dock}",
                    f"Toggle {dock} dock",
                    (lambda d=dock: self.toggle_dock(d)),
                    f"Ctrl+{index}",
                    f"Show or hide the {dock} panel",
                    checkable=True,
                    checked=True,
                ),
            )

    # ------------------------------------------------------------------
    # docks (layout state persisted like the reference's saveState)
    def _build_default_docks(self) -> None:
        self.register_dock(DockPanel("steps", "Pipeline steps", area="left"))
        self.register_dock(DockPanel("preview", "Preview", area="right"))
        self.register_dock(
            DockPanel("diagnostics", "Diagnostics", area="bottom", visible=False)
        )

    def register_dock(self, dock: DockPanel) -> None:
        self.docks[dock.name] = dock
        if dock.name not in self.focus_order:
            self.focus_order.append(dock.name)

    def toggle_dock(self, name: str) -> bool:
        dock = self.docks[name]
        dock.visible = not dock.visible
        if not dock.visible and self.focused == name:
            self.focused = "main"
        self._persist_dock_state()
        return dock.visible

    def dock_state(self) -> Dict[str, Tuple[str, bool]]:
        return {name: (d.area, d.visible) for name, d in self.docks.items()}

    def _settings(self):
        return getattr(self.app_core, "settings", None)

    def _persist_dock_state(self) -> None:
        settings = self._settings()
        if settings is None:
            return
        payload = {n: [d.area, bool(d.visible)] for n, d in self.docks.items()}
        try:
            settings.set(_DOCK_STATE_KEY, payload)
        except Exception:
            pass

    def _restore_dock_state(self) -> None:
        settings = self._settings()
        if settings is None:
            return
        try:
            payload = settings.get(_DOCK_STATE_KEY, None)
        except Exception:
            return
        if not isinstance(payload, dict):
            return
        for name, state in payload.items():
            dock = self.docks.get(name)
            if dock is None or not isinstance(state, (list, tuple)):
                continue
            if len(state) == 2:
                dock.area = str(state[0])
                dock.visible = bool(state[1])

    # ------------------------------------------------------------------
    # keyboard navigation (Alt+0..3 focus chain, Tab cycling)
    def focus(self, target: str) -> None:
        if target in self.focus_order:
            dock = self.docks.get(target)
            if dock is not None and not dock.visible:
                dock.visible = True
            self.focused = target
            self.status_message = f"Focused {target}"

    def focus_next(self) -> None:
        visible = [
            n
            for n in self.focus_order
            if n == "main" or self.docks[n].visible
        ]
        idx = visible.index(self.focused) if self.focused in visible else 0
        self.focus(visible[(idx + 1) % len(visible)])

    def focus_prev(self) -> None:
        visible = [
            n
            for n in self.focus_order
            if n == "main" or self.docks[n].visible
        ]
        idx = visible.index(self.focused) if self.focused in visible else 0
        self.focus(visible[(idx - 1) % len(visible)])

    def handle_shortcut(self, keys: str) -> bool:
        """Dispatch a shortcut chord.  Alt+0 focuses the main view and
        Alt+1..N focus the docks in registration order (reference binds
        Alt+0-3); anything else resolves through the action registry."""

        norm = keys.strip().lower()
        if norm == "alt+0":
            self.focus("main")
            return True
        if norm.startswith("alt+") and norm[4:].isdigit():
            index = int(norm[4:]) - 1
            docks = [n for n in self.focus_order if n != "main"]
            if 0 <= index < len(docks):
                self.focus(docks[index])
                return True
            return False
        if norm == "tab":
            self.focus_next()
            return True
        if norm == "shift+tab":
            self.focus_prev()
            return True
        for action in self._actions.values():
            if action.shortcut.lower() == norm:
                action.trigger()
                return True
        return False

    # ------------------------------------------------------------------
    # per-step context menus (enable/edit/remove/move, wired live)
    def context_menu_for_step(self, index: int) -> List[WindowAction]:
        steps = self.controller.stage_steps(self.stage)
        if not (0 <= index < len(steps)):
            return []
        step = steps[index]
        stage = self.stage
        actions = [
            WindowAction(
                "toggle_step",
                "Disable" if getattr(step, "enabled", True) else "Enable",
                lambda: self.controller.update_stage_step(
                    stage, index, enabled=not getattr(step, "enabled", True)
                ),
                description=f"Toggle {step.name} on or off",
            ),
            WindowAction(
                "remove_step",
                "Remove",
                lambda: self.controller.remove_stage_step(stage, index),
                description=f"Remove {step.name} from the pipeline",
            ),
        ]
        if index > 0:
            actions.append(
                WindowAction(
                    "move_up",
                    "Move up",
                    lambda: self._move_step(index, index - 1),
                    description="Run this step earlier",
                )
            )
        if index < len(steps) - 1:
            actions.append(
                WindowAction(
                    "move_down",
                    "Move down",
                    lambda: self._move_step(index, index + 1),
                    description="Run this step later",
                )
            )
        return actions

    def _move_step(self, index: int, target: int) -> None:
        steps = list(self.controller.stage_steps(self.stage))
        steps.insert(target, steps.pop(index))
        self.controller.replace_stage_steps(self.stage, steps)

    # ------------------------------------------------------------------
    # update-dialog wiring (reference main_window.py shows the packaged
    # UpdateDialog and acknowledges through the dispatcher)
    def notify_update(self, metadata: UpdateMetadata) -> str:
        self.pending_update = metadata
        self.update_notice = format_update_notice(metadata)
        self.status_message = "Update available"
        return self.update_notice

    def acknowledge_update(self, action: UpdateAction) -> None:
        self.pending_update = None
        self.update_notice = ""
        core = self.app_core
        # AppCore.acknowledge_update clears the dispatcher's pending notice
        # and resumes the paused thread controller (core/app_core.py:357)
        handler = getattr(core, "acknowledge_update", None)
        if handler is not None:
            try:
                handler()
            except Exception:
                pass
        else:
            dispatcher = getattr(core, "update_dispatcher", None)
            if dispatcher is not None:
                try:
                    dispatcher.acknowledge()
                except Exception:
                    pass
        self.status_message = f"Update {action.value}"

    # ------------------------------------------------------------------
    # delegation (undo/redo/run through the pane/controller)
    def undo(self) -> bool:
        fn = getattr(self.pane, "undo", None)
        ok = bool(fn()) if fn else False
        self.status_message = "Undo" if ok else "Nothing to undo"
        return ok

    def redo(self) -> bool:
        fn = getattr(self.pane, "redo", None)
        ok = bool(fn()) if fn else False
        self.status_message = "Redo" if ok else "Nothing to redo"
        return ok

    def run_preview(self) -> None:
        if hasattr(self.pane, "update_preview"):
            self.pane.update_preview()
        elif hasattr(self.pane, "rebuild_from_settings"):
            self.pane.rebuild_from_settings()
        self.status_message = "Preview updated"


__all__ = [
    "DockPanel",
    "DpiMetrics",
    "StageWindow",
    "WindowAction",
]
