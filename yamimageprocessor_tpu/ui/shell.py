"""Interactive terminal shell hosting the stage panes.

Headless-native equivalent of the reference's window shells — the tabbed
``UnifiedMainWindow`` (``ui/unified.py:43-372``: per-stage tabs, status
bar, shared diagnostics dock, ModulePane enforcement, teardown on close)
and the packaged ``MainWindow`` (``yam_processor/ui/main_window.py:
23-716``: keyboard navigation, Alt+1..3 stage focus, undo/redo delegating
to the controller).  There is no Qt in the target environment, so the
shell renders to a character grid: logic (tab model, key dispatch, frame
rendering) lives in :class:`ShellController` and is fully testable
without a terminal; :func:`run_shell` is a thin curses adapter.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.ui import ModulePane
from yamimageprocessor_tpu.ui.theme import ShortcutRegistry, default_shortcuts

_STAGE_ORDER = (Stage.PREPROCESSING, Stage.SEGMENTATION, Stage.ANALYSIS)


class ShellController:
    """Tab model + key dispatch + text-frame renderer for a
    :class:`~yamimageprocessor_tpu.core.launcher.StageSession`."""

    def __init__(
        self,
        session,
        *,
        shortcuts: Optional[ShortcutRegistry] = None,
        diagnostics_hub=None,
    ) -> None:
        self.session = session
        self.tabs: List[Tuple[Stage, object]] = []
        for stage in _STAGE_ORDER:
            pane = session.pane(stage)
            if pane is None:
                continue
            if not isinstance(pane, ModulePane) and not (
                hasattr(pane, "pane_title") and hasattr(pane, "stage")
            ):
                # duck-type enforcement, reference ui/unified.py:336-358
                raise TypeError(f"stage {stage} object is not a ModulePane")
            self.tabs.append((stage, pane))
        if not self.tabs:
            raise ValueError("session has no panes to host")
        self.active = 0
        self.shortcuts = shortcuts or default_shortcuts()
        self.status: List[str] = list(session.status_messages)
        self.diagnostics_visible = False
        self.quit_requested = False
        self._previews: dict = {}
        self._hub = diagnostics_hub
        for stage, pane in self.tabs:
            if hasattr(pane, "on_preview"):
                pane.on_preview = self._preview_hook(stage)

    # ------------------------------------------------------------------
    @property
    def active_stage(self) -> Stage:
        return self.tabs[self.active][0]

    @property
    def active_pane(self):
        return self.tabs[self.active][1]

    def _preview_hook(self, stage: Stage) -> Callable[[np.ndarray], None]:
        def hook(image: np.ndarray) -> None:
            self._previews[stage] = (
                tuple(image.shape),
                str(image.dtype),
                float(image.mean()) if image.size else 0.0,
            )

        return hook

    def set_status(self, message: str) -> None:
        self.status.append(message)
        del self.status[:-5]

    # ------------------------------------------------------------------
    # actions (the reference routes these through toolbars/menus; here
    # they are first-class methods the key dispatcher and tests call)
    def focus_tab(self, index: int) -> None:
        if 0 <= index < len(self.tabs):
            self.active = index
            self.set_status(f"Focused {self.active_pane.pane_title()} pane")

    def next_tab(self) -> None:
        self.focus_tab((self.active + 1) % len(self.tabs))

    def toggle_diagnostics(self) -> None:
        self.diagnostics_visible = not self.diagnostics_visible

    def load(self, path: Path) -> None:
        pane = self.session.pane(Stage.PREPROCESSING) or self.active_pane
        pane.load_image(Path(path))
        self.set_status(f"Loaded {Path(path).name}")

    def run_preview(self) -> None:
        pane = self.active_pane
        if hasattr(pane, "update_preview"):
            pane.update_preview()
        elif hasattr(pane, "rebuild_from_settings"):
            pane.rebuild_from_settings()
        self.set_status(f"Ran {pane.pane_title()} preview")

    def undo(self) -> None:
        pane = self.active_pane
        if hasattr(pane, "undo") and pane.undo():
            self.set_status("Undo")

    def redo(self) -> None:
        pane = self.active_pane
        if hasattr(pane, "redo") and pane.redo():
            self.set_status("Redo")

    def quit(self) -> None:
        self.quit_requested = True

    # ------------------------------------------------------------------
    def handle_key(self, key: str) -> bool:
        """Dispatch one key (curses name or single char).  Returns True
        when the key was consumed."""

        key = key.lower()
        if key in ("1", "2", "3", "alt+1", "alt+2", "alt+3"):
            self.focus_tab(int(key[-1]) - 1)
            return True
        if key in ("\t", "tab"):
            self.next_tab()
            return True
        if key in ("d", "f2"):
            self.toggle_diagnostics()
            return True
        if key in ("r", "ctrl+r"):
            self.run_preview()
            return True
        if key in ("u", "ctrl+z"):
            self.undo()
            return True
        if key in ("y", "ctrl+shift+z"):
            self.redo()
            return True
        if key in ("q", "ctrl+q", "escape"):
            self.quit()
            return True
        return False

    # ------------------------------------------------------------------
    def _pane_lines(self, width: int) -> List[str]:
        pane = self.active_pane
        stage = self.active_stage
        lines = [f"[{pane.pane_title()}]"]
        steps = ()
        controller = getattr(self.session, "controller", None)
        if controller is not None:
            try:
                steps = controller.stage_steps(stage)
            except Exception:
                steps = ()
        if steps:
            lines.append("steps:")
            for idx, step in enumerate(steps):
                mark = "x" if getattr(step, "enabled", True) else " "
                lines.append(f"  [{mark}] {idx}: {step.name}")
        else:
            lines.append("steps: (none)")
        preview = self._previews.get(stage)
        if preview:
            shape, dtype, mean = preview
            lines.append(f"preview: {shape} {dtype} mean={mean:.1f}")
        else:
            lines.append("preview: (not run)")
        return [line[:width] for line in lines]

    def _diagnostics_lines(self, width: int, rows: int) -> List[str]:
        lines = ["-- diagnostics " + "-" * max(0, width - 15)]
        hub = self._hub
        if hub is not None:
            for line in hub.log_lines()[-(rows - 1) :]:
                lines.append(line[:width])
        else:
            lines.append("(no diagnostics hub attached)")
        return lines[:rows]

    def render(self, width: int = 100, height: int = 28) -> List[str]:
        """The full frame as ``height`` strings (the curses adapter blits
        these verbatim; tests assert on them)."""

        tabs = []
        for idx, (stage, pane) in enumerate(self.tabs):
            title = pane.pane_title()
            tabs.append(f"[{title}]" if idx == self.active else f" {title} ")
        header = " ".join(tabs)
        body_rows = height - 3
        dock_rows = min(8, body_rows // 2) if self.diagnostics_visible else 0
        lines = [header[:width]]
        pane_lines = self._pane_lines(width)[: body_rows - dock_rows]
        lines.extend(pane_lines)
        lines.extend([""] * (body_rows - dock_rows - len(pane_lines)))
        if dock_rows:
            lines.extend(self._diagnostics_lines(width, dock_rows))
        status = self.status[-1] if self.status else "ready"
        lines.append(("-" * min(width, 8) + " " + status)[:width])
        hint = "1/2/3 tabs  Tab next  r run  u/y undo/redo  d diagnostics  q quit"
        lines.append(hint[:width])
        return lines[:height]


def run_shell(session, *, screen=None, max_frames: Optional[int] = None) -> int:
    """Curses adapter: blit :meth:`ShellController.render` frames and feed
    keys to :meth:`ShellController.handle_key` until quit.  ``screen`` and
    ``max_frames`` exist for tests/automation; without a terminal this
    raises the curses error the caller surfaces."""

    import curses

    hub = None
    try:
        from yamimageprocessor_tpu.services.diagnostics import DiagnosticsHub

        hub = DiagnosticsHub()
        hub.attach_logger()
        thread_controller = getattr(session.app_core, "thread_controller", None)
        if thread_controller is not None:
            try:
                hub.attach_controller(thread_controller)
            except Exception:
                pass
    except Exception:
        hub = None

    controller = ShellController(session, diagnostics_hub=hub)

    def loop(stdscr) -> int:
        curses.curs_set(0)
        stdscr.nodelay(False)
        frames = 0
        while not controller.quit_requested:
            h, w = stdscr.getmaxyx()
            stdscr.erase()
            for row, line in enumerate(controller.render(w - 1, h)):
                try:
                    stdscr.addstr(row, 0, line)
                except curses.error:
                    pass
            stdscr.refresh()
            frames += 1
            if max_frames is not None and frames >= max_frames:
                break
            try:
                key = stdscr.getkey()
            except curses.error:
                continue
            controller.handle_key(key)
        return 0

    try:
        if screen is not None:
            return loop(screen)
        return curses.wrapper(loop)
    finally:
        if hub is not None:
            hub.detach_logger()
            try:
                hub.detach_controller()
            except Exception:
                pass


__all__ = ["ShellController", "run_shell"]
