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
        self._preview_images: dict = {}
        self._hub = diagnostics_hub
        # image view mode (the PreviewWidget equivalent: zoom/pan over the
        # preview pyramid, ref yam_processor/ui/dialogs.py:171-290)
        self.viewport = None
        self.pending_graphics: Optional[str] = None
        # step selection + modal state (the reference routes parameter
        # editing through per-op ParameterDialogs, ui/preprocessing.py:
        # 242-607; here the selected step opens an inline editor driven by
        # the same ControlMetadata specs)
        self.selected_step = 0
        self.mode = "normal"  # "normal" | "edit" | "prompt"
        self.edit_specs: List = []
        self.edit_values: dict = {}
        self.selected_param = 0
        self.prompt_purpose = ""
        self.prompt_buffer = ""
        for stage, pane in self.tabs:
            if hasattr(pane, "on_preview"):
                pane.on_preview = self._preview_hook(stage)
            # activate = sync the stage slice from settings (reference
            # panes rebuild on activation, ui/unified.py:243-286)
            for rebuild in ("replace_steps_from_settings", "rebuild_from_settings"):
                fn = getattr(pane, rebuild, None)
                if fn is not None:
                    try:
                        fn()
                    except Exception:
                        pass
                    break

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
            self._preview_images[stage] = image

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
            # clamp the step cursor to the new stage's list (stages have
            # different lengths; a stale index would crash toggle/edit)
            steps = self._stage_step_list()
            self.selected_step = max(0, min(self.selected_step, len(steps) - 1))
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
    # step selection + inline parameter editor
    def _stage_step_list(self):
        controller = getattr(self.session, "controller", None)
        if controller is None:
            return ()
        try:
            return controller.stage_steps(self.active_stage)
        except Exception:
            return ()

    def select_step(self, delta: int) -> None:
        steps = self._stage_step_list()
        if steps:
            self.selected_step = max(
                0, min(len(steps) - 1, self.selected_step + delta)
            )

    def toggle_selected_step(self) -> None:
        steps = self._stage_step_list()
        if not steps:
            return
        self.selected_step = min(self.selected_step, len(steps) - 1)
        step = steps[self.selected_step]
        new_state = not getattr(step, "enabled", True)
        self.session.controller.update_stage_step(
            self.active_stage, self.selected_step, enabled=new_state
        )
        self.set_status(f"{'Enabled' if new_state else 'Disabled'} {step.name}")

    def begin_edit(self) -> None:
        from yamimageprocessor_tpu.ui.control_metadata import (
            get_module_control_metadata,
        )

        steps = self._stage_step_list()
        if not steps:
            return
        self.selected_step = min(self.selected_step, len(steps) - 1)
        step = steps[self.selected_step]
        specs = get_module_control_metadata(step.name)
        if not specs:
            self.set_status(f"{step.name} has no editable parameters")
            return
        self.edit_specs = list(specs.values())
        self.edit_values = {
            spec.name: step.params.get(spec.name, spec.default)
            for spec in self.edit_specs
        }
        self.selected_param = 0
        self.mode = "edit"

    def adjust_param(self, direction: int) -> None:
        spec = self.edit_specs[self.selected_param]
        value = self.edit_values[spec.name]
        if spec.kind == "bool":
            value = not bool(value)
        elif spec.kind == "choice":
            choices = list(spec.choices) or [spec.default]
            idx = choices.index(str(value)) if str(value) in choices else 0
            value = choices[(idx + direction) % len(choices)]
        else:
            delta = spec.step or (1 if spec.kind == "int" else 0.1)
            if spec.odd and spec.kind == "int":
                delta = 2  # odd-size params move in steps of 2
            value = (float(value) if spec.kind == "float" else int(value)) + (
                direction * delta
            )
        self.edit_values[spec.name] = spec.coerce(value)

    def apply_edit(self) -> None:
        self.session.controller.update_stage_step(
            self.active_stage, self.selected_step, params=dict(self.edit_values)
        )
        steps = self._stage_step_list()
        name = steps[self.selected_step].name if steps else "step"
        self.mode = "normal"
        self.set_status(f"Applied {name} parameters")
        self.run_preview()

    def cancel_edit(self) -> None:
        self.mode = "normal"
        self.set_status("Edit cancelled")

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # image view mode (renders actual pixels — ASCII halftone inline, and
    # kitty/sixel streams emitted by the curses adapter on demand)
    _VIEW_PANEL = (72, 30)  # halftone cell grid (2:1 cell aspect baked in)

    def begin_view(self) -> None:
        from yamimageprocessor_tpu.ui.imageview import ImageViewport
        from yamimageprocessor_tpu.ui.preview import PreviewRecord

        pane = self.active_pane
        stage = self.active_stage
        preview = None
        record = None
        from yamimageprocessor_tpu.ui.imageview import needs_nd_controls

        image = self._preview_images.get(stage)
        if image is not None and getattr(image, "size", 0):
            array = np.asarray(image)
            if needs_nd_controls(array):
                # ND stack: slice browsing (axis cycle + slice stepping),
                # the PreviewWidget slice-control contract
                self.viewport = ImageViewport(
                    None, nd_array=array, dims=getattr(image, "dims", None)
                )
                self.mode = "view"
                return
            preview = PreviewRecord.build(array)
        elif getattr(pane, "preview_record", None) is not None:
            # lazy/gigapixel source: pan via region reads, never to_array
            preview = pane.preview_record
            record = getattr(pane, "_lazy_record", None)
        if preview is None:
            self.set_status("view: no preview to display (press r first)")
            return
        self.viewport = ImageViewport(preview, record=record)
        self.mode = "view"

    def end_view(self) -> None:
        self.mode = "normal"

    def _view_panel_size(self) -> Tuple[int, int]:
        return self._VIEW_PANEL

    def request_graphics(self) -> None:
        """Queue a kitty/sixel frame for the terminal adapter to emit
        outside the curses screen (protocol from the environment)."""

        from yamimageprocessor_tpu.ui import imageview as IV

        if self.viewport is None:
            return
        proto = IV.detect_graphics_protocol()
        frame = self.viewport.view(768, 480)
        if proto == "kitty":
            self.pending_graphics = IV.encode_kitty(frame)
        elif proto == "sixel":
            self.pending_graphics = IV.encode_sixel(frame)
        else:
            self.set_status("terminal reports no graphics protocol (ascii only)")

    def export_view(self, path: Path) -> None:
        from yamimageprocessor_tpu.ui.imageview import write_png

        if self.viewport is None:
            raise ValueError("no active view")
        cols, rows = self._VIEW_PANEL
        write_png(Path(path), self.viewport.view(cols * 12, rows * 24))
        self.set_status(f"Exported view to {Path(path).name}")

    def handle_view_key(self, key: str) -> bool:
        vp = self.viewport
        if vp is None:
            self.mode = "normal"
            return True
        cols, rows = self._VIEW_PANEL
        vw, vh = cols, rows * 2  # square-ish source pixels per cell grid
        low = key.lower()
        if low in ("escape", "\x1b", "q"):
            self.end_view()
        elif low in ("left", "key_left", "h"):
            vp.pan(0, -0.25, vw, vh)
        elif low in ("right", "key_right", "l"):
            vp.pan(0, 0.25, vw, vh)
        elif low in ("up", "key_up", "k"):
            vp.pan(-0.25, 0, vw, vh)
        elif low in ("down", "key_down", "j"):
            vp.pan(0.25, 0, vw, vh)
        elif low in ("+", "="):
            vp.zoom_by(2.0, vw, vh)
        elif low == "-":
            vp.zoom_by(0.5, vw, vh)
        elif low == "0":
            vp.fit()
        elif low == "1":
            vp.at_100()
        elif low == "g":
            self.request_graphics()
        elif low == "w":
            self.begin_prompt("export")
        elif low == "a":
            vp.cycle_axis()
        elif low in ("[", ","):
            vp.step_slice(-1)
        elif low in ("]", "."):
            vp.step_slice(1)
        return True

    def begin_prompt(self, purpose: str) -> None:
        self.mode = "prompt"
        self.prompt_purpose = purpose
        self.prompt_buffer = ""

    def finish_prompt(self) -> None:
        path = self.prompt_buffer.strip()
        was_export = self.prompt_purpose == "export"
        self.mode = "view" if was_export and self.viewport is not None else "normal"
        if not path:
            return
        try:
            if self.prompt_purpose == "open":
                self.load(Path(path))
            elif self.prompt_purpose == "save":
                pane = self.active_pane
                if hasattr(pane, "save_processed_image"):
                    pane.save_processed_image(Path(path))
                    self.set_status(f"Saved {Path(path).name}")
            elif was_export:
                self.export_view(Path(path))
        except Exception as exc:  # surfaced, not fatal — reference dialogs
            self.set_status(f"{self.prompt_purpose} failed: {exc}")

    # ------------------------------------------------------------------
    def handle_key(self, key: str) -> bool:
        """Dispatch one key (curses name or single char).  Returns True
        when the key was consumed."""

        if self.mode == "prompt":
            if key in ("\n", "enter", "KEY_ENTER"):
                self.finish_prompt()
            elif key in ("escape", "\x1b"):
                self.mode = "normal"
            elif key in ("KEY_BACKSPACE", "\x7f", "\b"):
                self.prompt_buffer = self.prompt_buffer[:-1]
            elif len(key) == 1 and key.isprintable():
                self.prompt_buffer += key
            return True

        if self.mode == "view":
            return self.handle_view_key(key)

        if self.mode == "edit":
            low = key.lower()
            if low in ("up", "KEY_UP".lower()):
                self.selected_param = max(0, self.selected_param - 1)
            elif low in ("down", "KEY_DOWN".lower()):
                self.selected_param = min(
                    len(self.edit_specs) - 1, self.selected_param + 1
                )
            elif low in ("left", "KEY_LEFT".lower(), "-"):
                self.adjust_param(-1)
            elif low in ("right", "KEY_RIGHT".lower(), "+", "="):
                self.adjust_param(1)
            elif low in ("\n", "enter", "KEY_ENTER".lower()):
                self.apply_edit()
            elif low in ("escape", "\x1b", "q"):
                self.cancel_edit()
            return True

        key = key.lower()
        if key in ("1", "2", "3", "alt+1", "alt+2", "alt+3"):
            self.focus_tab(int(key[-1]) - 1)
            return True
        if key in ("\t", "tab"):
            self.next_tab()
            return True
        if key in ("up", "key_up"):
            self.select_step(-1)
            return True
        if key in ("down", "key_down"):
            self.select_step(1)
            return True
        if key in (" ", "space"):
            self.toggle_selected_step()
            return True
        if key in ("e", "\n", "enter", "key_enter"):
            self.begin_edit()
            return True
        if key == "o":
            self.begin_prompt("open")
            return True
        if key == "v":
            self.begin_view()
            return True
        if key == "s":
            self.begin_prompt("save")
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
    def _view_lines(self, width: int, rows: int) -> List[str]:
        from yamimageprocessor_tpu.ui.imageview import ascii_halftone

        vp = self.viewport
        cols = min(self._VIEW_PANEL[0], max(8, width - 2))
        cells = min(self._VIEW_PANEL[1], max(4, rows - 2))
        frame = vp.view(cols, cells * 2)  # 2:1 character cell aspect
        lines = [f"-- view {vp.describe(cols, cells * 2)} --"[:width]]
        lines.extend(ascii_halftone(frame, cols, cells))
        return lines

    def _pane_lines(self, width: int) -> List[str]:
        pane = self.active_pane
        stage = self.active_stage
        lines = [f"[{pane.pane_title()}]"]
        steps = self._stage_step_list()
        if steps:
            lines.append("steps:")
            for idx, step in enumerate(steps):
                mark = "x" if getattr(step, "enabled", True) else " "
                cursor = ">" if idx == self.selected_step else " "
                lines.append(f" {cursor}[{mark}] {idx}: {step.name}")
        else:
            lines.append("steps: (none)")
        if self.mode == "edit" and self.edit_specs:
            steps = self._stage_step_list()
            name = steps[self.selected_step].name if steps else "?"
            lines.append(f"-- edit {name} --")
            for idx, spec in enumerate(self.edit_specs):
                cursor = ">" if idx == self.selected_param else " "
                value = self.edit_values[spec.name]
                lines.append(f" {cursor}{spec.name} = {value}")
            spec = self.edit_specs[self.selected_param]
            tip = spec.tooltip_text() if hasattr(spec, "tooltip_text") else ""
            if tip:
                lines.append(f"  {tip}")
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
        if self.mode == "view" and self.viewport is not None:
            pane_lines = self._view_lines(width, body_rows - dock_rows)
        else:
            pane_lines = self._pane_lines(width)
        pane_lines = pane_lines[: body_rows - dock_rows]
        lines.extend(pane_lines)
        lines.extend([""] * (body_rows - dock_rows - len(pane_lines)))
        if dock_rows:
            lines.extend(self._diagnostics_lines(width, dock_rows))
        status = self.status[-1] if self.status else "ready"
        lines.append(("-" * min(width, 8) + " " + status)[:width])
        if self.mode == "prompt":
            hint = f"{self.prompt_purpose} path: {self.prompt_buffer}_"
        elif self.mode == "edit":
            hint = "up/down param  left/right adjust  Enter apply  Esc cancel"
        elif self.mode == "view":
            hint = (
                "arrows/hjkl pan  +/- zoom  0 fit  1 100%  g graphics  "
                "w export png  Esc back"
            )
            if self.viewport is not None and self.viewport.nd_active:
                hint = "[/] slice  a axis  " + hint
        else:
            hint = (
                "1/2/3 tabs  up/down step  Space toggle  e edit  v view  "
                "o open  s save  r run  u/y undo/redo  d diagnostics  q quit"
            )
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
        stdscr.keypad(True)  # arrows arrive as KEY_* names, not ESC runs
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
            if controller.pending_graphics:
                # kitty/sixel streams bypass curses: suspend the screen,
                # write the escape stream, wait for a key, resume
                payload = controller.pending_graphics
                controller.pending_graphics = None
                curses.endwin()
                try:
                    import sys as _sys

                    _sys.stdout.write(payload + "\n[any key to return]")
                    _sys.stdout.flush()
                    stdscr.getkey()
                except Exception:
                    pass
                stdscr.refresh()
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
