"""Theme palette + shortcut registry (headless ``ui/theme.py`` equivalent).

Parity with ``ui/theme.py:15-227``: the dark high-contrast palette as plain
role->hex data (a Qt shell maps roles onto QPalette; a web/terminal shell
uses them directly), and a ShortcutRegistry with a grouped summary tree.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

#: dark high-contrast palette (role -> hex), mirroring the reference's
#: create_high_contrast_palette (ui/theme.py:62-79)
HIGH_CONTRAST_PALETTE: Dict[str, str] = {
    "window": "#1e1e1e",
    "window_text": "#f0f0f0",
    "base": "#121212",
    "alternate_base": "#1a1a1a",
    "text": "#f5f5f5",
    "button": "#2a2a2a",
    "button_text": "#ffffff",
    "highlight": "#2979ff",
    "highlighted_text": "#ffffff",
    "tooltip_base": "#2e2e2e",
    "tooltip_text": "#f0f0f0",
    "link": "#64b5f6",
    "bright_text": "#ff5252",
    "disabled_text": "#808080",
}

#: accent colors used by annotations and overlays (BGR, matching ops)
ANNOTATION_COLORS: Dict[str, Tuple[int, int, int]] = {
    "region_box": (0, 255, 0),
    "centroid": (0, 0, 255),
    "contour": (0, 255, 255),
    "watershed_boundary": (0, 0, 255),
    "crop_overlay": (0, 255, 0),
}


@dataclass(frozen=True)
class Shortcut:
    action: str
    keys: str
    group: str = "General"
    description: str = ""


class ShortcutRegistry:
    """Register shortcuts and expose a grouped summary
    (``ui/theme.py`` ShortcutRegistry + summary tree)."""

    def __init__(self) -> None:
        self._shortcuts: Dict[str, Shortcut] = {}

    def register(
        self, action: str, keys: str, *, group: str = "General", description: str = ""
    ) -> None:
        self._shortcuts[action] = Shortcut(action, keys, group, description)

    def lookup(self, action: str) -> Optional[Shortcut]:
        return self._shortcuts.get(action)

    def by_keys(self, keys: str) -> Optional[Shortcut]:
        for shortcut in self._shortcuts.values():
            if shortcut.keys.lower() == keys.lower():
                return shortcut
        return None

    def summary(self) -> Dict[str, List[Shortcut]]:
        groups: Dict[str, List[Shortcut]] = {}
        for shortcut in self._shortcuts.values():
            groups.setdefault(shortcut.group, []).append(shortcut)
        for group in groups.values():
            group.sort(key=lambda s: s.action)
        return dict(sorted(groups.items()))


def default_shortcuts() -> ShortcutRegistry:
    registry = ShortcutRegistry()
    registry.register("open", "Ctrl+O", group="File", description="Open image")
    registry.register("save", "Ctrl+S", group="File", description="Save result")
    registry.register("undo", "Ctrl+Z", group="Edit", description="Undo")
    registry.register("redo", "Ctrl+Shift+Z", group="Edit", description="Redo")
    registry.register("run", "Ctrl+R", group="Pipeline", description="Run pipeline")
    registry.register(
        "cancel", "Escape", group="Pipeline", description="Cancel running task"
    )
    for index, stage in enumerate(("preprocessing", "segmentation", "extraction")):
        registry.register(
            f"focus_{stage}",
            f"Alt+{index + 1}",
            group="Navigation",
            description=f"Focus the {stage} pane",
        )
    return registry


__all__ = [
    "HIGH_CONTRAST_PALETTE",
    "ANNOTATION_COLORS",
    "Shortcut",
    "ShortcutRegistry",
    "default_shortcuts",
]
