"""Update polling and notification dispatch.

Capability parity with the reference update system
(``core/app_core.py:77-170,1072-1177``): poll a JSON endpoint with a 10 s
timeout, tolerant payload parsing into :class:`UpdateMetadata`, listener
fan-out through :class:`UpdateDispatcher` with acknowledge semantics; the
AppCore pauses its ThreadController while a notice is pending.
"""
from __future__ import annotations

import json
import logging
import threading
import urllib.request
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, List, Optional

LOGGER = logging.getLogger(__name__)

UPDATE_TIMEOUT_SECONDS = 10.0


@dataclass(frozen=True)
class UpdateMetadata:
    """Tolerantly-parsed update descriptor (``core/app_core.py:77-123``)."""

    version: str
    url: str = ""
    changelog: str = ""
    mandatory: bool = False
    raw: Dict[str, Any] = field(default_factory=dict, compare=False, hash=False)

    @classmethod
    def from_payload(cls, payload: Any) -> Optional["UpdateMetadata"]:
        if not isinstance(payload, dict):
            return None
        version = payload.get("version") or payload.get("latest_version")
        if not version:
            return None
        url = payload.get("url") or payload.get("download_url") or ""
        changelog = (
            payload.get("changelog")
            or payload.get("notes")
            or payload.get("release_notes")
            or ""
        )
        mandatory = bool(payload.get("mandatory", payload.get("required", False)))
        return cls(
            version=str(version),
            url=str(url),
            changelog=str(changelog),
            mandatory=mandatory,
            raw=dict(payload),
        )


UpdateListener = Callable[[UpdateMetadata], None]


class UpdateDispatcher:
    """Listener fan-out with pending/acknowledge state
    (``core/app_core.py:126-170``)."""

    def __init__(self) -> None:
        self._listeners: List[UpdateListener] = []
        self._pending: Optional[UpdateMetadata] = None
        self._lock = threading.Lock()

    def add_listener(self, listener: UpdateListener) -> None:
        with self._lock:
            if listener not in self._listeners:
                self._listeners.append(listener)
            pending = self._pending
        if pending is not None:
            listener(pending)

    def remove_listener(self, listener: UpdateListener) -> None:
        with self._lock:
            try:
                self._listeners.remove(listener)
            except ValueError:
                pass

    @property
    def pending(self) -> Optional[UpdateMetadata]:
        with self._lock:
            return self._pending

    def has_listeners(self) -> bool:
        with self._lock:
            return bool(self._listeners)

    def dispatch(self, metadata: UpdateMetadata) -> None:
        with self._lock:
            self._pending = metadata
            listeners = list(self._listeners)
        for listener in listeners:
            try:
                listener(metadata)
            except Exception:
                LOGGER.debug("Update listener failed", exc_info=True)

    def acknowledge(self) -> None:
        with self._lock:
            self._pending = None


class UpdateAction(str, Enum):
    """User choices on an update notice
    (``yam_processor/ui/update_dialog.py:17-21``)."""

    ACKNOWLEDGE = "acknowledge"
    INSTALL = "install"


def format_update_notice(metadata: UpdateMetadata) -> str:
    """Render the release-notes notice a shell presents for an available
    update (headless ``yam_processor/ui/update_dialog.py`` UpdateDialog:
    title with version, changelog body, download URL, and whether the
    update is mandatory)."""

    lines = [f"Update {metadata.version} available"]
    if metadata.mandatory:
        lines.append("This update is mandatory.")
    if metadata.changelog:
        lines.append("")
        lines.append(metadata.changelog.strip())
    if metadata.url:
        lines.append("")
        lines.append(f"Download: {metadata.url}")
    return "\n".join(lines)


def fetch_update_metadata(
    endpoint: str, *, timeout: float = UPDATE_TIMEOUT_SECONDS
) -> Optional[UpdateMetadata]:
    """Poll ``endpoint`` for an update payload; None on any failure."""

    try:
        with urllib.request.urlopen(endpoint, timeout=timeout) as response:
            payload = json.loads(response.read().decode("utf-8"))
    except Exception:
        LOGGER.debug("Update check failed for %s", endpoint, exc_info=True)
        return None
    return UpdateMetadata.from_payload(payload)


__all__ = [
    "UpdateMetadata",
    "UpdateAction",
    "format_update_notice",
    "UpdateDispatcher",
    "fetch_update_metadata",
    "UPDATE_TIMEOUT_SECONDS",
]
