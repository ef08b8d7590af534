"""Crash detection and autosave recovery.

Capability parity with ``core/recovery.py:23-318``: JSON crash markers in
``recovery/crash_markers/`` (a session marker created at startup and
removed on clean shutdown, plus guarded-write markers around every
autosave/save), startup inspection that discovers a pending
``autosave.json`` snapshot with its image and backups, and restore/discard
flows summarized for dialogs.
"""
from __future__ import annotations

import datetime as _dt
import json
import logging
import os
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional

LOGGER = logging.getLogger(__name__)

MARKER_DIR = "crash_markers"
AUTOSAVE_STEM = "autosave"


@dataclass
class CrashMarker:
    marker_id: str
    kind: str  # "session" | "guarded_write"
    created: str
    payload: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "marker_id": self.marker_id,
            "kind": self.kind,
            "created": self.created,
            "payload": self.payload,
        }

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "CrashMarker":
        return cls(
            marker_id=str(data.get("marker_id", "")),
            kind=str(data.get("kind", "")),
            created=str(data.get("created", "")),
            payload=dict(data.get("payload", {})),
        )


@dataclass
class AutosaveSnapshot:
    """Discovered autosave artifacts (``core/recovery.py:44-85``)."""

    manifest_path: Path
    image_path: Optional[Path]
    pipeline: Dict[str, Any]
    metadata: Dict[str, Any]
    saved_at: Optional[str] = None
    backups: List[Path] = field(default_factory=list)


@dataclass
class RecoverySummary:
    crash_detected: bool
    snapshot: Optional[AutosaveSnapshot]
    stale_markers: List[CrashMarker]

    @property
    def has_snapshot(self) -> bool:
        return self.snapshot is not None

    @property
    def status_message(self) -> str:
        if self.crash_detected and self.has_snapshot:
            return (
                "A previous session ended unexpectedly; an autosave snapshot "
                "is available to restore."
            )
        if self.crash_detected:
            return "A previous session ended unexpectedly (no autosave found)."
        if self.has_snapshot:
            return "An autosave snapshot from a previous session is available."
        return "No recovery actions required."


class RecoveryManager:
    """Marker lifecycle + autosave snapshot discovery."""

    def __init__(self, root: os.PathLike[str] | str) -> None:
        self.root = Path(root)
        self.markers_dir = self.root / MARKER_DIR
        self.markers_dir.mkdir(parents=True, exist_ok=True)
        self._session_marker: Optional[Path] = None

    # ------------------------------------------------------------------
    # markers
    def _write_marker(self, marker: CrashMarker) -> Path:
        path = self.markers_dir / f"{marker.kind}-{marker.marker_id}.json"
        path.write_text(json.dumps(marker.to_dict(), indent=2), encoding="utf-8")
        return path

    def _iter_markers(self) -> List[CrashMarker]:
        markers: List[CrashMarker] = []
        for path in sorted(self.markers_dir.glob("*.json")):
            try:
                markers.append(
                    CrashMarker.from_dict(json.loads(path.read_text(encoding="utf-8")))
                )
            except (json.JSONDecodeError, OSError):
                LOGGER.warning("Unreadable crash marker %s", path)
        return markers

    def begin_session(self, info: Optional[Dict[str, Any]] = None) -> None:
        marker = CrashMarker(
            marker_id=uuid.uuid4().hex,
            kind="session",
            created=_dt.datetime.now(_dt.timezone.utc).isoformat(),
            payload=dict(info or {}),
        )
        self._session_marker = self._write_marker(marker)

    def end_session(self) -> None:
        if self._session_marker is not None and self._session_marker.exists():
            try:
                self._session_marker.unlink()
            except OSError:
                pass
        self._session_marker = None

    def begin_guarded_write(self, target: os.PathLike[str] | str) -> str:
        """Marker protecting one write (``core/recovery.py:222-266``)."""

        marker = CrashMarker(
            marker_id=uuid.uuid4().hex,
            kind="guarded_write",
            created=_dt.datetime.now(_dt.timezone.utc).isoformat(),
            payload={"target": str(target)},
        )
        self._write_marker(marker)
        return marker.marker_id

    def complete_guarded_write(self, marker_id: str) -> None:
        path = self.markers_dir / f"guarded_write-{marker_id}.json"
        try:
            path.unlink()
        except OSError:
            pass

    # ------------------------------------------------------------------
    # startup inspection
    def inspect_startup(self) -> RecoverySummary:
        stale = self._iter_markers()
        crash_detected = bool(stale)
        snapshot = self._discover_snapshot()
        # leftover markers are cleared once inspected; the new session
        # creates fresh ones
        for path in self.markers_dir.glob("*.json"):
            try:
                path.unlink()
            except OSError:
                pass
        return RecoverySummary(
            crash_detected=crash_detected, snapshot=snapshot, stale_markers=stale
        )

    def _discover_snapshot(self) -> Optional[AutosaveSnapshot]:
        manifest = self.root / f"{AUTOSAVE_STEM}.json"
        if not manifest.exists():
            return None
        try:
            payload = json.loads(manifest.read_text(encoding="utf-8"))
        except (json.JSONDecodeError, OSError):
            LOGGER.warning("Unreadable autosave manifest %s", manifest)
            return None
        image_name = payload.get("image_file")
        image_path = self.root / image_name if image_name else None
        if image_path is not None and not image_path.exists():
            image_path = None
        backups = sorted(self.root.glob(f"{AUTOSAVE_STEM}.backup-*"))
        return AutosaveSnapshot(
            manifest_path=manifest,
            image_path=image_path,
            pipeline=dict(payload.get("pipeline", {})),
            metadata=dict(payload.get("metadata", {})),
            saved_at=payload.get("saved_at"),
            backups=backups,
        )

    # ------------------------------------------------------------------
    # restore / discard
    def discard_snapshot(self) -> None:
        snapshot = self._discover_snapshot()
        if snapshot is None:
            return
        for path in [snapshot.manifest_path, snapshot.image_path, *snapshot.backups]:
            if path is None:
                continue
            try:
                path.unlink()
            except OSError:
                pass

    def restore_snapshot(self, io_manager=None):
        """Return (image, pipeline_dict, metadata) of the pending autosave."""

        snapshot = self._discover_snapshot()
        if snapshot is None:
            return None
        image = None
        if snapshot.image_path is not None:
            if io_manager is not None:
                record = io_manager.load_image(snapshot.image_path, lazy=False)
                image = record.to_array()
            else:
                from yamimageprocessor_tpu.io import image_io

                image = image_io.load_image(snapshot.image_path, lazy=False).to_array()
        return image, snapshot.pipeline, snapshot.metadata


__all__ = [
    "CrashMarker",
    "AutosaveSnapshot",
    "RecoverySummary",
    "RecoveryManager",
]
