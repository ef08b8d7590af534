"""Debounced autosave of (image, pipeline, metadata) payloads.

Capability parity with ``core/persistence.py:26-257``: ``mark_dirty``
schedules a debounced write via ``threading.Timer`` at the configured
interval (0 => immediate), every write is wrapped in RecoveryManager
guarded-write markers, and explicit ``save`` performs a project save with
backups through the IOManager.
"""
from __future__ import annotations

import datetime as _dt
import json
import logging
import threading
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

LOGGER = logging.getLogger(__name__)


@dataclass
class AutosavePayload:
    """One autosave unit (``core/persistence.py:26-46``)."""

    image: Optional[np.ndarray]
    pipeline: Dict[str, Any] = field(default_factory=dict)
    metadata: Dict[str, Any] = field(default_factory=dict)
    image_format: str = ".png"


class AutosaveManager:
    """Debounced autosave writer with crash-marker protection."""

    def __init__(
        self,
        settings,
        io_manager,
        recovery,
        *,
        workspace: Optional[Path] = None,
    ) -> None:
        self._settings = settings
        self._io = io_manager
        self._recovery = recovery
        self._workspace = Path(workspace) if workspace else None
        self._lock = threading.Lock()
        self._timer: Optional[threading.Timer] = None
        self._pending: Optional[AutosavePayload] = None
        self._last_saved_at: Optional[str] = None

    # ------------------------------------------------------------------
    @property
    def workspace(self) -> Path:
        if self._workspace is not None:
            return self._workspace
        configured = (
            self._settings.autosave_workspace() if self._settings else None
        )
        if configured is not None:
            return configured
        return Path(self._recovery.root)

    @property
    def enabled(self) -> bool:
        return bool(self._settings.autosave_enabled()) if self._settings else True

    @property
    def interval(self) -> float:
        return float(self._settings.autosave_interval()) if self._settings else 120.0

    @property
    def last_saved_at(self) -> Optional[str]:
        return self._last_saved_at

    # ------------------------------------------------------------------
    def mark_dirty(self, payload: AutosavePayload) -> None:
        """Schedule (or immediately run) an autosave
        (``core/persistence.py:97-119``)."""

        if not self.enabled:
            return
        with self._lock:
            self._pending = payload
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None
            delay = self.interval
            if delay <= 0:
                pending = self._pending
                self._pending = None
        if delay <= 0:
            self._write_autosave(pending)
            return
        with self._lock:
            self._timer = threading.Timer(delay, self._flush)
            self._timer.daemon = True
            self._timer.start()

    def flush(self) -> None:
        """Write any pending payload now."""

        self._flush()

    def _flush(self) -> None:
        with self._lock:
            payload = self._pending
            self._pending = None
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None
        if payload is not None:
            self._write_autosave(payload)

    def cancel(self) -> None:
        with self._lock:
            self._pending = None
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None

    # ------------------------------------------------------------------
    def _write_autosave(self, payload: AutosavePayload) -> None:
        workspace = self.workspace
        workspace.mkdir(parents=True, exist_ok=True)
        manifest_path = workspace / "autosave.json"
        marker = self._recovery.begin_guarded_write(manifest_path)
        try:
            image_file = None
            if payload.image is not None:
                image_file = f"autosave{payload.image_format}"
                self._io.save_image(
                    workspace / image_file,
                    payload.image,
                    metadata=payload.metadata,
                    backup=True,
                    write_sidecar=False,
                )
            stamp = _dt.datetime.now(_dt.timezone.utc).isoformat()
            manifest = {
                "version": 1,
                "saved_at": stamp,
                "image_file": image_file,
                "pipeline": payload.pipeline,
                "metadata": json.loads(json.dumps(payload.metadata, default=str)),
            }
            tmp = manifest_path.with_suffix(".json.tmp")
            tmp.write_text(json.dumps(manifest, indent=2), encoding="utf-8")
            tmp.replace(manifest_path)
            self._last_saved_at = stamp
        except Exception:
            LOGGER.exception("Autosave failed")
        finally:
            self._recovery.complete_guarded_write(marker)

    # ------------------------------------------------------------------
    def save(
        self,
        path: Path,
        payload: AutosavePayload,
    ) -> Path:
        """Explicit project save with backups (``core/persistence.py:121-179``)."""

        marker = self._recovery.begin_guarded_write(path)
        try:
            target = self._io.save_image(
                path,
                payload.image,
                metadata={
                    **payload.metadata,
                    "pipeline": payload.pipeline,
                },
                backup=True,
            )
            return target
        finally:
            self._recovery.complete_guarded_write(marker)

    def shutdown(self) -> None:
        self.flush()


__all__ = ["AutosavePayload", "AutosaveManager"]
