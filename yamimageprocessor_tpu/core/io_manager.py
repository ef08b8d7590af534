"""IOManager: sandboxed image IO with metadata sidecars and backups.

Capability parity with ``core/io_manager.py:70-434``: a format registry
(PNG/JPG/TIFF/BMP/NPY/NPZ/HDF5), ``save_image`` with a JSON metadata
sidecar (schema ``yam.image-metadata.v1``, atomic tmp+replace) and
timestamped backups with retention, ``load_image`` with eager/lazy
dispatch (memmap for .npy, Pillow handle for rasters above the lazy
threshold), path sandboxing through
:mod:`yamimageprocessor_tpu.core.path_sanitizer` and redacted paths in
persisted metadata.
"""
from __future__ import annotations

import datetime as _dt
import glob
import json
import logging
import os
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np

from yamimageprocessor_tpu.core.path_sanitizer import (
    redact_path_for_metadata,
    root_index_for_path,
    sanitize_user_path,
)
from yamimageprocessor_tpu.io import image_io

LOGGER = logging.getLogger(__name__)

METADATA_SCHEMA = "yam.image-metadata.v1"

#: export format registry (``core/io_manager.py:76-88``)
SUPPORTED_EXPORTS: Dict[str, str] = {
    ".png": "PNG image",
    ".jpg": "JPEG image",
    ".jpeg": "JPEG image",
    ".tif": "TIFF image",
    ".tiff": "TIFF image",
    ".bmp": "Bitmap image",
    ".npy": "NumPy array",
    ".npz": "NumPy archive",
    ".h5": "HDF5 dataset",
    ".hdf5": "HDF5 dataset",
}


class IOManager:
    """Load/save service with sidecars, backups and sandboxing."""

    def __init__(
        self,
        settings=None,
        *,
        backup_retention: Optional[int] = None,
        sandboxed: bool = True,
    ) -> None:
        self._settings = settings
        self._backup_retention = backup_retention
        self._sandboxed = sandboxed

    # ------------------------------------------------------------------
    def _resolve(self, path, *, must_exist: bool = False) -> Path:
        if self._sandboxed:
            return sanitize_user_path(path, must_exist=must_exist, allow_directory=False)
        return Path(path)

    def _retention(self) -> int:
        if self._backup_retention is not None:
            return max(0, int(self._backup_retention))
        if self._settings is not None:
            return self._settings.autosave_backup_retention()
        return 5

    # ------------------------------------------------------------------
    def save_image(
        self,
        path: os.PathLike[str] | str,
        image: Union[np.ndarray, Any],
        *,
        metadata: Optional[Dict[str, Any]] = None,
        backup: bool = True,
        write_sidecar: bool = True,
    ) -> Path:
        target = self._resolve(path)
        if target.suffix.lower() not in SUPPORTED_EXPORTS:
            raise image_io.UnsupportedFormatError(
                f"Unsupported export format: {target.suffix}"
            )
        target.parent.mkdir(parents=True, exist_ok=True)
        if backup and target.exists():
            self._create_backup(target)
        image_io.save_image(target, image, metadata=metadata)
        if write_sidecar:
            self._write_metadata_sidecar(target, image, metadata or {})
        return target

    def load_image(
        self,
        path: os.PathLike[str] | str,
        *,
        lazy: Union[bool, str] = "auto",
    ):
        source = self._resolve(path, must_exist=True)
        record = image_io.load_image(source, lazy=lazy)
        sidecar = self.sidecar_path(source)
        if sidecar.exists():
            try:
                payload = json.loads(sidecar.read_text(encoding="utf-8"))
                if isinstance(payload, dict):
                    record.metadata.update(payload.get("metadata", {}))
            except (json.JSONDecodeError, OSError):
                LOGGER.warning("Unreadable metadata sidecar %s", sidecar)
        return record

    # ------------------------------------------------------------------
    @staticmethod
    def sidecar_path(path: Path) -> Path:
        return path.with_name(path.name + ".json")

    def _write_metadata_sidecar(
        self, target: Path, image: Any, metadata: Dict[str, Any]
    ) -> None:
        array = np.asarray(
            image.to_array() if hasattr(image, "to_array") else image
        )
        payload = {
            "schema": METADATA_SCHEMA,
            "created": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "image": {
                "path": redact_path_for_metadata(target),
                "root_index": root_index_for_path(target),
                "shape": [int(d) for d in array.shape],
                "dtype": str(array.dtype),
            },
            "metadata": json.loads(json.dumps(metadata, default=str)),
        }
        sidecar = self.sidecar_path(target)
        self._atomic_write_text(sidecar, json.dumps(payload, indent=2, sort_keys=True))

    @staticmethod
    def _atomic_write_text(target: Path, text: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=str(target.parent), suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as handle:
                handle.write(text)
                handle.flush()
                os.fsync(handle.fileno())
            os.replace(tmp, target)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    # ------------------------------------------------------------------
    def _create_backup(self, target: Path) -> Optional[Path]:
        """Timestamped copy next to the file, pruned to the retention count
        (``core/io_manager.py:389-434``)."""

        retention = self._retention()
        if retention <= 0:
            return None
        stamp = _dt.datetime.now().strftime("%Y%m%d-%H%M%S-%f")
        backup = target.with_name(f"{target.stem}.backup-{stamp}{target.suffix}")
        try:
            backup.write_bytes(target.read_bytes())
        except OSError:
            LOGGER.warning("Failed to create backup for %s", target, exc_info=True)
            return None
        pattern = f"{glob.escape(target.stem)}.backup-*{glob.escape(target.suffix)}"
        backups = sorted(target.parent.glob(pattern))
        while len(backups) > retention:
            victim = backups.pop(0)
            try:
                victim.unlink()
            except OSError:
                pass
        return backup

    def list_backups(self, path: os.PathLike[str] | str):
        target = Path(path)
        return sorted(
            target.parent.glob(
                f"{glob.escape(target.stem)}.backup-*{glob.escape(target.suffix)}"
            )
        )


__all__ = ["IOManager", "SUPPORTED_EXPORTS", "METADATA_SCHEMA"]
