"""Flat-key settings store with JSON persistence and import/export.

Capability-parity rebuild of the reference's ``SettingsManager``
(``core/settings.py:191-465``): same public API (typed getters, prefix
snapshots, JSON import/export of whole or grouped settings, autosave
preference helpers) but backed by a plain JSON file instead of QSettings —
there is no Qt in this framework.  The key namespace itself comes from
:func:`yamimageprocessor_tpu.ops.schema.settings_defaults` and is the
pipeline wire format: stage builders parse these keys directly.
"""
from __future__ import annotations

import json
import logging
import os
import tempfile
import threading
from collections.abc import Mapping, MutableMapping
from pathlib import Path
from typing import Any, Dict, Iterable, Optional, Tuple

LOGGER = logging.getLogger(__name__)

from yamimageprocessor_tpu.ops.schema import settings_defaults

#: Default namespace, evaluated once (mirror of ``core/settings.py:19-147``).
DEFAULT_SETTINGS: Dict[str, Any] = settings_defaults()


#: textual truthiness accepted by the reference's QSettings strings
_BOOL_WORDS = {
    "1": True,
    "true": True,
    "yes": True,
    "on": True,
    "0": False,
    "false": False,
    "no": False,
    "off": False,
}


def _coerce_bool(value: Any) -> bool:
    if isinstance(value, str):
        word = value.strip().lower()
        if word in _BOOL_WORDS:
            return _BOOL_WORDS[word]
    return bool(value)


def default_storage_path(organization: str, application: str) -> Path:
    base = os.environ.get("YAM_SETTINGS_DIR")
    if base:
        root = Path(base)
    else:
        root = Path.home() / ".config" / "yamimageprocessor_tpu"
    return root / organization / f"{application}.json"


class SettingsManager:
    """Thread-safe flat-key settings store.

    ``storage_path=None`` keeps the store purely in memory (the reference's
    ``_FallbackSettings`` behavior, ``core/settings.py:150-178``).
    """

    def __init__(
        self,
        organization: str = "MicroscopicApp",
        application: str = "ImageProcessor",
        *,
        defaults: Optional[Mapping[str, Any]] = None,
        seed_defaults: bool = True,
        storage_path: Optional[os.PathLike[str] | str] = None,
    ) -> None:
        self.organization = organization
        self.application = application
        self._lock = threading.RLock()
        self._store: Dict[str, Any] = {}
        self._path: Optional[Path] = Path(storage_path) if storage_path else None
        self._defaults: Dict[str, Any] = dict(DEFAULT_SETTINGS)
        if defaults:
            self._defaults.update(defaults)
        if self._path is not None and self._path.exists():
            try:
                loaded = json.loads(self._path.read_text(encoding="utf-8"))
                if isinstance(loaded, dict):
                    self._store.update(loaded)
            except (json.JSONDecodeError, OSError):
                pass
        if seed_defaults:
            self.seed_defaults()

    # ------------------------------------------------------------------
    # CRUD
    def get(self, key: str, default: Any | None = None) -> Any:
        with self._lock:
            return self._store.get(key, default)

    def set(self, key: str, value: Any) -> None:
        with self._lock:
            self._store[key] = value
            self._flush_locked()

    def get_bool(self, key: str, default: bool = False) -> bool:
        return _coerce_bool(self.get(key, default))

    def get_int(self, key: str, default: int = 0) -> int:
        try:
            return int(self.get(key, default))
        except (TypeError, ValueError):
            return int(default)

    def get_float(self, key: str, default: float = 0.0) -> float:
        try:
            return float(self.get(key, default))
        except (TypeError, ValueError):
            return float(default)

    def remove(self, key: str) -> None:
        with self._lock:
            self._store.pop(key, None)
            self._flush_locked()

    def contains(self, key: str) -> bool:
        with self._lock:
            return key in self._store

    def clear(self, prefix: str | None = None) -> None:
        with self._lock:
            if prefix is None:
                self._store.clear()
            else:
                for key in [k for k in self._store if k.startswith(prefix)]:
                    del self._store[key]
            self._flush_locked()

    def sync(self) -> None:
        with self._lock:
            self._flush_locked()

    def all_keys(self, prefix: str | None = None) -> Iterable[str]:
        with self._lock:
            keys = list(self._store.keys())
        if prefix is None:
            return keys
        return [k for k in keys if k.startswith(prefix)]

    # ------------------------------------------------------------------
    # Defaults
    def seed_defaults(self) -> None:
        with self._lock:
            for key, value in self._defaults.items():
                self._store.setdefault(key, value)
            self._flush_locked()

    @property
    def defaults(self) -> Dict[str, Any]:
        return dict(self._defaults)

    # ------------------------------------------------------------------
    # Snapshots
    def snapshot(
        self, *, prefix: str | None = None, strip_prefix: bool = False
    ) -> Dict[str, Any]:
        data: Dict[str, Any] = {}
        for key in self.all_keys(prefix=prefix):
            out_key = key[len(prefix):] if (prefix and strip_prefix) else key
            data[out_key] = self.get(key)
        return data

    def to_dict(
        self, *, prefix: str | None = None, strip_prefix: bool = False
    ) -> Dict[str, Any]:
        return self.snapshot(prefix=prefix, strip_prefix=strip_prefix)

    def apply_snapshot(
        self, values: Mapping[str, Any], *, prefix: str | None = None,
        clear: bool = False,
    ) -> None:
        with self._lock:
            if clear:
                if prefix is None:
                    self._store.clear()
                else:
                    for key in [k for k in self._store if k.startswith(prefix)]:
                        del self._store[key]
            for key, value in values.items():
                full = key if (prefix is None or key.startswith(prefix)) else prefix + key
                self._store[full] = value
            self._flush_locked()

    def from_dict(
        self, values: Mapping[str, Any], *, prefix: str | None = None,
        clear: bool = False,
    ) -> None:
        self.apply_snapshot(values, prefix=prefix, clear=clear)

    # ------------------------------------------------------------------
    # JSON import/export
    def to_json(
        self,
        *,
        prefix: str | None = None,
        strip_prefix: bool = False,
        indent: int = 2,
    ) -> str:
        return json.dumps(
            self.snapshot(prefix=prefix, strip_prefix=strip_prefix),
            indent=indent,
            sort_keys=True,
            default=str,
        )

    def from_json(
        self,
        payload: str | Mapping[str, Any],
        *,
        prefix: str | None = None,
        clear: bool = False,
    ) -> None:
        data = json.loads(payload) if isinstance(payload, str) else dict(payload)
        if not isinstance(data, MutableMapping):
            raise ValueError("Settings JSON must describe an object")
        self.apply_snapshot(data, prefix=prefix, clear=clear)

    def export_json(
        self,
        path: os.PathLike[str] | str,
        *,
        prefix: str | None = None,
        strip_prefix: bool = False,
        indent: int = 2,
    ) -> None:
        target = Path(path)
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_text(
            self.to_json(prefix=prefix, strip_prefix=strip_prefix, indent=indent),
            encoding="utf-8",
        )

    def import_json(
        self,
        path: os.PathLike[str] | str,
        *,
        prefix: str | None = None,
        clear: bool = False,
    ) -> None:
        source = Path(path)
        if not source.exists():
            raise FileNotFoundError(source)
        self.from_json(source.read_text(encoding="utf-8"), prefix=prefix, clear=clear)

    def export_group(
        self, path: os.PathLike[str] | str, *, prefix: str, indent: int = 2
    ) -> None:
        """Persist the subset rooted at ``prefix`` with the prefix stripped."""

        target = Path(path)
        target.parent.mkdir(parents=True, exist_ok=True)
        payload = json.dumps(
            self.snapshot(prefix=prefix, strip_prefix=True),
            indent=indent,
            sort_keys=True,
            default=str,
        )
        target.write_text(payload, encoding="utf-8")

    def import_group(
        self, path: os.PathLike[str] | str, *, prefix: str, clear: bool = False
    ) -> None:
        source = Path(path)
        if not source.exists():
            raise FileNotFoundError(source)
        payload = json.loads(source.read_text(encoding="utf-8"))
        if not isinstance(payload, MutableMapping):
            raise ValueError("Settings group files must contain an object")
        self.apply_snapshot(payload, prefix=prefix, clear=clear)

    # ------------------------------------------------------------------
    # Autosave preference helpers (``core/settings.py:394-450``)
    def autosave_enabled(self) -> bool:
        return self.get_bool("autosave/enabled", True)

    def set_autosave_enabled(self, enabled: bool) -> None:
        self.set("autosave/enabled", bool(enabled))

    def autosave_interval(self) -> float:
        return max(0.0, self.get_float("autosave/interval_seconds", 120.0))

    def set_autosave_interval(self, seconds: float) -> None:
        self.set("autosave/interval_seconds", float(seconds))

    def autosave_backup_retention(self) -> int:
        return max(0, self.get_int("autosave/backup_retention", 5))

    def set_autosave_backup_retention(self, count: int) -> None:
        self.set("autosave/backup_retention", int(count))

    def autosave_workspace(self) -> Optional[Path]:
        text = str(self.get("autosave/workspace", "") or "").strip()
        return Path(text).expanduser() if text else None

    def set_autosave_workspace(self, path: Path | str | None) -> None:
        self.set("autosave/workspace", "" if path is None else str(Path(path)))

    # one spec row per preference: (pref name, reader, writer).  Both the
    # snapshot dict and the keyword-update loop below derive from this
    # table, so adding a preference is a single row.
    _AUTOSAVE_PREFS: Tuple[Tuple[str, str, str], ...] = (
        ("enabled", "autosave_enabled", "set_autosave_enabled"),
        ("interval_seconds", "autosave_interval", "set_autosave_interval"),
        (
            "backup_retention",
            "autosave_backup_retention",
            "set_autosave_backup_retention",
        ),
        ("workspace", "autosave_workspace", "set_autosave_workspace"),
    )

    def autosave_preferences(self) -> Dict[str, Any]:
        snap: Dict[str, Any] = {
            name: getattr(self, reader)()
            for name, reader, _ in self._AUTOSAVE_PREFS
        }
        snap["workspace"] = str(snap["workspace"] or "")
        return snap

    def update_autosave_preferences(self, **prefs: Any) -> None:
        """Apply any subset of the preference table; ``None`` leaves a
        preference untouched, unknown names raise."""

        writers = {name: setter for name, _, setter in self._AUTOSAVE_PREFS}
        unknown = set(prefs) - set(writers)
        if unknown:
            raise TypeError(f"unknown autosave preference(s): {sorted(unknown)}")
        for name, value in prefs.items():
            if value is not None:
                getattr(self, writers[name])(value)

    # ------------------------------------------------------------------
    def _flush_locked(self) -> None:
        """Atomically persist the store when file-backed (tmp + replace)."""

        if self._path is None:
            return
        self._path.parent.mkdir(parents=True, exist_ok=True)
        payload = json.dumps(self._store, indent=2, sort_keys=True, default=str)
        fd, tmp = tempfile.mkstemp(
            dir=str(self._path.parent), prefix=self._path.name, suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as handle:
                handle.write(payload)
            os.replace(tmp, self._path)
        except OSError:
            # surface the loss: set()/sync() otherwise report success while
            # the on-disk file silently stays stale
            LOGGER.warning(
                "Settings write failed; on-disk file is stale: %s",
                self._path,
                exc_info=True,
            )
            try:
                os.unlink(tmp)
            except OSError:
                pass


__all__ = ["SettingsManager", "DEFAULT_SETTINGS", "default_storage_path"]
