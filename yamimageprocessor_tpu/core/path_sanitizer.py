"""Allowed-roots filesystem sandbox for user-supplied paths.

Behavior-parity rebuild of the reference sandbox
(``core/path_sanitizer.py:40-156``): module-global allowed roots, symlink
rejection along the whole ancestor chain, escape detection, and
``[root]``-redacted display paths for metadata.
"""
from __future__ import annotations

import os
import threading
from pathlib import Path
from typing import Iterable, Optional, Sequence

ROOT_PLACEHOLDER = "[root]"


class PathValidationError(ValueError):
    """Raised when a user-supplied path cannot be accepted."""


_lock = threading.Lock()
_roots: tuple[Path, ...] = ()


def _absolute(path: Path | str) -> Path:
    candidate = Path(path).expanduser()
    if not candidate.is_absolute():
        candidate = Path.cwd() / candidate
    return candidate


def _resolve(path: Path | str) -> Path:
    candidate = _absolute(path)
    try:
        return candidate.resolve(strict=False)
    except RuntimeError as exc:  # cyclic symlinks
        raise PathValidationError(f"Unable to resolve path '{candidate}': {exc}") from exc


def _dedupe(paths: Sequence[Path]) -> tuple[Path, ...]:
    out: list[Path] = []
    for p in paths:
        if p not in out:
            out.append(p)
    return tuple(out)


def configure_allowed_roots(roots: Iterable[Path | str]) -> None:
    """Install the sandbox roots; missing directories are created."""

    resolved: list[Path] = []
    for root in roots:
        if root is None:
            continue
        # symlink test on the UNRESOLVED path: _resolve() dereferences
        # links, so testing the resolved candidate can never fire
        raw = Path(root).expanduser()
        if raw.is_symlink():
            raise PathValidationError(
                f"Allowed root may not be a symbolic link: {raw}"
            )
        candidate = _resolve(root)
        candidate.mkdir(parents=True, exist_ok=True)
        resolved.append(candidate)
    if not resolved:
        resolved.append(_resolve(Path.cwd()))
    global _roots
    with _lock:
        _roots = _dedupe(resolved)


def allowed_roots() -> tuple[Path, ...]:
    if not _roots:
        configure_allowed_roots([Path.cwd()])
    return _roots


def _has_symlink_component(path: Path) -> bool:
    for node in (path, *path.parents):
        if node.exists() and node.is_symlink():
            return True
    return False


def sanitize_user_path(
    path: os.PathLike[str] | str,
    *,
    must_exist: bool = False,
    allow_directory: bool = True,
    allow_file: bool = True,
) -> Path:
    """Normalize ``path``, rejecting symlinks and sandbox escapes."""

    if not allow_directory and not allow_file:
        raise PathValidationError("Either directories or files must be permitted")

    raw = _absolute(path)
    if _has_symlink_component(raw):
        raise PathValidationError("Paths containing symbolic links are not permitted")

    resolved = _resolve(path)
    if must_exist and not resolved.exists():
        raise PathValidationError(f"Path does not exist: {resolved}")

    roots = allowed_roots()
    if not any(resolved == root or resolved.is_relative_to(root) for root in roots):
        raise PathValidationError("Path escapes the configured sandbox")

    if resolved.exists():
        if resolved.is_dir() and not allow_directory:
            raise PathValidationError(
                "A directory path was supplied where files are required"
            )
        if resolved.is_file() and not allow_file:
            raise PathValidationError(
                "A file path was supplied where directories are required"
            )
    return resolved


def root_index_for_path(path: Path) -> Optional[int]:
    resolved = Path(path)
    for index, root in enumerate(allowed_roots()):
        try:
            resolved.relative_to(root)
            return index
        except ValueError:
            continue
    return None


def redact_path_for_metadata(path: Path) -> str:
    """Replace the sandbox root with ``[root]`` for metadata/display."""

    resolved = Path(path)
    for root in allowed_roots():
        try:
            relative = resolved.relative_to(root)
            return str(Path(ROOT_PLACEHOLDER) / relative)
        except ValueError:
            continue
    return resolved.name or str(resolved)


__all__ = [
    "ROOT_PLACEHOLDER",
    "PathValidationError",
    "allowed_roots",
    "configure_allowed_roots",
    "redact_path_for_metadata",
    "root_index_for_path",
    "sanitize_user_path",
]
