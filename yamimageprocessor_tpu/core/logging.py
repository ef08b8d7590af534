"""Structured, anonymized logging.

Parity with the reference logging service (``core/logging.py:12-89`` and the
``%(component)s`` convention from ``docs/DEVELOPER_GUIDE.md:101-122``):
rotating file handler (1 MiB x 5), optional console echo when diagnostics is
enabled, and a formatter that masks ``$HOME`` as ``~`` in every record.
"""
from __future__ import annotations

import logging
import logging.handlers
import os
from pathlib import Path
LOG_FORMAT = "%(asctime)s %(levelname)s [%(component)s] %(message)s"
MAX_BYTES = 1 * 1024 * 1024
BACKUP_COUNT = 5

_installed_handlers: list[logging.Handler] = []


class AnonymizingFormatter(logging.Formatter):
    """Mask the user's home directory in rendered log lines."""

    def format(self, record: logging.LogRecord) -> str:
        if not hasattr(record, "component"):
            record.component = record.name
        rendered = super().format(record)
        home = str(Path.home())
        if home and home != "/":
            rendered = rendered.replace(home, "~")
        return rendered


def init_logging(
    log_dir: os.PathLike[str] | str,
    *,
    diagnostics: bool = False,
    level: int = logging.INFO,
    filename: str = "yam_tpu.log",
) -> Path:
    """(Re)initialize the root logger; returns the log-file path.

    Re-initialization swaps previously installed handlers, matching
    ``core/logging.py:39-89``.
    """

    directory = Path(log_dir)
    directory.mkdir(parents=True, exist_ok=True)
    log_path = directory / filename

    root = logging.getLogger()
    for handler in _installed_handlers:
        root.removeHandler(handler)
        handler.close()
    _installed_handlers.clear()

    formatter = AnonymizingFormatter(LOG_FORMAT)
    file_handler = logging.handlers.RotatingFileHandler(
        log_path, maxBytes=MAX_BYTES, backupCount=BACKUP_COUNT, encoding="utf-8"
    )
    file_handler.setFormatter(formatter)
    root.addHandler(file_handler)
    _installed_handlers.append(file_handler)

    if diagnostics:
        console = logging.StreamHandler()
        console.setFormatter(formatter)
        root.addHandler(console)
        _installed_handlers.append(console)

    root.setLevel(level)
    return log_path


def get_component_logger(component: str) -> logging.LoggerAdapter:
    """Logger carrying the structured ``component`` field."""

    return logging.LoggerAdapter(
        logging.getLogger(component), extra={"component": component}
    )


__all__ = [
    "AnonymizingFormatter",
    "init_logging",
    "get_component_logger",
    "LOG_FORMAT",
]
