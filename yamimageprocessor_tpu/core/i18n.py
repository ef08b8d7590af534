"""Translation catalogs (Qt-free i18n).

Parity with the reference loader (``core/i18n.py:47-117``): locale
normalization, candidate catalog paths per directory/locale, install/remove
semantics — over JSON catalogs (``<name>_<locale>.json`` mapping message ->
translation) instead of Qt ``.qm`` files.
"""
from __future__ import annotations

import json
import locale as _locale
import logging
from pathlib import Path
from typing import Dict, Iterable, List, Optional

LOGGER = logging.getLogger(__name__)

CATALOG_PREFIX = "yam_processor"


def normalize_locale(name: Optional[str]) -> str:
    """'es-ES.UTF-8' -> 'es_ES'; None -> system locale or 'en'."""

    if not name:
        name = _locale.getdefaultlocale()[0] or "en"
    name = name.replace("-", "_")
    return name.split(".")[0]


def default_translation_directories() -> List[Path]:
    return [Path(__file__).resolve().parent.parent / "translations"]


def candidate_catalogs(
    directories: Iterable[Path], locale_name: str, prefix: str = CATALOG_PREFIX
) -> List[Path]:
    """Most-specific first: full locale, then language only."""

    locale_name = normalize_locale(locale_name)
    language = locale_name.split("_")[0]
    names = [f"{prefix}_{locale_name}.json"]
    if language != locale_name:
        names.append(f"{prefix}_{language}.json")
    out: List[Path] = []
    for directory in directories:
        for name in names:
            candidate = Path(directory) / name
            if candidate.exists():
                out.append(candidate)
    return out


class TranslationLoader:
    """Install/uninstall message catalogs."""

    def __init__(self, directories: Optional[Iterable[Path]] = None) -> None:
        self._directories = list(directories or default_translation_directories())
        self._catalog: Dict[str, str] = {}
        self._installed_from: Optional[Path] = None

    def install(self, locale_name: Optional[str] = None) -> bool:
        for path in candidate_catalogs(self._directories, normalize_locale(locale_name)):
            try:
                payload = json.loads(path.read_text(encoding="utf-8"))
            except (OSError, json.JSONDecodeError):
                LOGGER.warning("Unreadable translation catalog %s", path)
                continue
            if isinstance(payload, dict):
                self._catalog = {str(k): str(v) for k, v in payload.items()}
                self._installed_from = path
                return True
        return False

    def remove(self) -> None:
        self._catalog = {}
        self._installed_from = None

    @property
    def installed_from(self) -> Optional[Path]:
        return self._installed_from

    def translate(self, message: str) -> str:
        return self._catalog.get(message, message)

    __call__ = translate


__all__ = [
    "TranslationLoader",
    "normalize_locale",
    "default_translation_directories",
    "candidate_catalogs",
]
