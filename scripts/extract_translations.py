#!/usr/bin/env python
"""Translatable-string extraction + catalog merge.

The reference builds Qt catalogs with pylupdate5/lrelease
(``/root/reference/scripts/build_translations.sh`` turns tr() call sites
into ``translations/yam_processor_<locale>.ts`` then ``.qm``).  This is
the JSON-catalog equivalent for the Qt-free rebuild:

1. collect the user-visible message surface —
   * module metadata (titles, descriptions, menu paths) from the plugin
     catalog,
   * shortcut groups/descriptions from the theme registry,
   * op parameter labels from the schema table,
   * explicit ``tr("...")`` / ``.translate("...")`` literals found by an
     AST walk over the package sources;
2. merge into ``yamimageprocessor_tpu/translations/yam_processor_<locale>
   .json`` for every requested locale — existing translations are
   preserved, new messages appear with an empty value (untranslated),
   stale messages are kept (the reference keeps obsolete entries in .ts).

Usage: python scripts/extract_translations.py [locale ...]   (default: all
existing catalogs)
"""
from __future__ import annotations

import ast
import json
import sys
from pathlib import Path
from typing import Iterable, Set

REPO = Path(__file__).resolve().parent.parent
PACKAGE = REPO / "yamimageprocessor_tpu"
CATALOG_DIR = PACKAGE / "translations"
PREFIX = "yam_processor"

sys.path.insert(0, str(REPO))


def _module_strings() -> Set[str]:
    from yamimageprocessor_tpu.modules.preprocessing import MODULE_CLASSES

    out: Set[str] = set()
    for cls in MODULE_CLASSES:
        meta = cls()._build_metadata()
        out.add(meta.title)
        if meta.description:
            out.add(meta.description)
        if meta.menu_path:
            parts = (
                meta.menu_path
                if isinstance(meta.menu_path, (tuple, list))
                else meta.menu_path.split("/")
            )
            out.update(str(part) for part in parts if part)
    return out


def _shortcut_strings() -> Set[str]:
    from yamimageprocessor_tpu.ui.theme import default_shortcuts

    out: Set[str] = set()
    for group, shortcuts in default_shortcuts().summary().items():
        out.add(group)
        out.update(s.description for s in shortcuts if s.description)
    return out


def _schema_strings() -> Set[str]:
    from yamimageprocessor_tpu.ops.schema import ALL_OPS

    return {op.title for op in ALL_OPS if op.title}


def _tr_call_strings(root: Path) -> Set[str]:
    """Literal arguments of tr("...") / <obj>.translate("...") calls."""

    out: Set[str] = set()
    for path in root.rglob("*.py"):
        try:
            tree = ast.parse(path.read_text(encoding="utf-8"))
        except SyntaxError:
            continue
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call) or not node.args:
                continue
            name = ""
            if isinstance(node.func, ast.Name):
                name = node.func.id
            elif isinstance(node.func, ast.Attribute):
                name = node.func.attr
            if name not in ("tr", "translate"):
                continue
            arg = node.args[0]
            if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
                out.add(arg.value)
    return out


def collect_messages() -> Set[str]:
    msgs: Set[str] = set()
    msgs |= _module_strings()
    msgs |= _shortcut_strings()
    msgs |= _schema_strings()
    msgs |= _tr_call_strings(PACKAGE)
    return {m for m in msgs if m.strip()}


def merge_catalog(locale: str, messages: Iterable[str]) -> Path:
    path = CATALOG_DIR / f"{PREFIX}_{locale}.json"
    existing = {}
    if path.exists():
        existing = json.loads(path.read_text(encoding="utf-8"))
    merged = dict(existing)  # stale entries stay, like .ts obsolete marks
    added = 0
    for message in sorted(messages):
        if message not in merged:
            merged[message] = ""
            added += 1
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        json.dumps(dict(sorted(merged.items())), ensure_ascii=False, indent=2)
        + "\n",
        encoding="utf-8",
    )
    untranslated = sum(1 for v in merged.values() if not v)
    print(
        f"{path.name}: {len(merged)} messages "
        f"(+{added} new, {untranslated} untranslated)"
    )
    return path


def main(argv: list) -> int:
    locales = argv or sorted(
        p.stem.replace(f"{PREFIX}_", "")
        for p in CATALOG_DIR.glob(f"{PREFIX}_*.json")
    )
    if not locales:
        locales = ["es"]
    messages = collect_messages()
    print(f"collected {len(messages)} translatable messages")
    for locale in locales:
        merge_catalog(locale, messages)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
