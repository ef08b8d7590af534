"""Plugin discovery with a signature gate.

Capability parity with ``yam_processor/core/module_loader.py:39-254`` and
the active gate (``core/app_core.py:582-729``): modules are discovered from
python packages (pkgutil walk) and from loose ``.py`` files loaded under
the synthetic namespace ``yamimageprocessor_tpu.modules.dynamic``; each
candidate passes the detached-signature check before execution; every
discovered module must expose ``register_module(app_core)``.
"""
from __future__ import annotations

import importlib
import importlib.util
import logging
import pkgutil
import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional

from yamimageprocessor_tpu.core.signing import (
    MissingSignatureError,
    ModuleSignatureVerifier,
    SignatureVerificationError,
)
from yamimageprocessor_tpu.ops.schema import Stage

LOGGER = logging.getLogger(__name__)

DYNAMIC_NAMESPACE = "yamimageprocessor_tpu.modules.dynamic"


@dataclass
class ModuleRegistry:
    """Module catalog keyed by stage with enabled flags
    (``yam_processor/core/module_loader.py:39-69``)."""

    _by_stage: Dict[Stage, List[Any]] = field(default_factory=dict)
    _enabled: Dict[str, bool] = field(default_factory=dict)

    def register(self, module: Any) -> None:
        stage = module.metadata.stage
        bucket = self._by_stage.setdefault(stage, [])
        if any(
            m.metadata.identifier == module.metadata.identifier for m in bucket
        ):
            return
        bucket.append(module)
        self._enabled.setdefault(
            module.metadata.identifier, bool(module.metadata.default_enabled)
        )

    def modules(self, stage: Optional[Stage] = None) -> List[Any]:
        if stage is not None:
            return list(self._by_stage.get(stage, []))
        out: List[Any] = []
        for bucket in self._by_stage.values():
            out.extend(bucket)
        return out

    def get(self, identifier: str) -> Optional[Any]:
        for module in self.modules():
            if module.metadata.identifier == identifier:
                return module
        return None

    def is_enabled(self, identifier: str) -> bool:
        return bool(self._enabled.get(identifier, False))

    def set_enabled(self, identifier: str, enabled: bool) -> None:
        if identifier in self._enabled:
            self._enabled[identifier] = bool(enabled)

    def iter_enabled(self, stage: Optional[Stage] = None) -> Iterable[Any]:
        for module in self.modules(stage):
            if self.is_enabled(module.metadata.identifier):
                yield module


class ModuleLoader:
    """Discover and execute plugin modules behind the signature gate."""

    def __init__(
        self,
        verifier: Optional[ModuleSignatureVerifier] = None,
        *,
        require_signatures: bool = False,
    ) -> None:
        self._verifier = verifier
        self._require = require_signatures

    # ------------------------------------------------------------------
    def _gate(self, path: Optional[Path]) -> bool:
        """True when the module may load (``core/app_core.py:582-678``)."""

        if self._verifier is None:
            if self._require:
                LOGGER.warning(
                    "Signatures required but no trust store configured; "
                    "refusing %s",
                    path,
                )
                return False
            return True
        if path is None:
            return True
        try:
            self._verifier.verify_file(path)
            return True
        except MissingSignatureError:
            if self._require:
                LOGGER.warning("Unsigned module rejected: %s", path)
                return False
            return True
        except SignatureVerificationError:
            LOGGER.warning("Invalid signature, module rejected: %s", path)
            return False

    # ------------------------------------------------------------------
    def discover_package(self, package_name: str, app_core: Any) -> List[str]:
        """Import every submodule of ``package_name`` that registers."""

        loaded: List[str] = []
        try:
            pkg_spec = importlib.util.find_spec(package_name)
        except Exception:
            pkg_spec = None
        if pkg_spec is None:
            LOGGER.warning("Plugin package not importable: %s", package_name)
            return loaded
        pkg_origin = Path(pkg_spec.origin) if pkg_spec.origin else None
        if not self._gate(pkg_origin):
            return loaded
        try:
            package = importlib.import_module(package_name)
        except ImportError:
            LOGGER.warning("Plugin package not importable: %s", package_name)
            return loaded
        candidates = [package_name]
        if hasattr(package, "__path__"):
            candidates += [
                f"{package_name}.{info.name}"
                for info in pkgutil.iter_modules(package.__path__)
            ]
        for name in candidates:
            # signature gate BEFORE import: importing executes the plugin's
            # top-level code, so a tampered module must be rejected from
            # its file path (find_spec resolves it without executing)
            module_path: Optional[Path] = None
            if name != package_name:
                try:
                    spec = importlib.util.find_spec(name)
                except Exception:
                    LOGGER.exception("Failed to locate plugin module %s", name)
                    continue
                if spec is not None and spec.origin:
                    module_path = Path(spec.origin)
                if not self._gate(module_path):
                    continue
            try:
                module = importlib.import_module(name)
            except Exception:
                LOGGER.exception("Failed to import plugin module %s", name)
                continue
            register = getattr(module, "register_module", None)
            if register is None:
                continue
            if name == package_name:
                origin = getattr(module, "__file__", None)
                module_path = Path(origin) if origin else None
                if not self._gate(module_path):
                    continue
            try:
                register(app_core)
                loaded.append(name)
            except Exception:
                LOGGER.exception("register_module failed for %s", name)
        return loaded

    def discover_path(self, directory: Path, app_core: Any) -> List[str]:
        """Load loose ``.py`` files under the dynamic namespace."""

        loaded: List[str] = []
        directory = Path(directory)
        if not directory.is_dir():
            return loaded
        for candidate in sorted(directory.glob("*.py")):
            if not self._gate(candidate):
                continue
            name = f"{DYNAMIC_NAMESPACE}.{candidate.stem}"
            try:
                spec = importlib.util.spec_from_file_location(name, candidate)
                module = importlib.util.module_from_spec(spec)
                sys.modules[name] = module
                spec.loader.exec_module(module)  # type: ignore[union-attr]
            except Exception:
                LOGGER.exception("Failed to load plugin file %s", candidate)
                sys.modules.pop(name, None)
                continue
            register = getattr(module, "register_module", None)
            if register is None:
                LOGGER.warning("Plugin %s lacks register_module()", candidate)
                continue
            try:
                register(app_core)
                loaded.append(name)
            except Exception:
                LOGGER.exception("register_module failed for %s", candidate)
        return loaded


__all__ = ["ModuleLoader", "ModuleRegistry", "DYNAMIC_NAMESPACE"]
