"""Consent-gated telemetry.

Parity with the reference policy (``core/app_core.py:905-960``,
``README.md:79-97``): telemetry is opt-in (persisted at
``telemetry/enabled``) and only ACTIVE when diagnostics is also enabled —
and even then nothing leaves the machine; events are structured log lines.
"""
from __future__ import annotations

import logging
from typing import Any

LOGGER = logging.getLogger("yam.telemetry")


class TelemetryGate:
    def __init__(self, settings) -> None:
        self._settings = settings

    @property
    def opted_in(self) -> bool:
        return bool(self._settings.get_bool("telemetry/enabled", False))

    def configure(self, enabled: bool) -> None:
        self._settings.set("telemetry/enabled", bool(enabled))

    @property
    def active(self) -> bool:
        """Opt-in AND diagnostics (``core/app_core.py:941-960``)."""

        return self.opted_in and self._settings.get_bool(
            "diagnostics/enabled", False
        )

    def record(self, event: str, **fields: Any) -> None:
        if not self.active:
            return
        LOGGER.info(
            "telemetry %s %s",
            event,
            {k: v for k, v in sorted(fields.items())},
            extra={"component": "telemetry"},
        )


__all__ = ["TelemetryGate"]
