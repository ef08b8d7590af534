"""Multi-resolution preview pyramids and ND slice extraction.

Parity with the preview machinery (``ui/preprocessing.py:925-951`` pyramid
halving to <=512 px; ``yam_processor/ui/dialogs.py:63-171`` tiled level
records with lazy level fetch) — headless: levels are plain arrays, fetch
callbacks replace QThreadPool, and the request-id staleness guard is a
monotonic counter.
"""
from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Callable, List

import numpy as np

MAX_PREVIEW_EDGE = 512


def _halve(image: np.ndarray) -> np.ndarray:
    """2x box downsample (uint8-safe rounding)."""

    h, w = image.shape[:2]
    h2, w2 = h // 2 * 2, w // 2 * 2
    img = image[:h2, :w2].astype(np.float32)
    pooled = (
        img.reshape(h2 // 2, 2, w2 // 2, 2, -1).mean(axis=(1, 3))
        if image.ndim == 3
        else img.reshape(h2 // 2, 2, w2 // 2, 2).mean(axis=(1, 3))
    )
    if image.dtype == np.uint8:
        return np.clip(np.rint(pooled), 0, 255).astype(np.uint8)
    return pooled.astype(image.dtype)


@dataclass
class PreviewLevel:
    scale: int  # denominator: 1, 2, 4, ...
    image: np.ndarray


@dataclass
class PreviewRecord:
    """Halving pyramid down to MAX_PREVIEW_EDGE (``ui/preprocessing.py:925``)."""

    levels: List[PreviewLevel]

    @classmethod
    def build(cls, image: np.ndarray, max_edge: int = MAX_PREVIEW_EDGE):
        levels = [PreviewLevel(1, np.asarray(image))]
        scale = 1
        current = np.asarray(image)
        while max(current.shape[:2]) > max_edge and min(current.shape[:2]) >= 2:
            current = _halve(current)
            scale *= 2
            levels.append(PreviewLevel(scale, current))
        return cls(levels=levels)

    def best_for(self, target_edge: int) -> PreviewLevel:
        """Smallest level whose max edge still covers ``target_edge``."""

        for level in reversed(self.levels):
            if max(level.image.shape[:2]) >= target_edge:
                return level
        return self.levels[0]

    @property
    def thumbnail(self) -> np.ndarray:
        return self.levels[-1].image


class PreviewFetcher:
    """Async level fetch with a staleness guard
    (``yam_processor/ui/dialogs.py:226-290``)."""

    def __init__(self, executor=None) -> None:
        self._executor = executor
        self._request_id = 0
        self._lock = threading.Lock()

    def request(
        self,
        record: PreviewRecord,
        target_edge: int,
        callback: Callable[[np.ndarray], None],
    ) -> int:
        with self._lock:
            self._request_id += 1
            request_id = self._request_id

        def work():
            level = record.best_for(target_edge)
            with self._lock:
                if request_id != self._request_id:
                    return  # stale
            callback(level.image)

        if self._executor is not None:
            self._executor.submit(work, name=f"preview-{request_id}")
        else:
            work()
        return request_id


def extract_slice(array: np.ndarray, axis: int, index: int) -> np.ndarray:
    """ND slice controls (``yam_processor/ui/dialogs.py:292-412``)."""

    axis = max(0, min(array.ndim - 1, axis))
    index = max(0, min(array.shape[axis] - 1, index))
    return np.take(array, index, axis=axis)


__all__ = [
    "MAX_PREVIEW_EDGE",
    "PreviewLevel",
    "PreviewRecord",
    "PreviewFetcher",
    "extract_slice",
]
