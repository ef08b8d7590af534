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


class PreviewLevel:
    """One pyramid level; ``image`` may be lazy (materialized on first
    access from the level's loader — region reads, never ``to_array``)."""

    def __init__(self, scale: int, image=None, loader=None, shape=None):
        self.scale = int(scale)
        self._image = None if image is None else np.asarray(image)
        self._loader = loader
        self._shape = (
            tuple(shape)
            if shape is not None
            else (None if self._image is None else self._image.shape)
        )

    @property
    def shape(self):
        return self._shape

    @property
    def image(self) -> np.ndarray:
        if self._image is None:
            self._image = np.asarray(self._loader())
            self._shape = self._image.shape
        return self._image

    @property
    def materialized(self) -> bool:
        return self._image is not None


def _record_shape(record) -> tuple:
    """Shape of a lazy/tiled record WITHOUT materializing it.

    PIL-raster-backed ``TiledImageRecord``\\ s expose only ``size`` until
    the first read (``shape`` stays None); an 8x8 corner probe supplies
    the channel count."""

    fn = getattr(record, "infer_shape", None)
    if fn is not None:
        shape = fn()
        if shape is not None:
            return tuple(shape)
    shape = getattr(record, "shape", None)
    if shape is not None:
        return tuple(shape)
    size = getattr(record, "size", None)
    if size is not None:
        w, h = int(size[0]), int(size[1])
        probe = np.asarray(record.read_region((0, 0, min(8, w), min(8, h))))
        return (h, w) + tuple(probe.shape[2:])
    raise ValueError("record exposes neither shape nor size")


def _downsample_streaming(record, scale: int, out_shape) -> np.ndarray:
    """Scale-``s`` box downsample via row-band region reads only — the
    lazy-record pyramid path (ref ``yam_processor/ui/dialogs.py:63-91``
    builds levels from the tiled record without materializing)."""

    shape = _record_shape(record)
    h, w = int(shape[0]), int(shape[1])
    channels = shape[2] if len(shape) > 2 else None
    oh, ow = out_shape[0], out_shape[1]
    out = np.zeros(
        (oh, ow) if channels is None else (oh, ow, channels), dtype=np.float32
    )
    for orow in range(oh):
        top = orow * scale
        bottom = min(top + scale, h)
        band = np.asarray(record.read_region((0, top, w, bottom)))
        bw = ow * scale
        band = band[:, :bw, ...].astype(np.float32)
        pooled = band.reshape(
            (band.shape[0], ow, scale) + band.shape[2:]
        ).mean(axis=(0, 2))
        out[orow] = pooled
    sample_dtype = getattr(record, "dtype", np.uint8)
    if np.dtype(sample_dtype) == np.uint8:
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out.astype(sample_dtype)


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

    @classmethod
    def from_tiled(cls, record, max_edge: int = MAX_PREVIEW_EDGE):
        """Lazy pyramid over a tiled/lazy source: EVERY level materializes
        from ``read_region`` row bands on first access; nothing touches
        ``to_array`` (the gigapixel case — a 16k² memmap source costs one
        thumbnail, not a frame)."""

        shape = _record_shape(record)
        h, w = int(shape[0]), int(shape[1])
        extra = tuple(shape[2:])
        levels = [
            PreviewLevel(
                1,
                loader=lambda: np.asarray(record.read_region((0, 0, w, h))),
                shape=(h, w) + extra,
            )
        ]
        scale = 1
        ch, cw = h, w
        while max(ch, cw) > max_edge and min(ch, cw) >= 2:
            scale *= 2
            ch, cw = h // scale, w // scale
            levels.append(
                PreviewLevel(
                    scale,
                    loader=(
                        lambda s=scale, lh=ch, lw=cw: _downsample_streaming(
                            record, s, (lh, lw)
                        )
                    ),
                    shape=(ch, cw) + extra,
                )
            )
        return cls(levels=levels)

    def best_for(self, target_edge: int) -> PreviewLevel:
        """Smallest level whose max edge still covers ``target_edge``."""

        for level in reversed(self.levels):
            if max(level.shape[:2]) >= target_edge:
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


class CoalescingPreviewScheduler:
    """Debounced parameter-preview scheduling with pending-params
    coalescing (``yam_processor/ui/dialogs.py:508-807``): while a preview
    compute is in flight, newer parameter updates overwrite a single
    pending slot; when the compute finishes, only the LATEST pending params
    run.  N rapid updates cost at most 2 computes."""

    def __init__(self, compute: Callable[[object], None], submit=None) -> None:
        self._compute = compute
        self._submit = submit  # fn(callable) -> runs it (thread pool hook)
        self._lock = threading.Lock()
        self._running = False
        self._pending: tuple = ()  # () = empty; (params,) = pending
        self.computes = 0  # instrumentation (tests/diagnostics)

    def schedule(self, params) -> None:
        with self._lock:
            if self._running:
                self._pending = (params,)
                return
            self._running = True
        self._launch(params)

    def _launch(self, params) -> None:
        def work():
            try:
                self.computes += 1
                self._compute(params)
            finally:
                self._on_done()

        if self._submit is not None:
            self._submit(work)
        else:
            work()

    def _on_done(self) -> None:
        with self._lock:
            if self._pending:
                params = self._pending[0]
                self._pending = ()
            else:
                self._running = False
                return
        self._launch(params)

    @property
    def busy(self) -> bool:
        with self._lock:
            return self._running


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
    "CoalescingPreviewScheduler",
    "extract_slice",
]
