"""Chunked device→host transfers for high-latency accelerator links.

Measured on the tunneled TPU attachment this framework targets (and
re-checked each round): monolithic D2H fetches collapse above ~4 MiB —
50 MB/s at 4 MiB but only ~14 MB/s at 16-64 MiB — while several in-flight
≤4 MiB copies sustain ~75-78 MB/s aggregate.  H2D shows the opposite
profile (monolithic 34 MiB uploads hit ~48 MB/s; pre-chunked uploads are
slower), so only the fetch side chunks.

The reference never needed this: its arrays live in host memory
(``processing/pipeline_cache.py`` passes numpy buffers between steps).
This is TPU-runtime infrastructure with no reference counterpart.
"""
from __future__ import annotations

from typing import Any, List

import numpy as np

def _env_bytes(name: str, default: int) -> int:
    import os

    try:
        return max(1 << 16, int(os.environ.get(name, default)))
    except ValueError:
        return default


#: transfer granularity: the largest size the link still serves at full
#: rate.  Default tuned to the tunneled relay; override per link with
#: YAM_FETCH_CHUNK_BYTES, or call :func:`probe_and_tune` once to size it
#: from a live measurement (PCIe-class links prefer much larger chunks —
#: the 4 MiB default costs them per-chunk dispatch overhead).
CHUNK_BYTES = _env_bytes("YAM_FETCH_CHUNK_BYTES", 4 << 20)


def probe_and_tune(floor_bytes: int = 4 << 20) -> dict:
    """One-shot link probe: fetch a 32 MiB buffer at several chunk sizes
    and set :data:`CHUNK_BYTES` to the largest size within 10% of the best
    rate (never below ``floor_bytes`` — the tuned relay default stays the
    floor, so this box cannot regress).  Also measures the round-trip
    latency (tiny fetch) and the H2D upload rate, which the streaming
    engine's :func:`~yamimageprocessor_tpu.parallel.tiling.autotune_transfer`
    uses to classify the link regime.  Returns the measured table.

    An explicit ``YAM_FETCH_CHUNK_BYTES`` override wins and skips the
    chunk-size choice (the latency/rate measurements still run).
    """

    import os
    import time

    global CHUNK_BYTES
    import jax

    env_forced = bool(os.environ.get("YAM_FETCH_CHUNK_BYTES"))

    # round-trip latency: a minimal fetch is all latency, no bandwidth
    tiny = jax.device_put(np.zeros(1024, np.uint8))
    np.asarray(tiny)  # settle + warm
    lat = []
    for _ in range(3):
        start = time.perf_counter()
        np.asarray(tiny)
        lat.append(time.perf_counter() - start)
    latency_s = min(lat)

    # H2D rate: one 16 MiB upload, settled by a scalar fetch
    h2d_buf = np.zeros(16 << 20, np.uint8)
    jax.block_until_ready(jax.device_put(h2d_buf))  # warm path
    start = time.perf_counter()
    jax.block_until_ready(jax.device_put(h2d_buf))
    h2d_bps = h2d_buf.nbytes / max(time.perf_counter() - start, 1e-9)

    buf = jax.device_put(np.zeros(32 << 20, np.uint8))
    np.asarray(buf[:1])  # settle the upload
    rates = {}
    for size in (4 << 20, 16 << 20, 32 << 20):
        fetch(buf, size)  # warm this shape
        start = time.perf_counter()
        fetch(buf, size)
        rates[size] = buf.nbytes / max(time.perf_counter() - start, 1e-9)
    best = max(rates.values())
    if not env_forced:
        chosen = max(
            [s for s, r in rates.items() if r >= 0.9 * best] + [floor_bytes]
        )
        CHUNK_BYTES = max(chosen, floor_bytes)
    return {
        "chunk_bytes": CHUNK_BYTES,
        "rates_MBps": {s: round(r / 1e6, 1) for s, r in rates.items()},
        "latency_ms": round(latency_s * 1e3, 2),
        "h2d_MBps": round(h2d_bps / 1e6, 1),
        "d2h_MBps": round(best / 1e6, 1),
        "source": "env" if env_forced else "probe",
    }


class FetchHandle:
    """An in-flight chunked D2H fetch (start early, finish at drain)."""

    __slots__ = ("chunks", "shape", "dtype")

    def __init__(self, chunks: List[Any], shape, dtype) -> None:
        self.chunks = chunks
        self.shape = shape
        self.dtype = dtype


def start_fetch(dev: Any, chunk_bytes: int | None = None) -> FetchHandle:
    """Begin an async device→host copy of ``dev`` in ≤``chunk_bytes``
    flat slices (default: the module's current — possibly probe-tuned —
    :data:`CHUNK_BYTES`).  Returns a handle for :func:`finish_fetch`."""

    if chunk_bytes is None:
        chunk_bytes = CHUNK_BYTES
    nbytes = int(getattr(dev, "nbytes", 0))
    if isinstance(dev, np.ndarray) or nbytes <= chunk_bytes:
        _copy_async(dev)
        return FetchHandle([dev], dev.shape, dev.dtype)
    flat = dev.reshape(-1)
    per = max(1, chunk_bytes // max(int(dev.dtype.itemsize), 1))
    chunks = [flat[i : i + per] for i in range(0, flat.shape[0], per)]
    for chunk in chunks:
        _copy_async(chunk)
    return FetchHandle(chunks, dev.shape, dev.dtype)


def finish_fetch(handle: FetchHandle) -> np.ndarray:
    """Block until every chunk has landed; returns the assembled array."""

    if len(handle.chunks) == 1:
        return np.asarray(handle.chunks[0])
    flat = np.concatenate([np.asarray(c) for c in handle.chunks])
    return flat.reshape(handle.shape)


def fetch(dev: Any, chunk_bytes: int | None = None) -> np.ndarray:
    """Synchronous chunked fetch (start + finish)."""

    return finish_fetch(start_fetch(dev, chunk_bytes))


def _copy_async(dev: Any) -> None:
    try:
        dev.copy_to_host_async()
    except Exception:  # pragma: no cover - backend-dependent
        pass


__all__ = [
    "CHUNK_BYTES",
    "FetchHandle",
    "start_fetch",
    "finish_fetch",
    "fetch",
    "probe_and_tune",
]
