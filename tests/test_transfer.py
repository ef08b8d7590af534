"""Chunked D2H transfer helpers + link-probe tuning.

TPU-runtime infrastructure with no reference counterpart (the reference
passes numpy buffers between steps, ``processing/pipeline_cache.py``);
round-trip correctness and the probe's floor guarantee are what matter.
"""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.parallel import transfer as TR


@pytest.mark.parametrize("shape", [(7, 13), (512, 512), (3, 257, 129)])
def test_chunked_fetch_roundtrip(shape, rng):
    import jax

    data = rng.integers(0, 256, shape, dtype=np.uint8)
    dev = jax.device_put(data)
    # tiny chunk size forces the multi-chunk path even for small arrays
    out = TR.fetch(dev, chunk_bytes=1 << 12)
    np.testing.assert_array_equal(out, data)
    handle = TR.start_fetch(dev, chunk_bytes=1 << 12)
    np.testing.assert_array_equal(TR.finish_fetch(handle), data)


def test_probe_and_tune_never_drops_below_floor(monkeypatch):
    # env override wins and skips probing entirely
    monkeypatch.setenv("YAM_FETCH_CHUNK_BYTES", str(8 << 20))
    info = TR.probe_and_tune()
    assert info["source"] == "env"

    monkeypatch.delenv("YAM_FETCH_CHUNK_BYTES")
    before = TR.CHUNK_BYTES
    try:
        info = TR.probe_and_tune(floor_bytes=4 << 20)
        assert info["source"] == "probe"
        # the tuned value never regresses below the floor, and every
        # probed size is reported for disclosure
        assert info["chunk_bytes"] >= 4 << 20
        assert TR.CHUNK_BYTES == info["chunk_bytes"]
        assert set(info["rates_MBps"]) == {4 << 20, 16 << 20, 32 << 20}
    finally:
        TR.CHUNK_BYTES = before
