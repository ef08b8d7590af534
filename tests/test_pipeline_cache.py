"""PipelineCache: signature chains, prefix reuse, disk persistence.

Signature parity: the expected hashes below are computed with the
reference's exact recipe (``processing/pipeline_cache.py:40-57,256-313``)
reimplemented inline, so any drift in the cache's algorithm fails here.
"""
from __future__ import annotations

import hashlib
import json
import threading

import numpy as np
import pytest

from yamimageprocessor_tpu.pipeline.cache import (
    OperationCancelled,
    PipelineCache,
    hash_payload,
    normalise_value,
)
from yamimageprocessor_tpu.pipeline.step import PipelineStep


def _ref_source_id(arr: np.ndarray) -> str:
    h = hashlib.sha256()
    h.update(str(arr.shape).encode())
    h.update(str(arr.dtype).encode())
    h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def _ref_chain(source_id, steps):
    sig = source_id
    for step in steps:
        payload = {
            "previous": sig,
            "name": step.name,
            "enabled": bool(step.enabled),
            "params": normalise_value(step.params),
        }
        sig = hashlib.sha256(
            json.dumps(payload, sort_keys=True, separators=(",", ":")).encode()
        ).hexdigest()
    return sig


def _add(image, amount=10):
    return np.clip(image.astype(np.int32) + amount, 0, 255).astype(np.uint8)


class _Counting:
    def __init__(self):
        self.calls = 0

    def __call__(self, image, **params):
        self.calls += 1
        return _add(image, **params)


@pytest.fixture()
def image(rng):
    return rng.integers(0, 200, (24, 24), dtype=np.uint8)


def test_source_id_is_reference_compatible(image):
    cache = PipelineCache()
    assert cache.register_source(image) == _ref_source_id(image)


def test_signature_chain_is_reference_compatible(image):
    cache = PipelineCache()
    source_id = cache.register_source(image)
    steps = [
        PipelineStep(name="a", function=_add, params={"amount": 3}),
        PipelineStep(name="b", function=_add, params={"amount": 5}, enabled=False),
    ]
    final, records = cache.predict(source_id, steps)
    assert final == _ref_chain(source_id, steps)
    assert [r.index for r in records] == [0, 1]
    assert records[-1].signature == final


def test_param_normalisation_in_signatures(image):
    cache = PipelineCache()
    sid = cache.register_source(image)
    s1 = [PipelineStep(name="a", function=_add, params={"x": (1, 2), "y": {"b": 1, "a": 2}})]
    s2 = [PipelineStep(name="a", function=_add, params={"x": [1, 2], "y": {"a": 2, "b": 1}})]
    assert cache.predict(sid, s1)[0] == cache.predict(sid, s2)[0]


def test_compute_caches_every_step(image, tmp_path):
    cache = PipelineCache(cache_directory=tmp_path)
    sid = cache.register_source(image)
    fn = _Counting()
    steps = [
        PipelineStep(name="a", function=fn, params={"amount": 3}),
        PipelineStep(name="b", function=fn, params={"amount": 5}),
    ]
    result = cache.compute(sid, image, steps)
    assert fn.calls == 2
    assert (result.image == _add(_add(image, 3), 5)).all()
    # every intermediate is retrievable
    for record in result.steps:
        assert cache.cached_image(sid, record.signature) is not None

    # recompute: full cache hit, zero executions
    result2 = cache.compute(sid, image, steps)
    assert fn.calls == 2
    assert (result2.image == result.image).all()

    # change second step: prefix reuse (first step cached)
    steps[1] = PipelineStep(name="b", function=fn, params={"amount": 9})
    result3 = cache.compute(sid, image, steps)
    assert fn.calls == 3
    assert (result3.image == _add(_add(image, 3), 9)).all()


def test_disk_persistence_roundtrip(image, tmp_path):
    cache = PipelineCache(cache_directory=tmp_path)
    sid = cache.register_source(image)
    steps = [PipelineStep(name="a", function=_add, params={"amount": 7})]
    result = cache.compute(sid, image, steps)

    # new cache instance over the same directory: disk hit, no recompute
    fresh = PipelineCache(cache_directory=tmp_path)
    loaded = fresh.cached_image(sid, result.final_signature)
    assert loaded is not None
    assert (loaded == result.image).all()


def test_cancellation(image):
    cache = PipelineCache()
    sid = cache.register_source(image)
    event = threading.Event()
    event.set()
    steps = [PipelineStep(name="a", function=_add)]
    with pytest.raises(OperationCancelled):
        cache.compute(sid, image, steps, cancel_event=event)


def test_disabled_steps_pass_through(image):
    cache = PipelineCache()
    sid = cache.register_source(image)
    steps = [PipelineStep(name="a", function=_add, enabled=False)]
    result = cache.compute(sid, image, steps)
    assert (result.image == image).all()
    # disabled flag participates in the signature
    enabled_sig, _ = cache.predict(
        sid, [PipelineStep(name="a", function=_add, enabled=True)]
    )
    assert enabled_sig != result.final_signature


def test_metadata_snapshot(image, tmp_path):
    cache = PipelineCache(cache_directory=tmp_path)
    sid = cache.register_source(image, hint="frame.png")
    snap = cache.metadata_snapshot()
    assert snap[sid][sid]["hint"] == "frame.png"
    assert (tmp_path / "metadata.json").exists()


def test_register_source_by_token():
    cache = PipelineCache()
    a = cache.register_source_by_token("file:/x.png:12345:99")
    b = cache.register_source_by_token("file:/x.png:12345:99")
    c = cache.register_source_by_token("file:/x.png:12345:100")
    assert a == b != c


def test_tiled_result_replays_from_disk_after_restart(tmp_path, rng):
    """A persisted tiled result must replay from the disk cache in a fresh
    process (r3 review: the tiled path consulted only the in-memory dict
    and re-ran the whole tile stream after restart)."""

    from yamimageprocessor_tpu.ops.schema import Stage
    from yamimageprocessor_tpu.pipeline.cache import PipelineCache
    from yamimageprocessor_tpu.pipeline.step import PipelineStep
    from yamimageprocessor_tpu.pipeline.tiled_records import TiledPipelineImage

    array = rng.integers(0, 255, (64, 96), dtype=np.uint8)

    class _Record:
        shape = array.shape
        dtype = array.dtype

        def __init__(self):
            self.reads = 0

        def infer_shape(self):
            return array.shape

        def read_region(self, box):
            self.reads += 1
            left, top, right, bottom = box
            return np.array(array[top:bottom, left:right], copy=True)

        def to_array(self):
            raise AssertionError("must not materialize")

    steps = [
        PipelineStep(
            name="Gamma Correction",
            op_id="preprocessing.gamma",
            stage=Stage.PREPROCESSING,
            params={"value": 2.0},
        )
    ]

    first = PipelineCache(cache_directory=tmp_path)
    rec1 = _Record()
    source = first.register_source(array)
    res1 = first.compute(source, TiledPipelineImage(rec1, tile_size=(32, 32)), steps)
    assert rec1.reads > 0

    # fresh instance over the same cache dir = process restart
    second = PipelineCache(cache_directory=tmp_path)
    rec2 = _Record()
    source2 = second.register_source(array)
    res2 = second.compute(source2, TiledPipelineImage(rec2, tile_size=(32, 32)), steps)
    assert rec2.reads == 0  # replayed from disk, no tile stream
    assert (res1.image == res2.image).all()
