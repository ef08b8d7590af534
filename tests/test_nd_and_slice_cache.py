"""ND stacks through the pipeline + the slice-cache spill path."""
from __future__ import annotations

import numpy as np
import pytest

import yamimageprocessor_tpu.pipeline.cache as cache_mod
from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.pipeline.cache import PipelineCache, SliceCacheEntry
from yamimageprocessor_tpu.pipeline.manager import PipelineManager
from yamimageprocessor_tpu.pipeline.step import PipelineStep


def test_nd_stack_batched_device_matches_host(rng):
    stack = rng.integers(0, 256, (6, 32, 40), dtype=np.uint8)
    steps = [
        PipelineStep(
            name="BrightnessContrast",
            stage=Stage.PREPROCESSING,
            params={"alpha": 1.3, "beta": 2.0},
        ),
        PipelineStep(name="Gamma", stage=Stage.PREPROCESSING, params={"value": 1.6}),
    ]
    manager = PipelineManager(steps)
    out = manager.apply(stack)  # batched fused path
    assert out.shape == stack.shape
    for i in range(stack.shape[0]):
        assert (out[i] == manager.apply_host(stack[i])).all()


def test_nd_stack_global_op_per_plane(rng):
    # per-plane Otsu must use each plane's own histogram
    stack = np.stack(
        [
            rng.integers(0, 100, (24, 24), dtype=np.uint8),
            rng.integers(100, 256, (24, 24), dtype=np.uint8),
        ]
    )
    manager = PipelineManager([PipelineStep(name="Otsu", stage=Stage.SEGMENTATION)])
    out = manager.apply(stack)
    for i in range(2):
        assert (out[i] == manager.apply_host(stack[i])).all()


def test_slice_cache_spill(monkeypatch, rng):
    monkeypatch.setattr(cache_mod, "_SLICE_CACHE_THRESHOLD", 1024)
    cache = PipelineCache()
    stack = rng.integers(0, 255, (4, 16, 16), dtype=np.uint8)  # 1 KiB planes
    sid = cache.register_source(stack)
    value = cache._cache[sid][sid]
    assert isinstance(value, SliceCacheEntry)
    assert (value.assemble() == stack).all()
    slices = list(value.iter_slices())
    assert len(slices) == 4
    assert (cache.cached_image(sid, sid) == stack).all()


def test_slice_cache_disk_roundtrip(monkeypatch, tmp_path, rng):
    monkeypatch.setattr(cache_mod, "_SLICE_CACHE_THRESHOLD", 1024)
    cache = PipelineCache(cache_directory=tmp_path)
    stack = rng.integers(0, 255, (3, 16, 16), dtype=np.uint8)
    sid = cache.register_source(stack)

    fresh = PipelineCache(cache_directory=tmp_path)
    loaded = fresh.cached_image(sid, sid)
    assert (loaded == stack).all()


def test_dimensional_record_through_manager(rng, tmp_path):
    from yamimageprocessor_tpu.io import image_io

    stack = rng.integers(0, 255, (5, 20, 24), dtype=np.uint8)
    path = tmp_path / "stack.tiff"
    image_io.save_image(path, stack)
    record = image_io.load_image(path)
    manager = PipelineManager(
        [
            PipelineStep(
                name="BrightnessContrast",
                stage=Stage.PREPROCESSING,
                params={"alpha": 1.2, "beta": 0.0},
            )
        ]
    )
    out = manager.apply(record.to_array())
    assert out.shape == stack.shape
    preview = PipelineManager.extract_preview(out)
    assert preview.shape == (20, 24)
