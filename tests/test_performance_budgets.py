"""Opt-in performance budgets (--run-performance), mirroring the
reference's @performance markers (tests/test_pipeline_streaming_large.py).

These run on the CPU harness with budgets scaled to the reference's own
CI budget (3.1 MPix x 2 steps < 3 s); the real numbers live in bench.py /
scripts on the TPU.
"""
from __future__ import annotations

import time

import numpy as np
import pytest

from yamimageprocessor_tpu.models.stages import preprocess_steps, segmentation_steps
from yamimageprocessor_tpu.pipeline.manager import PipelineManager

pytestmark = pytest.mark.performance


def test_batched_preprocess_budget(rng):
    frames = rng.integers(0, 256, (4, 512, 512), dtype=np.uint8)
    manager = PipelineManager(preprocess_steps())
    manager.apply(frames)  # warm compile
    start = time.monotonic()
    manager.apply(frames)
    elapsed = time.monotonic() - start
    mpix_steps = 4 * 0.262 * 3
    # reference CI bound: ~2.07 MPix*steps/s; require at least that on CPU
    assert mpix_steps / elapsed > 2.07, f"{mpix_steps / elapsed:.2f} MPix*steps/s"


def test_segmentation_chain_budget(rng):
    frame = rng.integers(0, 256, (512, 512), dtype=np.uint8)
    frame[100:300, 100:300] = 220
    manager = PipelineManager(segmentation_steps(watershed=False))
    manager.apply(frame)
    start = time.monotonic()
    manager.apply(frame)
    elapsed = time.monotonic() - start
    assert elapsed < 3.0, f"segmentation chain took {elapsed:.2f}s"


def test_watershed_budget(rng):
    frame = np.full((256, 256), 30, np.uint8)
    yy, xx = np.mgrid[:256, :256]
    for cy, cx, r in ((60, 60, 30), (180, 180, 35), (60, 180, 25)):
        frame[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 210
    manager = PipelineManager(segmentation_steps(watershed=True)[-1:])
    manager.apply(np.repeat(frame[..., None], 3, axis=-1))
    start = time.monotonic()
    manager.apply(np.repeat(frame[..., None], 3, axis=-1))
    elapsed = time.monotonic() - start
    assert elapsed < 10.0, f"watershed took {elapsed:.2f}s"
