"""Lazy preview pyramids + coalesced parameter previews (VERDICT item 9).

Reference behavior: pyramid levels built from the lazy record
(``yam_processor/ui/dialogs.py:63-91``) and debounced threaded preview with
pending-params coalescing (``:508-807``).
"""
from __future__ import annotations

import threading

import numpy as np

from yamimageprocessor_tpu.ui.preview import (
    CoalescingPreviewScheduler,
    PreviewRecord,
)


class _RegionOnlyRecord:
    """Tiled source that refuses to materialize and logs region reads."""

    def __init__(self, array: np.ndarray):
        self._array = array
        self.shape = array.shape
        self.dtype = array.dtype
        self.read_boxes = []

    def infer_shape(self):
        return self._array.shape

    def read_region(self, box):
        left, top, right, bottom = box
        self.read_boxes.append(tuple(box))
        return np.array(self._array[top:bottom, left:right, ...], copy=True)

    def to_array(self):
        raise AssertionError("lazy preview pyramid must not materialize")


def test_lazy_pyramid_from_region_reads_only():
    rng = np.random.default_rng(3)
    array = rng.integers(0, 256, (2048, 1536), dtype=np.uint8)
    record = _RegionOnlyRecord(array)
    rec = PreviewRecord.from_tiled(record, max_edge=512)
    assert len(record.read_boxes) == 0  # nothing materialized at build time
    thumb = rec.thumbnail  # materializes the smallest level
    assert max(thumb.shape[:2]) <= 512
    assert record.read_boxes  # built via region reads
    # every read was a bounded row band, never the full frame
    assert all(b[3] - b[1] <= 4 for b in record.read_boxes)
    dense = PreviewRecord.build(array, max_edge=512).thumbnail
    assert thumb.shape == dense.shape
    # direct box-mean vs iterated halving differ only by per-level rounding
    assert np.abs(thumb.astype(np.int16) - dense.astype(np.int16)).max() <= 2


def test_lazy_pyramid_best_for_uses_shape_without_materializing():
    rng = np.random.default_rng(4)
    array = rng.integers(0, 256, (1024, 1024), dtype=np.uint8)
    record = _RegionOnlyRecord(array)
    rec = PreviewRecord.from_tiled(record, max_edge=128)
    level = rec.best_for(200)
    assert level.scale == 4  # 1024/4 = 256 >= 200, 1024/8 = 128 < 200
    assert not level.materialized
    img = level.image
    assert img.shape[:2] == (256, 256)


def test_coalescing_scheduler_two_computes_for_rapid_updates():
    release = threading.Event()
    seen = []

    def compute(params):
        seen.append(params)
        if len(seen) == 1:
            release.wait(timeout=5.0)

    threads = []

    def submit(work):
        t = threading.Thread(target=work)
        threads.append(t)
        t.start()

    sched = CoalescingPreviewScheduler(compute, submit)
    sched.schedule({"v": 1})  # starts compute #1 (blocks)
    sched.schedule({"v": 2})  # pending
    sched.schedule({"v": 3})  # overwrites pending
    release.set()
    for t in threads:
        t.join(timeout=5.0)
    for t in threads:  # the follow-up compute spawns its own thread
        t.join(timeout=5.0)
    assert sched.computes == 2
    assert seen == [{"v": 1}, {"v": 3}]  # middle update coalesced away
    assert not sched.busy


def test_scheduler_idle_runs_each():
    sched = CoalescingPreviewScheduler(lambda p: None, submit=None)
    sched.schedule(1)
    sched.schedule(2)
    assert sched.computes == 2
