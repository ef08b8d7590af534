"""Odd-geometry device==host parity sweep across the deterministic op
families.

Kernel padding/alignment bugs live at awkward shapes (non-multiples of
lane/sublane tiling, tiny frames, extreme aspect ratios) — exactly the
shapes the fixed-size suites never touch.  Every deterministic op runs as
a single-step chain on each geometry through the PRODUCTION dispatch
(PipelineManager.apply -> compiled chain -> device path) against the host
golden; stochastic/solver families (clustering, GrabCut, snake) are
asserted by their own semantic suites instead (SURVEY §4 golden-parity
strategy; reference asserts full-frame equality,
tests/test_pipeline_streaming_large.py:111-133).
"""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.ops.schema import (
    PREPROCESS_OPS,
    SEGMENTATION_OPS,
    Stage,
)
from yamimageprocessor_tpu.pipeline.manager import PipelineManager
from yamimageprocessor_tpu.pipeline.step import PipelineStep
from yamimageprocessor_tpu.services.parity import synthetic_scene

# own-solver / stochastic families: semantic parity only (see
# test_segmentation_advanced.py), pixel equality is not their contract
_SEM_OPS = {
    "segmentation.kmeans",
    "segmentation.fuzzy_cmeans",
    "segmentation.mean_shift",
    "segmentation.gmm",
    "segmentation.graph_cuts",
    "segmentation.active_contour",
}

# documented 1-LSB float classes (float filter rounding; PARITY.md).
# CLAHE: non-divisible frames pad to the grid, and blend-rounding ties at
# exact .5 differ by <=1 LSB between the device's float32 and the golden's
# float64 evaluation orders (test_preprocess_ops.py::test_clahe_matches_cv2_padded)
_TOL1 = {
    "preprocessing.noise_reduction",
    "preprocessing.sharpen",
    "preprocessing.normalize",
    "preprocessing.clahe",
}

_SHAPES = [
    (33, 47),  # tiny, both odd
    (97, 131),  # odd primes
    (16, 259),  # thin + just past a lane boundary
]

_DET_OPS = [
    op
    for op in (PREPROCESS_OPS + SEGMENTATION_OPS)
    if op.identifier not in _SEM_OPS
]


def _operand(op, shape):
    gray, bgr = synthetic_scene(shape)
    # segmentation kernels consume the single-channel stage output
    return gray if op.stage is not Stage.PREPROCESSING else bgr


@pytest.mark.parametrize("shape", _SHAPES, ids=lambda s: f"{s[0]}x{s[1]}")
@pytest.mark.parametrize("op", _DET_OPS, ids=lambda o: o.identifier)
def test_device_matches_host_on_odd_shapes(op, shape):
    frame = _operand(op, shape)
    step = PipelineStep(
        name=op.step_name, op_id=op.identifier, stage=op.stage, params={}
    )
    manager = PipelineManager([step])
    device = np.asarray(manager.apply(frame))
    host = np.asarray(manager.apply_host(frame))
    assert device.shape == host.shape, op.identifier
    tol = 1 if op.identifier in _TOL1 else 0
    diff = np.abs(device.astype(np.int32) - host.astype(np.int32)).max()
    assert diff <= tol, f"{op.identifier} @{shape}: device vs host diff {diff}"
