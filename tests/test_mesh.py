"""Device-mesh execution on the virtual 8-device CPU harness:
frame-sharded batches and row-sharded frames with halo exchange +
collective global statistics (the multi-node-without-a-cluster strategy,
SURVEY §4)."""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.models.stages import preprocess_steps
from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.parallel.mesh import (
    batch_sharded_apply,
    make_mesh,
    spatial_sharded_apply,
)
from yamimageprocessor_tpu.pipeline.manager import PipelineManager
from yamimageprocessor_tpu.pipeline.step import PipelineStep


@pytest.fixture(scope="module")
def mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU harness")
    return make_mesh(8)


@pytest.fixture()
def frames(rng):
    return rng.integers(0, 256, (16, 64, 96), dtype=np.uint8)


def test_batch_sharded_matches_host(mesh, frames):
    steps = preprocess_steps()
    out = batch_sharded_apply(steps, frames, mesh)
    manager = PipelineManager(steps)
    for i in range(frames.shape[0]):
        expected = manager.apply_host(frames[i])
        assert (out[i] == expected).all(), f"frame {i}"


def test_spatial_sharded_stencil_and_global(mesh, rng):
    frame = rng.integers(0, 256, (64 * 8, 96), dtype=np.uint8)
    steps = [
        PipelineStep(
            name="NoiseReduction",
            stage=Stage.PREPROCESSING,
            params={"method": "Gaussian", "ksize": 5},
        ),
        PipelineStep(
            name="histogram_equalization",
            op_id="preprocessing.histogram_equalization",
            stage=Stage.PREPROCESSING,
            params={},
        ),
        PipelineStep(name="Otsu", stage=Stage.SEGMENTATION, params={}),
    ]
    out = spatial_sharded_apply(steps, frame, mesh)
    dense = PipelineManager(steps).apply_host(frame)
    # interior: bit-identical (halo exchange carries real pixels; global
    # stats travel via psum so the Otsu threshold matches everywhere)
    assert (out[8:-8] == dense[8:-8]).all()
    # whole-frame agreement is near-total (first/last shard border rows use
    # the mirrored extension)
    assert (out == dense).mean() > 0.999


def test_spatial_sharded_elementwise_exact_everywhere(mesh, rng):
    frame = rng.integers(0, 256, (64 * 8, 96), dtype=np.uint8)
    steps = [
        PipelineStep(
            name="BrightnessContrast",
            stage=Stage.PREPROCESSING,
            params={"alpha": 1.3, "beta": 5.0},
        ),
        PipelineStep(
            name="Gamma", stage=Stage.PREPROCESSING, params={"value": 1.7}
        ),
    ]
    out = spatial_sharded_apply(steps, frame, mesh)
    dense = PipelineManager(steps).apply_host(frame)
    assert (out == dense).all()


def test_spatial_sharded_rejects_bad_height(mesh, rng):
    frame = rng.integers(0, 256, (100, 64), dtype=np.uint8)
    with pytest.raises(ValueError):
        spatial_sharded_apply(
            [PipelineStep(name="Otsu", stage=Stage.SEGMENTATION)], frame, mesh
        )


def test_spatial_sharded_rejects_host_ops(mesh, rng):
    frame = rng.integers(0, 256, (64 * 8, 64), dtype=np.uint8)
    with pytest.raises(ValueError):
        spatial_sharded_apply(
            [PipelineStep(name="Graph Cuts", stage=Stage.SEGMENTATION)],
            frame,
            mesh,
        )
