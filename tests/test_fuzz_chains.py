"""Randomized chain fuzz: the compiled fused chain must stay bit-identical
to sequential golden execution for every random composition of exact ops.

Stresses the chain compiler's segment planning and LUT-run composition
(``pipeline/compiler.py``) the way users actually hit it — arbitrary
enabled-step mixes, thresholds feeding morphology, reshaping crops in the
middle of a chain — rather than the handful of fixed compositions in
test_lut_fusion.py.  All pooled ops are tolerance-class-0 (integer/LUT/
mask exact), so every intermediate output must match exactly.
"""
from __future__ import annotations

import zlib

import numpy as np
import pytest

from tests.test_fuzz_parity import _draw_params, _scene
from yamimageprocessor_tpu.ops.registry import get_impl
from yamimageprocessor_tpu.pipeline.compiler import CompiledChain
from yamimageprocessor_tpu.pipeline.step import PipelineStep

# gray->gray tolerance-0 ops only (chains of exact steps compare exactly)
CHAIN_POOL = [
    "preprocessing.gamma",
    "preprocessing.brightness_contrast",
    "preprocessing.histogram_equalization",
    "segmentation.global_threshold",
    "segmentation.otsu",
    "segmentation.adaptive",
    "segmentation.sobel",
    "segmentation.prewitt",
    "segmentation.laplacian",
    "segmentation.opening",
    "segmentation.closing",
    "segmentation.dilation",
    "segmentation.erosion",
    "segmentation.border_removal",
]


def _median_step(rng):
    return PipelineStep(
        name="noise_reduction",
        op_id="preprocessing.noise_reduction",
        params={"method": "Median", "ksize": int(rng.integers(1, 4)) * 2 + 1},
    )


def _golden_sequential(image, steps):
    outs = []
    cur = image
    for s in steps:
        cur = get_impl(s.op_id).golden_fn(cur, **s.params)
        outs.append(cur)
    return outs


@pytest.mark.parametrize("chain_seed", range(16))
def test_fuzzed_chain_matches_sequential_golden(chain_seed):
    rng = np.random.default_rng(zlib.crc32(b"chain") + chain_seed)
    shape = [(97, 131), (64, 96), (33, 259), (128, 160)][chain_seed % 4]
    img = _scene(shape, rng, color=False)

    steps = []
    length = int(rng.integers(2, 5))
    cur_shape = img.shape[:2]  # params clamp to the shape the step SEES
    for pos in range(length):
        roll = rng.random()
        if roll < 0.1:
            steps.append(_median_step(rng))
        elif roll < 0.2 and pos > 0:
            # reshaping op mid-chain: crop geometry from the CURRENT shape
            params = _draw_params("preprocessing.crop", cur_shape, rng)
            steps.append(
                PipelineStep(name="crop", op_id="preprocessing.crop", params=params)
            )
        else:
            op = CHAIN_POOL[int(rng.integers(len(CHAIN_POOL)))]
            params = _draw_params(op, cur_shape, rng)
            steps.append(
                PipelineStep(name=op.split(".")[-1], op_id=op, params=params)
            )
        cur_shape = _golden_sequential(img, steps)[-1].shape[:2]

    chain = CompiledChain(steps, img.shape, img.dtype)
    outs = [np.asarray(o) for o in chain.run(img)]
    goldens = _golden_sequential(img, steps)
    assert len(outs) == len(goldens)
    for i, (got, want) in enumerate(zip(outs, goldens)):
        np.testing.assert_array_equal(
            got,
            want,
            err_msg=(
                f"chain {chain_seed} step {i} ({steps[i].op_id} "
                f"{steps[i].params}) diverged"
            ),
        )


# the streaming test's fake: its to_array() RAISES, so this fuzz also
# proves the random chains never materialize the source
from tests.test_pipeline_streaming import _SyntheticStreamingRecord as _Record


STREAM_POOL = [
    "preprocessing.gamma",
    "preprocessing.brightness_contrast",
    "preprocessing.histogram_equalization",  # global stats -> two-pass
    "segmentation.global_threshold",
    "segmentation.otsu",  # global stats -> two-pass
    "segmentation.sobel",  # halo
    "segmentation.prewitt",
    "segmentation.laplacian",
    "segmentation.opening",  # iterated halo
    "segmentation.closing",
    "segmentation.dilation",
    "segmentation.erosion",
]

TILE_SIZES = [(32, 32), (48, 40), (33, 57), (64, 128), (17, 96)]


@pytest.mark.parametrize("stream_seed", range(6))
def test_fuzzed_streaming_matches_dense(stream_seed):
    """Tiled streaming (halo exchange + two-pass global stats) must equal
    the dense sequential golden bit-for-bit at arbitrary tile geometries —
    the repo's halo-correctness claim, fuzzed."""

    from yamimageprocessor_tpu.parallel.tiling import stream_steps_tiled

    rng = np.random.default_rng(zlib.crc32(b"stream") + stream_seed)
    shape = [(97, 131), (96, 128), (65, 200)][stream_seed % 3]
    img = _scene(shape, rng, color=False)

    steps = []
    for _ in range(int(rng.integers(2, 4))):
        if rng.random() < 0.15:
            steps.append(_median_step(rng))
        else:
            op = STREAM_POOL[int(rng.integers(len(STREAM_POOL)))]
            steps.append(
                PipelineStep(
                    name=op.split(".")[-1],
                    op_id=op,
                    params=_draw_params(op, shape, rng),
                )
            )

    golden = _golden_sequential(img, steps)[-1]
    out = np.zeros_like(golden)
    tile = TILE_SIZES[int(rng.integers(len(TILE_SIZES)))]

    def paste(box, data):
        left, top, right, bottom = box
        out[top:bottom, left:right, ...] = data

    stream_steps_tiled(steps, _Record(img), paste, tile_size=tile)
    np.testing.assert_array_equal(
        out,
        golden,
        err_msg=(
            f"stream {stream_seed} tile={tile} "
            f"chain={[(s.op_id, s.params) for s in steps]}"
        ),
    )


ND_SHAPES = [
    (4, 49, 67),        # T,H,W gray stack
    (3, 2, 40, 56),     # T,Z,H,W
    (5, 33, 41, 3),     # T,H,W,BGR
]


@pytest.mark.parametrize("nd_seed", range(6))
def test_fuzzed_nd_stack_matches_per_plane_golden(nd_seed):
    """ND stacks take the flattened-vmap device path (every leading axis
    batched, planes stay 2-D/BGR items); each plane must bit-match running
    the golden chain on that plane alone — the reference's slice-wise
    contract (processing/pipeline_manager.py:467-492), fuzzed."""

    from yamimageprocessor_tpu.pipeline.manager import PipelineManager

    rng = np.random.default_rng(zlib.crc32(b"nd") + nd_seed)
    shape = ND_SHAPES[nd_seed % len(ND_SHAPES)]
    color = shape[-1] == 3
    img = rng.integers(0, 256, shape, dtype=np.uint8)

    plane_shape = shape[-3:-1] if color else shape[-2:]
    pool = [
        op
        for op in CHAIN_POOL
        if not (color and op == "preprocessing.histogram_equalization")
    ]
    steps = []
    for _ in range(int(rng.integers(2, 4))):
        if rng.random() < 0.2:
            steps.append(_median_step(rng))
        else:
            op = pool[int(rng.integers(len(pool)))]
            steps.append(
                PipelineStep(
                    name=op.split(".")[-1],
                    op_id=op,
                    params=_draw_params(op, plane_shape, rng),
                )
            )

    out = PipelineManager(steps).apply(img)
    item_nd = 3 if color else 2
    leading = img.shape[: img.ndim - item_nd]
    # ops may change plane arity (BGR op chain ending in a mask drops the
    # channel axis) but never the stack axes
    assert out.shape[: len(leading)] == leading, (out.shape, img.shape)
    flat_in = img.reshape((-1,) + img.shape[len(leading):])
    flat_out = out.reshape((-1,) + out.shape[len(leading):])
    assert flat_out.shape[0] == flat_in.shape[0]
    for p in range(flat_in.shape[0]):
        want = _golden_sequential(flat_in[p], steps)[-1]
        np.testing.assert_array_equal(
            flat_out[p],
            want,
            err_msg=(
                f"nd {nd_seed} plane {p} shape={shape} "
                f"chain={[(s.op_id, s.params) for s in steps]}"
            ),
        )
