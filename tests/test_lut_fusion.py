"""LUT-run composition in the chain compiler.

Consecutive LUT-expressible steps (gamma, brightness/contrast, grayscale
hist-eq — the reference applies these as independent full-frame passes,
``core/preprocessing.py:59-79``) compose into one table application.
Composition is exact on uint8 (``L2[L1[v]]`` per level), so every step's
output must stay bit-identical to sequential execution.
"""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.ops.registry import get_impl
from yamimageprocessor_tpu.pipeline.compiler import CompiledChain
from yamimageprocessor_tpu.pipeline.step import PipelineStep


def _step(op_id: str, **params):
    return PipelineStep(
        name=op_id.split(".")[-1], op_id=op_id, params=params
    )


def _golden_sequential(image, steps):
    outs = []
    cur = image
    for s in steps:
        impl = get_impl(s.op_id)
        cur = impl.golden_fn(cur, **s.params)
        outs.append(cur)
    return outs


@pytest.fixture()
def gray():
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, (96, 128), np.uint8)


def test_value_lut_run_composes_and_matches(gray):
    steps = [
        _step("preprocessing.gamma", value=0.7),
        _step("preprocessing.brightness_contrast", alpha=1.4, beta=-20.0),
        _step("preprocessing.gamma", value=1.8),
    ]
    chain = CompiledChain(steps, gray.shape, gray.dtype)
    assert chain.lut_runs[0] == {0: 3}
    outs = [np.asarray(o) for o in chain.run(gray)]
    for got, want in zip(outs, _golden_sequential(gray, steps)):
        np.testing.assert_array_equal(got, want)


def test_histeq_opens_but_cannot_extend_a_run(gray):
    steps = [
        _step("preprocessing.brightness_contrast", alpha=1.2, beta=5.0),
        _step("preprocessing.histogram_equalization"),
        _step("preprocessing.gamma", value=1.3),
    ]
    chain = CompiledChain(steps, gray.shape, gray.dtype)
    # hist-eq's table derives from its input image, so it may only OPEN a
    # run: brightness stays solo, [hist-eq, gamma] fuse
    assert chain.lut_runs[0] == {1: 2}
    outs = [np.asarray(o) for o in chain.run(gray)]
    for got, want in zip(outs, _golden_sequential(gray, steps)):
        np.testing.assert_array_equal(got, want)


def test_color_histeq_is_not_fused():
    rng = np.random.default_rng(3)
    bgr = rng.integers(0, 256, (64, 80, 3), np.uint8)
    steps = [
        _step("preprocessing.histogram_equalization"),
        _step("preprocessing.gamma", value=0.9),
    ]
    chain = CompiledChain(steps, bgr.shape, bgr.dtype)
    # the color path is a YCrCb luma round-trip, not a LUT on BGR values
    assert chain.lut_runs[0] == {}
    outs = [np.asarray(o) for o in chain.run(bgr)]
    for got, want in zip(outs, _golden_sequential(bgr, steps)):
        np.testing.assert_array_equal(got, want)


def test_disabled_step_breaks_a_run(gray):
    steps = [
        _step("preprocessing.gamma", value=0.8),
        _step("preprocessing.brightness_contrast", alpha=1.1, beta=0.0),
        _step("preprocessing.gamma", value=1.4),
    ]
    steps[1].enabled = False
    chain = CompiledChain(steps, gray.shape, gray.dtype)
    assert chain.lut_runs[0] == {}
    outs = chain.run(gray)
    impl = get_impl("preprocessing.gamma")
    want0 = impl.golden_fn(gray, value=0.8)
    np.testing.assert_array_equal(np.asarray(outs[0]), want0)
    np.testing.assert_array_equal(np.asarray(outs[1]), want0)
    np.testing.assert_array_equal(
        np.asarray(outs[2]), impl.golden_fn(want0, value=1.4)
    )


def test_batched_run_matches(gray):
    frames = np.stack([gray, gray[::-1].copy(), np.roll(gray, 7, 1)])
    steps = [
        _step("preprocessing.histogram_equalization"),
        _step("preprocessing.brightness_contrast", alpha=1.3, beta=3.0),
    ]
    chain = CompiledChain(steps, frames.shape, frames.dtype, batch=3)
    assert chain.lut_runs[0] == {0: 2}
    outs = [np.asarray(o) for o in chain.run(frames)]
    for k in range(3):
        for got, want in zip(
            [o[k] for o in outs], _golden_sequential(frames[k], steps)
        ):
            np.testing.assert_array_equal(got, want)


def test_histogram256_lane_grouped_parity():
    """Grouped CSA (8 tiles per vreg row) must bincount-match for odd tile
    counts and non-aligned pixel counts — run through the ACTUAL kernel in
    interpreter mode so the pad_px / pad_tiles / row-padding corrections
    are exercised (the CPU fallback would otherwise bypass them)."""

    import jax.numpy as jnp

    from yamimageprocessor_tpu.pallas_kernels import histogram256_lane_grouped

    rng = np.random.default_rng(21)
    for n, px in ((3, 1024), (8, 2048), (11, 1000), (16, 8192), (9, 12345)):
        tiles = rng.integers(0, 256, (n, px), dtype=np.uint8)
        got = np.asarray(
            histogram256_lane_grouped(jnp.asarray(tiles), interpret=True)
        )
        want = np.stack(
            [np.bincount(tiles[i], minlength=256) for i in range(n)]
        )
        assert (got == want).all(), (n, px)
        # the production non-interpret entry (CPU fallback off-TPU)
        fb = np.asarray(histogram256_lane_grouped(jnp.asarray(tiles)))
        assert (fb == want).all(), (n, px)


def test_histogram256_swar_decode_adversarial():
    """SWAR-decode edge cases through the real kernel (interpret mode):
    constant-255 tiles drive plane bit 31 (the arithmetic-shift masking)
    and single-bin counts of 65536 > 2^15 drive the hi-half mask — both
    would corrupt silently if either mask regressed."""

    import jax.numpy as jnp

    from yamimageprocessor_tpu.pallas_kernels import histogram256_lane_grouped

    for value in (0, 128, 200, 255):
        tiles = np.full((9, 256 * 256), value, np.uint8)
        got = np.asarray(
            histogram256_lane_grouped(jnp.asarray(tiles), interpret=True)
        )
        want = np.zeros((9, 256), np.int64)
        want[:, value] = 256 * 256
        assert (got == want).all(), value
