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


# ---------------------------------------------------------------------------
# BASELINE-size budgets on the real accelerator (skipped off-TPU).  Floors
# are set ~40% under the numbers measured on a v5e chip (BENCH_r02 /
# docs/PARITY.md) so regressions in the hard paths fail a marked test
# instead of silently rotting, while relay jitter doesn't flake them.


def _tpu_or_skip():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("BASELINE budgets require the TPU backend")
    return jax


def _dense_scene(side: int, seed: int = 3) -> np.ndarray:
    # the SAME fixture bench.py measures (budget floors are calibrated
    # against its numbers) — import, don't fork
    from bench import _dense_scene as bench_scene

    return bench_scene(side, seed)


def test_tpu_preprocess_chain_budget(rng):
    """BASELINE configs 1-2: the flagship chain on an 8x2048^2 batch must
    sustain >= 8 GPix*steps/s single chip (measured 16.6)."""

    jax = _tpu_or_skip()
    import jax.numpy as jnp

    from yamimageprocessor_tpu.models.stages import flagship_chain

    frames = rng.integers(0, 256, (8, 2048, 2048), dtype=np.uint8)
    fn, dyn = flagship_chain(frames.shape, frames.dtype)
    iters = 20

    @jax.jit
    def looped(x):
        # chained passes inside one dispatch, exactly like bench.py's
        # checksum loop: sustained chain throughput, not relay latency
        def body(_, v):
            return fn(v, dyn)[-1]

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.uint32))

    dev = jax.device_put(frames)
    int(np.asarray(looped(dev)))
    start = time.monotonic()
    checksum = int(np.asarray(looped(dev)))
    elapsed = time.monotonic() - start
    assert checksum >= 0
    rate = iters * 8 * 2048 * 2048 * 3 / 1e9 / elapsed
    # ~0.5x the 33-34 GPix*steps/s measured in rounds 3-4 so a real
    # regression fails while relay jitter doesn't flake
    assert rate > 16.0, f"{rate:.2f} GPix*steps/s"


def test_tpu_watershed_4096_budget():
    """BASELINE config 3 at full size: threshold+open+close+watershed on a
    4096^2 dense scene in bounded wall time (cv2 reference: 2.3s @4096^2
    on host)."""

    jax = _tpu_or_skip()
    import jax.numpy as jnp

    from yamimageprocessor_tpu.pipeline.compiler import get_compiled_chain

    frame = _dense_scene(4096)
    steps = segmentation_steps(watershed=True)
    chain = get_compiled_chain(steps, frame.shape, frame.dtype)
    fn, dyn = chain.pure_callable()

    @jax.jit
    def run(x):
        return jnp.sum(fn(x, dyn)[-1].astype(jnp.uint32))

    dev = jax.device_put(frame)
    int(np.asarray(run(dev)))
    start = time.monotonic()
    out = run(dev)
    jax.block_until_ready(out)
    elapsed = time.monotonic() - start
    # round-3 measured 0.064-0.084 s; 0.8 keeps ~10x headroom for relay
    # variance while still catching any regression back toward the old
    # 0.30 s (round 2) or the 2.3 s BASELINE budget
    assert elapsed < 0.8, f"4096^2 segmentation chain took {elapsed:.2f}s"


def test_tpu_segmentation_2048_fps_budget():
    """BASELINE config 3 headline: 2048^2 dense-scene chain >= 3 fps
    (measured ~4.6)."""

    jax = _tpu_or_skip()
    import jax.numpy as jnp

    from yamimageprocessor_tpu.pipeline.compiler import get_compiled_chain

    frame = _dense_scene(2048)
    steps = segmentation_steps(watershed=True)
    chain = get_compiled_chain(steps, frame.shape, frame.dtype)
    fn, dyn = chain.pure_callable()

    @jax.jit
    def run(x):
        return jnp.sum(fn(x, dyn)[-1].astype(jnp.uint32))

    dev = jax.device_put(frame)
    int(np.asarray(run(dev)))
    reps = 3
    start = time.monotonic()
    outs = [run(dev) for _ in range(reps)]
    jax.block_until_ready(outs)
    elapsed = time.monotonic() - start
    # round-4 measured ~94 fps; 45 is ~0.5x measured so a real regression
    # (e.g. back to round-2's 17.5 fps) fails while relay variance doesn't
    assert reps / elapsed > 45.0, f"{reps / elapsed:.2f} fps"


def test_tpu_extraction_budget():
    """BASELINE config 4: region_properties data path on a 1024^2 dense
    scene (round-4 measured ~27.7 MPix/s; floor ~0.5x so a regression back
    toward the round-3 9.4 MPix/s fails)."""

    _tpu_or_skip()

    from yamimageprocessor_tpu.ops.registry import get_impl

    from yamimageprocessor_tpu.ops import extraction_device as XD

    frame = _dense_scene(1024)
    bgr = np.repeat(frame[..., None], 3, axis=-1)
    impl = get_impl("extraction.region_properties")
    impl.data_fn(bgr)  # warm
    XD._TABLE_CACHE.clear()  # gate the DEVICE path, not the table memo
    start = time.monotonic()
    df = impl.data_fn(bgr)
    elapsed = time.monotonic() - start
    assert len(df) > 0
    rate = 1024 * 1024 / 1e6 / elapsed
    assert rate > 12.0, f"{rate:.2f} MPix/s"


def test_tpu_nonpow2_batch_sweep():
    """Regression gate for the round-3 XLA:TPU vmapped-hull worker fault:
    the production batched extraction bundle must survive every batch size
    1..8 (non-pow2 included) with bit-exact solidity — no padding.  Wired
    into the YAM_TPU_TESTS tier per round-4 verdict so a backend upgrade
    can't silently regress it between manual runs of
    scripts/check_nonpow2_batches.py."""

    _tpu_or_skip()

    import sys
    from pathlib import Path

    scripts = str(Path(__file__).resolve().parent.parent / "scripts")
    if scripts not in sys.path:
        sys.path.insert(0, scripts)
    from check_nonpow2_batches import run_sweep

    run_sweep(verbose=False)


def test_tpu_gigapixel_streaming_budget(rng):
    """BASELINE config 5 shape: an 8192^2 source with a global-stats chain
    streams through the uniform batched path without materializing, in
    bounded wall time (relay-link bound; the budget catches structural
    regressions like per-tile dispatch storms)."""

    _tpu_or_skip()

    from yamimageprocessor_tpu.models.stages import preprocess_steps
    from yamimageprocessor_tpu.parallel.tiling import stream_steps_tiled

    side = 8192
    data = rng.integers(0, 256, (side, side), dtype=np.uint8)

    class Src:
        shape = data.shape
        tile_size = (2048, 2048)

        def infer_shape(self):
            return data.shape

        def read_region(self, box):
            left, top, right, bottom = box
            return data[top:bottom, left:right]

        def to_array(self):
            raise AssertionError("gigapixel source must not materialize")

    seen = []
    stream_steps_tiled(preprocess_steps(), Src(), lambda b, t: seen.append(b))
    assert len(seen) == 16
    start = time.monotonic()
    seen.clear()
    stream_steps_tiled(preprocess_steps(), Src(), lambda b, t: seen.append(b))
    elapsed = time.monotonic() - start
    assert len(seen) == 16
    assert elapsed < 60.0, f"8192^2 streaming took {elapsed:.1f}s"
