"""Benchmark: fused preprocess-chain throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); its only budget
is the CI streaming test — 3.1 MPix through 2 steps in <3 s on CPU, i.e.
~2.07 MPix*steps/s (tests/test_pipeline_streaming_large.py:166-198).  We
report MPix*steps/s of the 3-step denoise->equalize->contrast chain over a
2048x2048 frame batch, so vs_baseline is directly value/2.07.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MPIX_STEPS_S = 2.07  # reference CI lower bound


def _accelerator_available(timeout: float = 120.0) -> bool:
    """True iff ``jax.devices()`` completes in a fresh process within
    ``timeout`` seconds (a wedged relay hangs instead of raising)."""

    import subprocess
    import sys

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return probe.returncode == 0


def main() -> None:
    import jax

    from yamimageprocessor_tpu.models.stages import flagship_forward

    # A downed accelerator relay makes backend init HANG rather than raise,
    # so probe it in a subprocess with a hard timeout before committing this
    # process to it; fall back to CPU (the metric name records which backend
    # actually ran).  Backend init is lazy, so flipping the platform before
    # the first devices() call is safe.
    if not _accelerator_available():
        jax.config.update("jax_platforms", "cpu")
    try:
        backend = jax.default_backend()
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        backend = jax.default_backend()
    # frame batch sized for a single chip's HBM; uint8 in, uint8 out
    batch, side = (8, 2048) if backend != "cpu" else (2, 512)
    steps = 3
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, side, side), dtype=np.uint8)

    # Iterations run INSIDE one executable (lax.fori_loop with a data
    # dependency) and only a scalar checksum leaves the device: this defeats
    # both async-dispatch elision and host<->device transfer skew (the axon
    # relay in this environment reports block_until_ready before execution
    # finishes, so naive timing loops measure nothing).
    iters = 50 if backend != "cpu" else 3

    def looped(x):
        def body(_, v):
            return flagship_forward(v)

        out = jax.lax.fori_loop(0, iters, body, x)
        return jnp_sum_u64(out)

    import jax.numpy as jnp

    def jnp_sum_u64(v):
        return jnp.sum(v.astype(jnp.uint32))

    fn = jax.jit(looped)
    device_frames = jax.device_put(frames)
    checksum = int(np.asarray(fn(device_frames)))  # compile + warm

    start = time.perf_counter()
    checksum = int(np.asarray(fn(device_frames)))
    elapsed = time.perf_counter() - start
    assert checksum >= 0

    mpix = batch * side * side / 1e6
    value = mpix * steps * iters / elapsed
    print(
        json.dumps(
            {
                "metric": f"preprocess_chain_throughput_{backend}",
                "value": round(value, 2),
                "unit": "MPix*steps/s",
                "vs_baseline": round(value / BASELINE_MPIX_STEPS_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
