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


def main() -> None:
    import jax

    from yamimageprocessor_tpu.models.stages import flagship_forward

    backend = jax.default_backend()
    # frame batch sized for a single chip's HBM; uint8 in, uint8 out
    batch, side = (8, 2048) if backend != "cpu" else (2, 512)
    steps = 3
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, side, side), dtype=np.uint8)

    fn = jax.jit(flagship_forward)
    device_frames = jax.device_put(frames)
    out = fn(device_frames)
    out.block_until_ready()  # compile + warm

    iters = 20 if backend != "cpu" else 3
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(device_frames)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

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
