#!/usr/bin/env python
"""Regression check: vmapped extraction bundle at every batch size 1..8.

History: round 3's hull kernel (a while-loop Andrew chain with per-lane
scatters) deterministically KILLED the XLA:TPU worker when vmapped at
non-power-of-two batch sizes (3/5/6/7 faulted, 1/2/4/8 ran clean on v5e),
forcing the mass-extraction path to pad every stacked dispatch to the next
power of two and discard the padding.  Round 4 replaced that kernel with a
scatter-free gift-wrapping area kernel (``regionprops.hull_pixel_areas_j``)
and removed the padding.  This script is the regression gate: it runs the
production batched bundle (``extraction_device.region_packed_j``) at every
batch size with busy label content and verifies features against the host
golden — if a backend upgrade ever re-introduces a batch-dimension fault,
this is the first thing to re-run.

Expected runtime: each batch size compiles its own program (~20-60 s per
size on a slow compile service, a few seconds locally); the full 8-size
sweep can take several minutes with no output between sizes.

Usage:
    python scripts/check_nonpow2_batches.py          # CPU backend
    python scripts/check_nonpow2_batches.py --tpu    # accelerator
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# this image force-sets JAX_PLATFORMS to the accelerator via sitecustomize
# (which wins over the env var), so the safe default must override through
# jax.config BEFORE anything traces.  Only when run AS A SCRIPT — pytest
# imports this module for run_sweep() and must keep its own backend choice.
import jax  # noqa: E402

if __name__ == "__main__":
    if "--tpu" not in sys.argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    else:
        from yamimageprocessor_tpu.utils.jaxcache import enable_persistent_cache

        enable_persistent_cache()  # bounds the 8 batch-size compiles to once

import jax.numpy as jnp  # noqa: E402

from yamimageprocessor_tpu.ops import extraction_device as XD  # noqa: E402
from yamimageprocessor_tpu.ops import labeling, regionprops as RP  # noqa: E402

SIDE = 1024


def busy_frame(seed: int) -> np.ndarray:
    """A dense multi-cell grayscale frame like the bench's extraction scene."""
    rng = np.random.default_rng(seed)
    frame = np.zeros((SIDE, SIDE), np.uint8)
    for _ in range(48):
        cy, cx = rng.integers(40, SIDE - 40, size=2)
        r = int(rng.integers(12, 36))
        yy, xx = np.ogrid[:SIDE, :SIDE]
        frame[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 255
    return frame


def run_sweep(batch_sizes=(1, 2, 4, 8, 3, 5, 6, 7), verbose: bool = True) -> None:
    """Run the production batched bundle at each batch size and assert
    bit-exact solidity/count vs the host golden.  Importable so the
    ``YAM_TPU_TESTS=1`` pytest tier runs the same sweep the script does
    (tests/test_performance_budgets.py::test_tpu_nonpow2_batch_sweep)."""

    frames = [busy_frame(s) for s in range(max(batch_sizes))]
    goldens = []
    for f in frames:
        labels = labeling.label_np(f > 0)
        meas = RP.measure_np(labels)
        goldens.append((meas, RP.solidity_np(labels, meas)))

    fn = XD._jitted_region_packed_batch(XD.FAST_REGIONS)
    for b in batch_sizes:  # pow2 first: prove content is fine
        stack = jnp.asarray(np.stack(frames[:b]))
        labels_b, bundles_b = fn(stack)
        bundles = np.asarray(bundles_b)  # forces execution + D2H
        for k in range(b):
            table = XD._finalize_region_table(
                bundles[k], labels_b[k], XD.FAST_REGIONS
            )
            meas, sol = goldens[k]
            assert not table.get("saturated"), f"batch={b} frame={k} saturated"
            assert table["meas"].count == meas.count, f"batch={b} frame={k}"
            np.testing.assert_array_equal(table["solidity"], sol)
        # flush per size: if the worker dies mid-sweep, the log must show
        # which batch size was in flight
        if verbose:
            print(f"batch={b}: OK  regions={goldens[0][0].count}", flush=True)


def main() -> None:
    print(
        f"backend={jax.default_backend()}  devices={len(jax.devices())}",
        flush=True,
    )
    run_sweep()
    print(
        "all batch sizes survived with bit-exact solidity — no padding needed",
        flush=True,
    )


if __name__ == "__main__":
    main()
