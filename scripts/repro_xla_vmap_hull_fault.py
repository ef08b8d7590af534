#!/usr/bin/env python
"""Minimal repro: XLA:TPU worker crash on vmapped hull kernel, non-pow2 batch.

Observed on TPU v5e (JAX via the axon relay, round 3 of this build):
``jax.vmap(regionprops.hull_vertices_j)`` over a stacked label batch
deterministically KILLS the TPU worker process (connection drops, no
Python exception) at batch sizes 3, 5, 6 and 7 with busy label content,
while batch sizes 1, 2, 4 and 8 run clean.  The same program is correct
on the CPU backend at every batch size, and each member frame runs clean
individually — so this is a batch-dimension lowering fault, not bad input.

Production workaround (ops/extraction_device.py:run_tier): pad every
stacked dispatch to the next power of two by repeating the last frame and
drop the padded outputs.  Cost is bounded (< 2x compute worst-case) and it
collapses the distinct compiled batch programs to log2(N).

DO NOT run this on a shared relay mid-session: a positive repro takes the
worker down for every client of the tunnel.  Run it on a directly-attached
chip when filing upstream.

Usage:
    python scripts/repro_xla_vmap_hull_fault.py          # CPU backend: all pass
    python scripts/repro_xla_vmap_hull_fault.py --tpu    # accelerator: b=3 crashes
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# this image force-sets JAX_PLATFORMS to the accelerator via sitecustomize,
# so the safe default must override hard BEFORE the first jax import
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yamimageprocessor_tpu.ops import labeling, regionprops as RP  # noqa: E402

MAX_REGIONS = 64
SIDE = 1024


def busy_labels(seed: int) -> np.ndarray:
    """A dense multi-region label frame like the bench's extraction scene."""
    rng = np.random.default_rng(seed)
    frame = np.zeros((SIDE, SIDE), np.uint8)
    for _ in range(48):
        cy, cx = rng.integers(40, SIDE - 40, size=2)
        r = int(rng.integers(12, 36))
        yy, xx = np.ogrid[:SIDE, :SIDE]
        frame[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 255
    labels = labeling.label_np(frame > 0)
    return np.minimum(labels, MAX_REGIONS).astype(np.int32)


def main() -> None:
    print(f"backend={jax.default_backend()}  devices={len(jax.devices())}")

    def batched(stack):
        return jax.vmap(lambda lab: RP.hull_vertices_j(lab, MAX_REGIONS))(stack)

    fn = jax.jit(batched)
    frames = [busy_labels(s) for s in range(8)]
    for b in (1, 2, 4, 8, 3, 5, 6, 7):  # pow2 first: warm caches, prove content ok
        stack = jnp.asarray(np.stack(frames[:b]))
        verts, nverts = fn(stack)
        jax.block_until_ready((verts, nverts))
        print(f"batch={b}: OK  nverts[0]={np.asarray(nverts[0][:4]).tolist()}")
    print("all batch sizes survived — fault not reproduced on this backend")


if __name__ == "__main__":
    main()
