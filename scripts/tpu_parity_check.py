#!/usr/bin/env python
"""One-shot CPU<->TPU parity audit on real hardware.

Runs every device-capable op on the attached accelerator and compares
against the numpy golden twin — the hardware-side counterpart of the CPU
test suite's parity assertions.  Exit code 0 iff every op meets its
documented parity class (bit-exact for integer/mask ops, <=1 LSB for float
filter ops).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


CASES = [
    # (identifier, params, tolerance)
    ("preprocessing.grayscale", {}, 0),
    ("preprocessing.brightness_contrast", {"alpha": 1.4, "beta": 7.0}, 0),
    ("preprocessing.gamma", {"value": 2.2}, 0),
    ("preprocessing.histogram_equalization", {}, 0),
    ("preprocessing.normalize", {"alpha": 10.0, "beta": 240.0}, 1),
    ("preprocessing.noise_reduction", {"method": "Gaussian", "ksize": 5}, 1),
    ("preprocessing.noise_reduction", {"method": "Median", "ksize": 5}, 0),
    ("preprocessing.sharpen", {"strength": 1.0}, 1),
    ("preprocessing.select_channel", {"value": "RG"}, 0),
    ("preprocessing.clahe", {"clip_limit": 2.0, "grid_size": 8}, 0),
    ("segmentation.global_threshold", {"threshold": 127}, 0),
    ("segmentation.otsu", {}, 0),
    ("segmentation.adaptive", {"block_size": 11, "C": 2}, 0),
    ("segmentation.edge", {"low_threshold": 50, "high_threshold": 150, "aperture_size": 3}, 0),
    ("segmentation.sobel", {"ksize": 3}, 0),
    ("segmentation.prewitt", {}, 0),
    ("segmentation.laplacian", {"ksize": 3}, 0),
    ("segmentation.opening", {"kernel_shape": "Elliptical", "kernel_size": 5, "iterations": 2}, 0),
    ("segmentation.erosion", {"kernel_shape": "Cross", "kernel_size": 3, "iterations": 1}, 0),
    ("segmentation.border_removal", {"border_distance": 10}, 0),
    ("segmentation.region_growing", {"seed": (40, 40), "tolerance": 12}, 0),
    ("segmentation.watershed", {"kernel_size": 3, "opening_iterations": 2,
                                "dilation_iterations": 3,
                                "distance_threshold_factor": 0.7}, 0),
]


def main() -> int:
    import bench

    if not bench._accelerator_available():
        print("accelerator backend unavailable (relay down?) — aborting "
              "instead of hanging; re-run when jax.devices() responds")
        return 2

    import jax
    import jax.numpy as jnp

    from yamimageprocessor_tpu.ops.registry import get_impl

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(7)
    gray = np.zeros((128, 160), np.uint8)
    yy, xx = np.mgrid[:128, :160]
    for cy, cx, r, v in ((30, 40, 18, 210), (80, 100, 22, 180), (90, 30, 14, 230)):
        gray[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = v
    gray = (gray.astype(np.int16) + rng.integers(-10, 11, gray.shape)).clip(0, 255).astype(np.uint8)
    bgr = np.repeat(gray[..., None], 3, axis=-1)
    bgr[..., 1] = np.roll(gray, 3, axis=1)

    failures = 0
    for identifier, params, tol in CASES:
        impl = get_impl(identifier)
        image = bgr if "channel" in identifier or "grayscale" in identifier else gray
        if identifier in ("segmentation.otsu", "segmentation.watershed"):
            image = bgr
        golden = impl.golden_fn(image, **params)
        static, dyn = impl.split_params(params, image.shape)
        dyn_j = {k: jnp.asarray(v) for k, v in dyn.items()}
        device = np.asarray(impl.device_fn(jnp.asarray(image), dyn_j, **static))
        diff = np.abs(device.astype(np.int64) - golden.astype(np.int64)).max()
        status = "OK " if diff <= tol else "FAIL"
        if diff > tol:
            failures += 1
        print(f"{status} {identifier:44s} maxdiff={diff} (tol {tol}) {params}")

    # odd shapes exercise pallas block overhang (histogram padding) and the
    # correctly-rounded f32 255/remainder divide in the equalization LUT
    histeq = get_impl("preprocessing.histogram_equalization")
    for shape in ((7, 13), (1000, 1003), (129, 255)):
        image = rng.integers(0, 256, shape, dtype=np.uint8)
        golden = histeq.golden_fn(image)
        device = np.asarray(histeq.device_fn(jnp.asarray(image), {}))
        diff = np.abs(device.astype(np.int64) - golden.astype(np.int64)).max()
        status = "OK " if diff == 0 else "FAIL"
        if diff:
            failures += 1
        print(f"{status} histeq odd shape {shape}: maxdiff={diff} (tol 0)")

    print("PARITY:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
