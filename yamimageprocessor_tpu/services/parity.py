"""Device<->golden parity audit, runnable in-process on real hardware.

The CPU test-suite asserts device==golden through the jax CPU backend; this
module re-runs the same assertions against whatever accelerator backend is
actually attached (Mosaic/Pallas kernels included), so every bench run
re-verifies hardware parity (the numbers and the parity come from the same
process).  Reference parity classes: bit-exact for integer/mask ops
(``core/segmentation.py``), <=1 LSB for float filter ops
(``core/preprocessing.py:50-151``).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

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
    # clahe blend: f32 device interpolation vs f64 golden rounds +-1 at
    # exact .5 boundaries (tile hists and LUTs are bit-exact)
    ("preprocessing.clahe", {"clip_limit": 2.0, "grid_size": 8}, 1),
    ("segmentation.global_threshold", {"threshold": 127}, 0),
    ("segmentation.otsu", {}, 0),
    ("segmentation.adaptive", {"block_size": 11, "C": 2}, 0),
    (
        "segmentation.edge",
        {"low_threshold": 50, "high_threshold": 150, "aperture_size": 3},
        0,
    ),
    ("segmentation.sobel", {"ksize": 3}, 0),
    ("segmentation.prewitt", {}, 0),
    ("segmentation.laplacian", {"ksize": 3}, 0),
    (
        "segmentation.opening",
        {"kernel_shape": "Elliptical", "kernel_size": 5, "iterations": 2},
        0,
    ),
    (
        "segmentation.erosion",
        {"kernel_shape": "Cross", "kernel_size": 3, "iterations": 1},
        0,
    ),
    ("segmentation.border_removal", {"border_distance": 10}, 0),
    ("segmentation.region_growing", {"seed": (40, 40), "tolerance": 12}, 0),
    (
        "segmentation.watershed",
        {
            "kernel_size": 3,
            "opening_iterations": 2,
            "dilation_iterations": 3,
            "distance_threshold_factor": 0.7,
        },
        0,
    ),
]


def synthetic_scene(
    shape: Tuple[int, int] = (128, 160), seed: int = 7
) -> Tuple[np.ndarray, np.ndarray]:
    """(gray, bgr) noisy multi-blob test frame used by every parity case."""

    rng = np.random.default_rng(seed)
    gray = np.zeros(shape, np.uint8)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    blobs = ((30, 40, 18, 210), (80, 100, 22, 180), (90, 30, 14, 230))
    for cy, cx, r, v in blobs:
        gray[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = v
    gray = (
        (gray.astype(np.int16) + rng.integers(-10, 11, gray.shape))
        .clip(0, 255)
        .astype(np.uint8)
    )
    bgr = np.repeat(gray[..., None], 3, axis=-1)
    bgr[..., 1] = np.roll(gray, 3, axis=1)
    return gray, bgr


def run_parity_cases(
    report: Optional[Callable[[str], None]] = None,
) -> Tuple[int, int]:
    """Run every case on the current backend; returns (passed, total)."""

    import jax.numpy as jnp

    from yamimageprocessor_tpu.ops.registry import get_impl

    emit = report or (lambda line: None)
    gray, bgr = synthetic_scene()
    rng = np.random.default_rng(11)

    passed = 0
    total = 0
    failures: List[str] = []
    for identifier, params, tol in CASES:
        impl = get_impl(identifier)
        image = gray
        if (
            "channel" in identifier
            or "grayscale" in identifier
            or identifier in ("segmentation.otsu", "segmentation.watershed")
        ):
            image = bgr
        golden = impl.golden_fn(image, **params)
        static, dyn = impl.split_params(params, image.shape)
        dyn_j = {k: jnp.asarray(v) for k, v in dyn.items()}
        device = np.asarray(impl.device_fn(jnp.asarray(image), dyn_j, **static))
        diff = int(np.abs(device.astype(np.int64) - golden.astype(np.int64)).max())
        total += 1
        ok = diff <= tol
        passed += ok
        if not ok:
            failures.append(identifier)
        emit(f"{'OK ' if ok else 'FAIL'} {identifier:44s} maxdiff={diff} (tol {tol})")

    # odd shapes exercise pallas block overhang (histogram padding) and the
    # correctly-rounded f32 255/remainder divide in the equalization LUT
    histeq = get_impl("preprocessing.histogram_equalization")
    for shape in ((7, 13), (1000, 1003), (129, 255)):
        image = rng.integers(0, 256, shape, dtype=np.uint8)
        golden = histeq.golden_fn(image)
        device = np.asarray(histeq.device_fn(jnp.asarray(image), {}))
        diff = int(np.abs(device.astype(np.int64) - golden.astype(np.int64)).max())
        total += 1
        passed += diff == 0
        emit(f"{'OK ' if diff == 0 else 'FAIL'} histeq odd shape {shape}: maxdiff={diff}")

    # the CLAHE pallas fast path needs tiles >= 256 wide (clahe_j gate) —
    # the shared 128x160 scene never reaches it, so audit it explicitly
    # (measured bit-exact vs the f64 golden on hardware)
    clahe = get_impl("preprocessing.clahe")
    wide = rng.integers(0, 256, (256, 2048), dtype=np.uint8)
    golden = clahe.golden_fn(wide, clip_limit=2.0, grid_size=8)
    static, dyn = clahe.split_params(
        {"clip_limit": 2.0, "grid_size": 8}, wide.shape
    )
    device = np.asarray(
        clahe.device_fn(
            jnp.asarray(wide), {k: jnp.asarray(v) for k, v in dyn.items()}, **static
        )
    )
    diff = int(np.abs(device.astype(np.int64) - golden.astype(np.int64)).max())
    total += 1
    passed += diff == 0
    emit(f"{'OK ' if diff == 0 else 'FAIL'} clahe fast path 256x2048: maxdiff={diff}")
    return passed, total


__all__ = ["CASES", "run_parity_cases", "synthetic_scene"]
