"""Canonical stage chains — the benchmark/flagship configurations.

These correspond to BASELINE.md's headline configs: the 3-step preprocess
chain (denoise -> equalize -> contrast), the segmentation chain
(threshold -> morphology -> watershed), and the combined pipeline.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from yamimageprocessor_tpu.ops.schema import Stage
from yamimageprocessor_tpu.pipeline.step import PipelineStep


def preprocess_steps(
    *,
    alpha: float = 1.2,
    beta: float = 4.0,
    ksize: int = 5,
    equalize: bool = True,
) -> List[PipelineStep]:
    """Denoise -> histogram equalize -> brightness/contrast."""

    steps = [
        PipelineStep(
            name="NoiseReduction",
            stage=Stage.PREPROCESSING,
            params={"method": "Gaussian", "ksize": ksize},
        ),
    ]
    if equalize:
        steps.append(
            PipelineStep(
                name="histogram_equalization",
                op_id="preprocessing.histogram_equalization",
                stage=Stage.PREPROCESSING,
                params={},
            )
        )
    steps.append(
        PipelineStep(
            name="BrightnessContrast",
            stage=Stage.PREPROCESSING,
            params={"alpha": alpha, "beta": beta},
        )
    )
    return steps


def segmentation_steps(*, watershed: bool = True) -> List[PipelineStep]:
    """Threshold -> open -> close [-> watershed]."""

    steps = [
        PipelineStep(name="Otsu", stage=Stage.SEGMENTATION, params={}),
        PipelineStep(
            name="Opening",
            stage=Stage.SEGMENTATION,
            params={"kernel_shape": "Rectangular", "kernel_size": 3, "iterations": 2},
        ),
        PipelineStep(
            name="Closing",
            stage=Stage.SEGMENTATION,
            params={"kernel_shape": "Rectangular", "kernel_size": 3, "iterations": 1},
        ),
    ]
    if watershed:
        steps.append(
            PipelineStep(
                name="Watershed",
                stage=Stage.SEGMENTATION,
                params={
                    "kernel_size": 3,
                    "opening_iterations": 2,
                    "dilation_iterations": 3,
                    "distance_threshold_factor": 0.7,
                },
            )
        )
    return steps


def full_pipeline_steps() -> List[PipelineStep]:
    return preprocess_steps() + segmentation_steps(watershed=False)


def _chain_fn(steps: Sequence[PipelineStep], item_shape, dtype):
    """A pure jittable function applying ``steps`` to one frame; dynamic
    params are closed over as constants (fine for a fixed flagship config)."""

    import jax
    import jax.numpy as jnp

    plans = []
    shape = tuple(item_shape)
    for step in steps:
        static, dyn = step.impl.split_params(step.params, shape)
        dyn_const = {k: np.asarray(v) for k, v in dyn.items()}
        plans.append((step.impl.device_fn, static, dyn_const))
        spec = jax.eval_shape(
            lambda img, _fn=step.impl.device_fn, _d=dyn_const, _s=static: _fn(
                img, {k: jnp.asarray(v) for k, v in _d.items()}, **_s
            ),
            jax.ShapeDtypeStruct(shape, dtype),
        )
        shape = spec.shape
        dtype = spec.dtype

    def forward(img):
        cur = img
        for fn, static, dyn in plans:
            dyn_j = {k: jnp.asarray(v) for k, v in dyn.items()}
            cur = fn(cur, dyn_j, **static)
        return cur

    return forward


def flagship_forward(images):
    """Jittable batched forward of the flagship preprocess chain.

    ``images``: (N, H, W) uint8 frames -> (N, H, W) uint8.
    """

    import jax

    steps = preprocess_steps()
    item_shape = tuple(images.shape[1:])
    single = _chain_fn(steps, item_shape, np.uint8)
    return jax.vmap(single)(images)


__all__ = [
    "preprocess_steps",
    "segmentation_steps",
    "full_pipeline_steps",
    "flagship_forward",
]
