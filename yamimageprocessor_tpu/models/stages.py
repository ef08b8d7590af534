"""Canonical stage chains — the benchmark/flagship configurations.

These correspond to BASELINE.md's headline configs: the 3-step preprocess
chain (denoise -> equalize -> contrast), the segmentation chain
(threshold -> morphology -> watershed), and the combined pipeline.
"""
from __future__ import annotations

from typing import List

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


def flagship_chain(batch_shape, dtype=np.uint8):
    """(fn, dyn_list) for the flagship preprocess chain at ``batch_shape``
    (N, H, W): the PRODUCTION compiled-chain callable with its dynamic
    parameter inputs, via :func:`pipeline.compiler.get_compiled_chain` —
    bench and ``flagship_forward`` run the same code the pipeline runs."""

    from yamimageprocessor_tpu.pipeline.compiler import get_compiled_chain

    steps = preprocess_steps()
    chain = get_compiled_chain(steps, tuple(batch_shape), dtype, batch=batch_shape[0])
    return chain.pure_callable()


def flagship_forward(images):
    """Jittable batched forward of the flagship preprocess chain.

    ``images``: (N, H, W) uint8 frames -> (N, H, W) uint8.
    """

    fn, dyn = flagship_chain(images.shape, images.dtype)
    return fn(images, dyn)[-1]


__all__ = [
    "preprocess_steps",
    "segmentation_steps",
    "full_pipeline_steps",
    "flagship_chain",
    "flagship_forward",
]
