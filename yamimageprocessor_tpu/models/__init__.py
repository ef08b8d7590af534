"""Flagship pipeline chain definitions (the framework's "model families")."""

from yamimageprocessor_tpu.models.stages import (  # noqa: F401
    flagship_forward,
    preprocess_steps,
    segmentation_steps,
    full_pipeline_steps,
)
