"""Op library: schemas (pure data) + jittable implementations + golden twins.

``yamimageprocessor_tpu.ops.schema`` is importable without jax; the
implementation modules (``preprocess``, ``segmentation``, ``extraction``)
register device/golden callables into :mod:`yamimageprocessor_tpu.ops.registry`.
"""

from yamimageprocessor_tpu.ops.schema import (  # noqa: F401
    EXTRACTION_OPS,
    PREPROCESS_OPS,
    SEGMENTATION_OPS,
    OpSchema,
    ParamSpec,
    Stage,
    op_by_method,
    settings_defaults,
)
