"""Pipeline layer: step graph, signature cache, fused-chain compiler."""

from yamimageprocessor_tpu.pipeline.step import (  # noqa: F401
    PipelineStep,
    StepExecutionMetadata,
)
from yamimageprocessor_tpu.pipeline.manager import (  # noqa: F401
    AcceleratorExecutor,
    PipelineManager,
    PipelineState,
)
