"""Headless UI layer: pane protocol, cross-stage controller, adapter.

The reference's UI is PyQt5; this framework ships the same control surface
headless (the ``ModulePane`` duck-type contract from ``ui/__init__.py:10-43``,
the cross-stage :class:`UnifiedPipelineController` and the
:class:`ControllerBackedPipeline` adapter) so existing modules and panes can
be hosted by any shell — CLI, notebooks, or a thin Qt wrapper.
"""

from yamimageprocessor_tpu.ui.controller import (  # noqa: F401
    UnifiedPipelineController,
)
from yamimageprocessor_tpu.ui.pipeline_adapter import (  # noqa: F401
    ControllerBackedPipeline,
    coerce_pipeline_image,
)


class ModulePane:
    """Duck-type contract for stage panes (``ui/__init__.py:10-43``)."""

    stage = None

    def pane_title(self) -> str:
        raise NotImplementedError

    def activate(self) -> None:
        """Called when the pane becomes the active tab."""

    def deactivate(self) -> None:
        """Called when the pane is hidden."""

    def teardown(self) -> None:
        """Called on shutdown."""
