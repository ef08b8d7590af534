"""Plugin layer: module base classes and discovery contract."""

from yamimageprocessor_tpu.plugins.module_base import (  # noqa: F401
    MenuEntry,
    ModuleBase,
    ModuleCapabilities,
    ModuleMetadata,
    ModuleStage,
)
