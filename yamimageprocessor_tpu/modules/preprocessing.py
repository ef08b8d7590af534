"""The eight built-in preprocessing modules.

Parity with ``modules/preprocessing.py:41-277``: same identifiers, titles,
stage and registration contract (``register_module(app_core)``); parameter
metadata and processing dispatch come from the op schema registry, so each
module is a thin declarative shim over its op.
"""
from __future__ import annotations

from typing import Any

from yamimageprocessor_tpu.plugins.module_base import (
    ModuleBase,
    ModuleMetadata,
    ModuleStage,
)


def _pane(pane: Any, method: str) -> None:
    handler = getattr(pane, method, None)
    if handler is None:
        raise NotImplementedError(f"pane does not provide {method}()")
    handler()


class GrayscaleModule(ModuleBase):
    op_identifier = "preprocessing.grayscale"

    def _build_metadata(self) -> ModuleMetadata:
        return ModuleMetadata(
            identifier="Grayscale",
            title="Grayscale",
            stage=ModuleStage.PREPROCESSING,
            description="Convert the image to single-channel luminance.",
        )

    def activate(self, pane: Any) -> None:
        _pane(pane, "toggle_grayscale")


class BrightnessContrastModule(ModuleBase):
    op_identifier = "preprocessing.brightness_contrast"

    def _build_metadata(self) -> ModuleMetadata:
        return ModuleMetadata(
            identifier="BrightnessContrast",
            title="Brightness / Contrast",
            stage=ModuleStage.PREPROCESSING,
            description="Linear brightness and contrast adjustment.",
        )

    def activate(self, pane: Any) -> None:
        _pane(pane, "show_brightness_contrast_dialog")


class GammaCorrectionModule(ModuleBase):
    op_identifier = "preprocessing.gamma"

    def _build_metadata(self) -> ModuleMetadata:
        return ModuleMetadata(
            identifier="Gamma",
            title="Gamma Correction",
            stage=ModuleStage.PREPROCESSING,
            description="LUT-based gamma correction.",
        )

    def activate(self, pane: Any) -> None:
        _pane(pane, "show_gamma_dialog")


class IntensityNormalizationModule(ModuleBase):
    op_identifier = "preprocessing.normalize"

    def _build_metadata(self) -> ModuleMetadata:
        return ModuleMetadata(
            identifier="IntensityNormalization",
            title="Intensity Normalization",
            stage=ModuleStage.PREPROCESSING,
            description="Min-max rescale of pixel intensities.",
        )

    def activate(self, pane: Any) -> None:
        _pane(pane, "show_normalize_dialog")


class NoiseReductionModule(ModuleBase):
    op_identifier = "preprocessing.noise_reduction"

    def _build_metadata(self) -> ModuleMetadata:
        return ModuleMetadata(
            identifier="NoiseReduction",
            title="Noise Reduction",
            stage=ModuleStage.PREPROCESSING,
            description="Gaussian, median or bilateral smoothing.",
        )

    def activate(self, pane: Any) -> None:
        _pane(pane, "show_noise_reduction_dialog")


class SharpenModule(ModuleBase):
    op_identifier = "preprocessing.sharpen"

    def _build_metadata(self) -> ModuleMetadata:
        return ModuleMetadata(
            identifier="Sharpen",
            title="Sharpen",
            stage=ModuleStage.PREPROCESSING,
            description="Unsharp-mask sharpening.",
        )

    def activate(self, pane: Any) -> None:
        _pane(pane, "show_sharpen_dialog")


class SelectChannelModule(ModuleBase):
    op_identifier = "preprocessing.select_channel"

    def _build_metadata(self) -> ModuleMetadata:
        return ModuleMetadata(
            identifier="SelectChannel",
            title="Select Channel",
            stage=ModuleStage.PREPROCESSING,
            description="Extract or mix BGR channels.",
        )

    def activate(self, pane: Any) -> None:
        _pane(pane, "show_select_channel_dialog")


class CropModule(ModuleBase):
    op_identifier = "preprocessing.crop"

    def _build_metadata(self) -> ModuleMetadata:
        return ModuleMetadata(
            identifier="Crop",
            title="Crop",
            stage=ModuleStage.PREPROCESSING,
            description="Crop to a region of interest or preview the crop.",
        )

    def default_parameters(self):
        params = super().default_parameters()
        params.setdefault("apply_crop", False)
        return params

    def activate(self, pane: Any) -> None:
        _pane(pane, "show_crop_dialog")


MODULE_CLASSES = (
    GrayscaleModule,
    BrightnessContrastModule,
    GammaCorrectionModule,
    IntensityNormalizationModule,
    NoiseReductionModule,
    SharpenModule,
    SelectChannelModule,
    CropModule,
)


def register_module(app_core: Any) -> None:
    """Discovery entry point (``modules/preprocessing.py:270-274``)."""

    for module_cls in MODULE_CLASSES:
        app_core.register_module(module_cls)


__all__ = [cls.__name__ for cls in MODULE_CLASSES] + ["register_module"]
