"""Declarative op schemas: parameters, coercion rules, settings namespace.

This module is the single source of truth for

* the parameter metadata of every op (defaults / ranges / coercion), playing
  the role of the reference's ``ui/control_metadata.py:29-146`` registry and
  the per-module ``default_parameters``/``sanitize_parameters`` contract
  (``plugins/module_base.py:19-160``);
* the persisted settings namespace.  The reference treats its QSettings key
  namespace as the pipeline wire format (``core/settings.py:19-147``; stage
  builders parse it directly, ``processing/segmentation_pipeline.py:84-184``),
  so :func:`settings_defaults` reproduces that namespace key-for-key.

No jax imports here — host-only services depend on this module.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, Mapping, Optional, Tuple


class Stage(Enum):
    """Pipeline stages (values match ``plugins/module_base.py:19-24``)."""

    PREPROCESSING = "preprocessing"
    SEGMENTATION = "segmentation"
    ANALYSIS = "analysis"


#: Settings-prefix per stage (``core/settings.py:31,54,119``).
STAGE_SETTINGS_PREFIX: Dict[Stage, str] = {
    Stage.PREPROCESSING: "preprocess",
    Stage.SEGMENTATION: "segmentation",
    Stage.ANALYSIS: "extraction",
}


@dataclass(frozen=True)
class ParamSpec:
    """A single op parameter: type, default, range and coercion rules."""

    name: str
    kind: str  # "int" | "float" | "str" | "bool" | "choice"
    default: Any
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    step: Optional[float] = None
    decimals: Optional[int] = None
    choices: Tuple[str, ...] = ()
    odd: bool = False  # enforce odd integers (kernel sizes)
    description: str = ""

    def coerce(self, value: Any) -> Any:
        """Clamp/validate ``value`` (mirrors ``ui/control_metadata.py:95-136``)."""

        if self.kind == "bool":
            if isinstance(value, str):
                return value.strip().lower() in {"1", "true", "yes", "on"}
            return bool(value)
        if self.kind == "choice":
            text = str(value)
            if self.choices and text not in self.choices:
                return self.default
            return text
        if self.kind == "str":
            return str(value)
        if self.kind == "int":
            try:
                number: Any = int(round(float(value)))
            except (TypeError, ValueError):
                number = int(self.default)
            if self.minimum is not None:
                number = max(number, int(self.minimum))
            if self.maximum is not None:
                number = min(number, int(self.maximum))
            if self.odd and number % 2 == 0:
                number += 1
            return int(number)
        if self.kind == "float":
            try:
                number = float(value)
            except (TypeError, ValueError):
                number = float(self.default)
            if self.minimum is not None:
                number = max(number, float(self.minimum))
            if self.maximum is not None:
                number = min(number, float(self.maximum))
            return float(number)
        return value

    def tooltip_text(self) -> str:
        """Human-readable tooltip (``ui/control_metadata.py:43-78``)."""

        parts = [self.description] if self.description else []
        bounds = []
        if self.minimum is not None:
            bounds.append(f"min {self.minimum:g}")
        if self.maximum is not None:
            bounds.append(f"max {self.maximum:g}")
        if bounds:
            parts.append("(" + ", ".join(bounds) + ")")
        parts.append(f"default: {self.default}")
        return " ".join(str(p) for p in parts)


SettingsToParams = Callable[[Mapping[str, Any], str], Dict[str, Any]]


@dataclass(frozen=True)
class OpSchema:
    """Static description of one pipeline op."""

    identifier: str  # canonical id, e.g. "preprocessing.gamma"
    method: str  # settings/method name, e.g. "gamma" or "K-Means"
    stage: Stage
    title: str
    description: str = ""
    params: Tuple[ParamSpec, ...] = ()
    #: settings key holding the enabled flag; ``None`` → "<prefix>/<method>/enabled".
    enabled_key: Optional[str] = None
    #: ops with no persisted params beyond the enabled flag.
    settings_param_names: Optional[Tuple[str, ...]] = None
    #: custom translation settings-snapshot → call params (Region Growing, HOG).
    settings_to_params: Optional[SettingsToParams] = field(
        default=None, compare=False, hash=False
    )
    #: True when the op emits tabular records in addition to an image.
    produces_data: bool = False
    #: False for ops that exist as kernels but have no persisted settings
    #: entry in the reference namespace (e.g. histogram equalization,
    #: ``core/preprocessing.py:73-79`` — a kernel without a module).
    persisted: bool = True

    @property
    def prefix(self) -> str:
        return STAGE_SETTINGS_PREFIX[self.stage]

    @property
    def step_name(self) -> str:
        """The pipeline-step name used in cache signatures.

        Preprocessing steps are named by module identifier
        (``plugins/module_base.py:133-137`` uses ``metadata.identifier``;
        identifiers from ``modules/preprocessing.py:46-220``); segmentation /
        extraction steps are named by method
        (``processing/segmentation_pipeline.py:183``).
        """

        return _REFERENCE_STEP_NAMES.get(self.identifier, self.method)

    @property
    def settings_enabled_key(self) -> str:
        if self.enabled_key is not None:
            return self.enabled_key
        return f"{self.prefix}/{self.method}/enabled"

    def param(self, name: str) -> ParamSpec:
        for spec in self.params:
            if spec.name == name:
                return spec
        raise KeyError(f"{self.identifier} has no parameter '{name}'")

    def default_parameters(self) -> Dict[str, Any]:
        return {spec.name: spec.default for spec in self.params}

    def sanitize_parameters(self, params: Mapping[str, Any]) -> Dict[str, Any]:
        """Coerce a raw parameter mapping, dropping unknown keys."""

        known = {spec.name: spec for spec in self.params}
        out = self.default_parameters()
        for key, value in params.items():
            if key in known:
                out[key] = known[key].coerce(value)
        return out

    def settings_keys(self) -> Dict[str, Any]:
        """The persisted key/default pairs contributed by this op."""

        keys: Dict[str, Any] = {self.settings_enabled_key: False}
        names = (
            self.settings_param_names
            if self.settings_param_names is not None
            else tuple(spec.name for spec in self.params)
        )
        for name in names:
            keys[f"{self.prefix}/{self.method}/{name}"] = self.param(name).default
        return keys

    def params_from_settings(self, settings: Mapping[str, Any]) -> Dict[str, Any]:
        """Build call params from a settings snapshot (stage-builder semantics,
        ``processing/segmentation_pipeline.py:84-184``)."""

        if self.settings_to_params is not None:
            return self.settings_to_params(settings, self.prefix)
        out: Dict[str, Any] = {}
        names = (
            self.settings_param_names
            if self.settings_param_names is not None
            else tuple(spec.name for spec in self.params)
        )
        for name in names:
            spec = self.param(name)
            raw = settings.get(f"{self.prefix}/{self.method}/{name}", spec.default)
            out[name] = spec.coerce(raw)
        return out


#: reference module identifiers for preprocessing steps; other stages use
#: the method name directly.
_REFERENCE_STEP_NAMES: Dict[str, str] = {
    "preprocessing.grayscale": "Grayscale",
    "preprocessing.brightness_contrast": "BrightnessContrast",
    "preprocessing.gamma": "Gamma",
    "preprocessing.normalize": "IntensityNormalization",
    "preprocessing.noise_reduction": "NoiseReduction",
    "preprocessing.sharpen": "Sharpen",
    "preprocessing.select_channel": "SelectChannel",
    "preprocessing.crop": "Crop",
}


def op_by_step_name(stage: Stage, name: str) -> Optional["OpSchema"]:
    """Resolve an op from a pipeline-step name (inverse of ``step_name``)."""

    for op in ALL_OPS:
        if op.stage == stage and op.step_name == name:
            return op
    return None


def _p_int(name, default, lo=None, hi=None, odd=False, desc="", step=None):
    return ParamSpec(name, "int", default, lo, hi, step=step, odd=odd, description=desc)


def _p_float(name, default, lo=None, hi=None, decimals=None, desc="", step=None):
    return ParamSpec(
        name, "float", default, lo, hi, step=step, decimals=decimals, description=desc
    )


def _p_choice(name, default, choices, desc=""):
    return ParamSpec(name, "choice", default, choices=tuple(choices), description=desc)


# ---------------------------------------------------------------------------
# Preprocessing ops — kernels defined in ``core/preprocessing.py:50-151``,
# module metadata in ``modules/preprocessing.py:41-277``, defaults in
# ``core/settings.py:31-53``.
# ---------------------------------------------------------------------------

PREPROCESS_OPS: Tuple[OpSchema, ...] = (
    OpSchema(
        identifier="preprocessing.grayscale",
        method="grayscale",
        stage=Stage.PREPROCESSING,
        title="Grayscale",
        description="Convert BGR images to single-channel luminance.",
        enabled_key="preprocess/grayscale",  # bare bool (core/settings.py:33)
    ),
    OpSchema(
        identifier="preprocessing.brightness_contrast",
        method="brightness_contrast",
        stage=Stage.PREPROCESSING,
        title="Brightness / Contrast",
        description="Linear rescale: saturate(alpha*x + beta).",
        params=(
            _p_float("alpha", 1.0, 0.1, 10.0, decimals=2, desc="Contrast gain"),
            _p_float("beta", 0, -255, 255, decimals=0, desc="Brightness offset"),
        ),
    ),
    OpSchema(
        identifier="preprocessing.gamma",
        method="gamma",
        stage=Stage.PREPROCESSING,
        title="Gamma Correction",
        description="LUT gamma mapping ((i/255)^(1/g)*255).",
        params=(_p_float("value", 1.0, 0.1, 10.0, decimals=2, desc="Gamma"),),
    ),
    OpSchema(
        identifier="preprocessing.normalize",
        method="normalize",
        stage=Stage.PREPROCESSING,
        title="Intensity Normalization",
        description="Min-max normalize into [alpha, beta].",
        params=(
            _p_float("alpha", 0, 0, 255, decimals=0, desc="Lower bound"),
            _p_float("beta", 255, 0, 255, decimals=0, desc="Upper bound"),
        ),
    ),
    OpSchema(
        identifier="preprocessing.noise_reduction",
        method="noise_reduction",
        stage=Stage.PREPROCESSING,
        title="Noise Reduction",
        description="Gaussian / median / bilateral smoothing.",
        params=(
            _p_choice("method", "Gaussian", ("Gaussian", "Median", "Bilateral")),
            _p_int("ksize", 5, 1, 31, odd=True, desc="Kernel size (odd)"),
        ),
    ),
    OpSchema(
        identifier="preprocessing.sharpen",
        method="sharpen",
        stage=Stage.PREPROCESSING,
        title="Sharpen",
        description="Unsharp mask: (1+s)*img - s*gauss(img, sigma=3).",
        params=(_p_float("strength", 1.0, 0.0, 5.0, decimals=2, desc="Strength"),),
    ),
    OpSchema(
        identifier="preprocessing.select_channel",
        method="select_channel",
        stage=Stage.PREPROCESSING,
        title="Select Channel",
        description="Extract or mix BGR channels.",
        params=(
            _p_choice("value", "All", ("All", "R", "G", "B", "RG", "GB", "BR")),
        ),
    ),
    OpSchema(
        identifier="preprocessing.histogram_equalization",
        method="histogram_equalization",
        stage=Stage.PREPROCESSING,
        title="Histogram Equalization",
        description="Global histogram equalization (Y channel for color).",
        persisted=False,
    ),
    OpSchema(
        identifier="preprocessing.clahe",
        method="clahe",
        stage=Stage.PREPROCESSING,
        title="CLAHE",
        description="Contrast-limited adaptive histogram equalization "
        "(extension beyond the reference's global equalization).",
        params=(
            _p_float("clip_limit", 40.0, 0.0, 255.0, decimals=1),
            _p_int("grid_size", 8, 2, 64),
        ),
        persisted=False,
    ),
    OpSchema(
        identifier="preprocessing.crop",
        method="crop",
        stage=Stage.PREPROCESSING,
        title="Crop",
        description="Crop a rectangle (preview overlays the region).",
        params=(
            _p_int("x_offset", 0, 0, None, desc="Left"),
            _p_int("y_offset", 0, 0, None, desc="Top"),
            _p_int("width", 100, 1, None, desc="Width"),
            _p_int("height", 100, 1, None, desc="Height"),
        ),
    ),
)


# ---------------------------------------------------------------------------
# Segmentation ops — kernels in ``core/segmentation.py:79-325``, builder
# mapping in ``processing/segmentation_pipeline.py:84-184``, defaults in
# ``core/settings.py:54-118``.
# ---------------------------------------------------------------------------

_MORPH_SHAPES = ("Rectangular", "Elliptical", "Cross")


def _morph_params() -> Tuple[ParamSpec, ...]:
    return (
        _p_choice("kernel_shape", "Rectangular", _MORPH_SHAPES),
        _p_int("kernel_size", 3, 1, 31, desc="Structuring element size"),
        _p_int("iterations", 1, 1, 50, desc="Iterations"),
    )


def _region_growing_params(settings: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    # settings hold seed_x/seed_y; the op takes seed=(x, y)
    # (processing/segmentation_pipeline.py:123-128).
    sx = int(settings.get(f"{prefix}/Region Growing/seed_x", 50))
    sy = int(settings.get(f"{prefix}/Region Growing/seed_y", 50))
    tol = int(settings.get(f"{prefix}/Region Growing/tolerance", 10))
    return {"seed": (sx, sy), "tolerance": tol}


SEGMENTATION_OPS: Tuple[OpSchema, ...] = (
    OpSchema(
        identifier="segmentation.global_threshold",
        method="Global",
        stage=Stage.SEGMENTATION,
        title="Global Threshold",
        params=(_p_int("threshold", 127, 0, 255),),
    ),
    OpSchema(
        identifier="segmentation.otsu",
        method="Otsu",
        stage=Stage.SEGMENTATION,
        title="Otsu Threshold",
    ),
    OpSchema(
        identifier="segmentation.adaptive",
        method="Adaptive",
        stage=Stage.SEGMENTATION,
        title="Adaptive Threshold",
        params=(
            _p_int("block_size", 11, 3, 255, odd=True),
            _p_int("C", 2, -100, 100),
        ),
    ),
    OpSchema(
        identifier="segmentation.edge",
        method="Edge",
        stage=Stage.SEGMENTATION,
        title="Edge Detection (Canny + dilate)",
        params=(
            _p_int("low_threshold", 50, 0, 1000),
            _p_int("high_threshold", 150, 0, 1000),
            _p_int("aperture_size", 3, 3, 7, odd=True),
        ),
    ),
    OpSchema(
        identifier="segmentation.watershed",
        method="Watershed",
        stage=Stage.SEGMENTATION,
        title="Watershed",
        params=(
            _p_int("kernel_size", 3, 1, 31),
            _p_int("opening_iterations", 2, 0, 50),
            _p_int("dilation_iterations", 3, 0, 50),
            _p_float("distance_threshold_factor", 0.7, 0.0, 1.0, decimals=2),
        ),
    ),
    OpSchema(
        identifier="segmentation.sobel",
        method="Sobel",
        stage=Stage.SEGMENTATION,
        title="Sobel Gradient",
        params=(_p_int("ksize", 3, 1, 31, odd=True),),
    ),
    OpSchema(
        identifier="segmentation.prewitt",
        method="Prewitt",
        stage=Stage.SEGMENTATION,
        title="Prewitt Gradient",
    ),
    OpSchema(
        identifier="segmentation.laplacian",
        method="Laplacian",
        stage=Stage.SEGMENTATION,
        title="Laplacian",
        params=(_p_int("ksize", 3, 1, 31, odd=True),),
    ),
    OpSchema(
        identifier="segmentation.region_growing",
        method="Region Growing",
        stage=Stage.SEGMENTATION,
        title="Region Growing",
        params=(
            _p_int("seed_x", 50, 0, None),
            _p_int("seed_y", 50, 0, None),
            _p_int("tolerance", 10, 0, 255),
        ),
        settings_to_params=_region_growing_params,
    ),
    OpSchema(
        identifier="segmentation.region_split_merge",
        method="Region Splitting/Merging",
        stage=Stage.SEGMENTATION,
        title="Region Splitting / Merging",
        params=(
            _p_int("min_size", 16, 2, 1024),
            _p_float("std_thresh", 10.0, 0.0, 255.0, decimals=1),
        ),
    ),
    OpSchema(
        identifier="segmentation.kmeans",
        method="K-Means",
        stage=Stage.SEGMENTATION,
        title="K-Means Clustering",
        params=(_p_int("K", 2, 2, 16), _p_int("seed", 42, 0, None)),
    ),
    OpSchema(
        identifier="segmentation.fuzzy_cmeans",
        method="Fuzzy C-Means",
        stage=Stage.SEGMENTATION,
        title="Fuzzy C-Means Clustering",
        params=(_p_int("K", 2, 2, 16), _p_int("seed", 42, 0, None)),
    ),
    OpSchema(
        identifier="segmentation.mean_shift",
        method="Mean Shift",
        stage=Stage.SEGMENTATION,
        title="Mean Shift",
        params=(
            _p_int("spatial_radius", 20, 1, 100),
            _p_int("color_radius", 30, 1, 100),
        ),
    ),
    OpSchema(
        identifier="segmentation.gmm",
        method="GMM",
        stage=Stage.SEGMENTATION,
        title="Gaussian Mixture Model",
        params=(_p_int("components", 2, 2, 16), _p_int("seed", 42, 0, None)),
    ),
    OpSchema(
        identifier="segmentation.graph_cuts",
        method="Graph Cuts",
        stage=Stage.SEGMENTATION,
        title="Graph Cuts (GrabCut)",
    ),
    OpSchema(
        identifier="segmentation.active_contour",
        method="Active Contour",
        stage=Stage.SEGMENTATION,
        title="Active Contour (Snake)",
        params=(
            _p_int("iterations", 250, 1, 10000),
            _p_float("alpha", 0.015, 0.0, 1.0, decimals=3),
            _p_float("beta", 10.0, 0.0, 100.0, decimals=1),
            _p_float("gamma", 0.001, 0.0, 1.0, decimals=4),
        ),
    ),
    OpSchema(
        identifier="segmentation.opening",
        method="Opening",
        stage=Stage.SEGMENTATION,
        title="Morphological Opening",
        params=_morph_params(),
    ),
    OpSchema(
        identifier="segmentation.closing",
        method="Closing",
        stage=Stage.SEGMENTATION,
        title="Morphological Closing",
        params=_morph_params(),
    ),
    OpSchema(
        identifier="segmentation.dilation",
        method="Dilation",
        stage=Stage.SEGMENTATION,
        title="Morphological Dilation",
        params=_morph_params(),
    ),
    OpSchema(
        identifier="segmentation.erosion",
        method="Erosion",
        stage=Stage.SEGMENTATION,
        title="Morphological Erosion",
        params=_morph_params(),
    ),
    OpSchema(
        identifier="segmentation.border_removal",
        method="Border Removal",
        stage=Stage.SEGMENTATION,
        title="Border Removal",
        params=(_p_int("border_distance", 25, 1, None),),
    ),
)


def _hog_params(settings: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    # settings hold scalar ppc/cpb; the op takes square tuples
    # (core/settings.py:139-141 vs core/extraction.py:248-262).
    orientations = int(settings.get(f"{prefix}/HOG/orientations", 9))
    ppc = int(settings.get(f"{prefix}/HOG/ppc", 8))
    cpb = int(settings.get(f"{prefix}/HOG/cpb", 3))
    return {
        "orientations": orientations,
        "pixels_per_cell": (ppc, ppc),
        "cells_per_block": (cpb, cpb),
    }


# ---------------------------------------------------------------------------
# Extraction ops — kernels in ``core/extraction.py:57-443``, builder mapping
# in ``processing/extraction_pipeline.py:77-137``, defaults in
# ``core/settings.py:119-147``.
# ---------------------------------------------------------------------------

EXTRACTION_OPS: Tuple[OpSchema, ...] = (
    OpSchema(
        identifier="extraction.region_properties",
        method="Region Properties",
        stage=Stage.ANALYSIS,
        title="Region Properties",
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.hu_moments",
        method="Hu Moments",
        stage=Stage.ANALYSIS,
        title="Hu Moments",
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.lbp",
        method="LBP",
        stage=Stage.ANALYSIS,
        title="Local Binary Patterns",
        params=(_p_int("P", 8, 4, 24), _p_float("R", 1.0, 0.5, 8.0, decimals=1)),
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.haralick",
        method="Haralick",
        stage=Stage.ANALYSIS,
        title="Haralick / GLCM",
        params=(
            _p_int("distance", 1, 1, 64),
            _p_float("angle", 0.0, 0.0, 6.2832, decimals=4),
        ),
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.gabor",
        method="Gabor",
        stage=Stage.ANALYSIS,
        title="Gabor Filter",
        params=(
            _p_int("ksize", 21, 3, 101, odd=True),
            _p_float("sigma", 5.0, 0.1, 50.0, decimals=1),
            _p_float("theta", 0.0, 0.0, 6.2832, decimals=4),
            _p_float("lambd", 10.0, 0.1, 100.0, decimals=1),
            _p_float("gamma", 0.5, 0.0, 10.0, decimals=2),
            _p_float("psi", 0.0, -6.2832, 6.2832, decimals=4),
        ),
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.fourier",
        method="Fourier",
        stage=Stage.ANALYSIS,
        title="Fourier Descriptors",
        params=(_p_int("num_coeff", 10, 1, 512),),
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.hog",
        method="HOG",
        stage=Stage.ANALYSIS,
        title="Histogram of Oriented Gradients",
        params=(
            _p_int("orientations", 9, 1, 32),
            _p_int("ppc", 8, 2, 64),
            _p_int("cpb", 3, 1, 8),
        ),
        settings_to_params=_hog_params,
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.histogram",
        method="Histogram",
        stage=Stage.ANALYSIS,
        title="Histogram Statistics",
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.fractal",
        method="Fractal",
        stage=Stage.ANALYSIS,
        title="Fractal Dimension",
        params=(_p_int("min_box_size", 2, 2, 64),),
        produces_data=True,
    ),
    OpSchema(
        identifier="extraction.approximate_shape",
        method="Approximate Shape",
        stage=Stage.ANALYSIS,
        title="Approximate Shape",
        params=(_p_float("error_threshold", 1.0, 0.0, 100.0, decimals=1),),
        produces_data=True,
    ),
)


ALL_OPS: Tuple[OpSchema, ...] = PREPROCESS_OPS + SEGMENTATION_OPS + EXTRACTION_OPS

_BY_IDENTIFIER: Dict[str, OpSchema] = {op.identifier: op for op in ALL_OPS}
_BY_STAGE_METHOD: Dict[Tuple[Stage, str], OpSchema] = {
    (op.stage, op.method): op for op in ALL_OPS
}


def op_by_identifier(identifier: str) -> OpSchema:
    return _BY_IDENTIFIER[identifier]


def op_by_method(stage: Stage, method: str) -> Optional[OpSchema]:
    return _BY_STAGE_METHOD.get((stage, method))


def ops_for_stage(stage: Stage) -> Tuple[OpSchema, ...]:
    return tuple(op for op in ALL_OPS if op.stage == stage)


def settings_defaults() -> Dict[str, Any]:
    """The full default settings namespace.

    Key-for-key compatible with the reference's ``DEFAULT_SETTINGS``
    (``core/settings.py:19-147``): service keys + per-stage ``order`` keys +
    every op's enabled/param keys.
    """

    defaults: Dict[str, Any] = {
        "diagnostics/enabled": False,
        "telemetry/enabled": False,
        "autosave/enabled": True,
        "autosave/interval_seconds": 120.0,
        "autosave/workspace": "",
        "autosave/backup_retention": 5,
        "io/default_format": ".png",
        "io/metadata_schema": "yam.image-metadata.v1",
        "preprocess/order": "",
        "segmentation/order": "",
        "extraction/order": "",
    }
    for op in ALL_OPS:
        if op.persisted:
            defaults.update(op.settings_keys())
    return defaults


__all__ = [
    "Stage",
    "STAGE_SETTINGS_PREFIX",
    "ParamSpec",
    "OpSchema",
    "PREPROCESS_OPS",
    "SEGMENTATION_OPS",
    "EXTRACTION_OPS",
    "ALL_OPS",
    "op_by_identifier",
    "op_by_method",
    "ops_for_stage",
    "settings_defaults",
]
