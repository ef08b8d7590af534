"""Op schema / parameter metadata tests."""
from __future__ import annotations

from yamimageprocessor_tpu.ops.schema import (
    ALL_OPS,
    EXTRACTION_OPS,
    PREPROCESS_OPS,
    SEGMENTATION_OPS,
    Stage,
    op_by_method,
    settings_defaults,
)


def test_op_counts_match_reference_inventory():
    # 8 preprocessing modules (modules/preprocessing.py:41-277) plus the
    # histogram-equalization kernel that has no module/settings entry
    # (core/preprocessing.py:73-79); 21 segmentation methods
    # (processing/segmentation_pipeline.py:84-184); 10 extraction methods
    # (processing/extraction_pipeline.py:77-137).
    assert len([op for op in PREPROCESS_OPS if op.persisted]) == 8
    assert len(PREPROCESS_OPS) == 10  # + histeq kernel + CLAHE extension
    assert len(SEGMENTATION_OPS) == 21
    assert len(EXTRACTION_OPS) == 10


def test_identifiers_unique():
    ids = [op.identifier for op in ALL_OPS]
    assert len(ids) == len(set(ids))


def test_odd_coercion():
    op = op_by_method(Stage.PREPROCESSING, "noise_reduction")
    spec = op.param("ksize")
    assert spec.coerce(4) == 5
    assert spec.coerce(5) == 5
    assert spec.coerce(100) == 31
    assert spec.coerce("7") == 7


def test_choice_coercion_falls_back_to_default():
    op = op_by_method(Stage.PREPROCESSING, "select_channel")
    spec = op.param("value")
    assert spec.coerce("R") == "R"
    assert spec.coerce("bogus") == "All"


def test_clamping():
    op = op_by_method(Stage.SEGMENTATION, "Global")
    spec = op.param("threshold")
    assert spec.coerce(-5) == 0
    assert spec.coerce(300) == 255
    assert spec.coerce(12.7) == 13


def test_region_growing_settings_translation():
    op = op_by_method(Stage.SEGMENTATION, "Region Growing")
    params = op.params_from_settings(
        {
            "segmentation/Region Growing/seed_x": 10,
            "segmentation/Region Growing/seed_y": 20,
            "segmentation/Region Growing/tolerance": 5,
        }
    )
    assert params == {"seed": (10, 20), "tolerance": 5}


def test_hog_settings_translation():
    op = op_by_method(Stage.ANALYSIS, "HOG")
    params = op.params_from_settings(
        {"extraction/HOG/orientations": 6, "extraction/HOG/ppc": 4, "extraction/HOG/cpb": 2}
    )
    assert params == {
        "orientations": 6,
        "pixels_per_cell": (4, 4),
        "cells_per_block": (2, 2),
    }


def test_grayscale_enabled_key_is_bare_bool():
    op = op_by_method(Stage.PREPROCESSING, "grayscale")
    assert op.settings_enabled_key == "preprocess/grayscale"
    assert op.settings_keys() == {"preprocess/grayscale": False}


def test_settings_defaults_cover_all_ops():
    defaults = settings_defaults()
    for op in ALL_OPS:
        if op.persisted:
            assert op.settings_enabled_key in defaults
    assert defaults["segmentation/Watershed/distance_threshold_factor"] == 0.7
    assert defaults["extraction/HOG/ppc"] == 8
    assert defaults["preprocess/crop/width"] == 100


def test_sanitize_parameters_drops_unknown():
    op = op_by_method(Stage.PREPROCESSING, "brightness_contrast")
    clean = op.sanitize_parameters({"alpha": "2.0", "beta": 999, "bogus": 1})
    assert clean == {"alpha": 2.0, "beta": 255.0}


def test_every_schema_op_has_a_registered_impl():
    """No schema entry may silently lack an implementation: every op in the
    inventory resolves to an OpImpl with a golden twin, and device-capable
    ops expose a device_fn (completeness guard for SURVEY §2.2)."""
    from yamimageprocessor_tpu.ops.registry import get_impl
    from yamimageprocessor_tpu.ops.schema import (
        EXTRACTION_OPS,
        PREPROCESS_OPS,
        SEGMENTATION_OPS,
    )

    for op in (*PREPROCESS_OPS, *SEGMENTATION_OPS, *EXTRACTION_OPS):
        impl = get_impl(op.identifier)
        assert impl is not None, op.identifier
        assert impl.golden_fn is not None, op.identifier
        assert impl.jittable is False or impl.device_fn is not None, op.identifier
    for op in EXTRACTION_OPS:
        impl = get_impl(op.identifier)
        assert impl.data_fn is not None, f"{op.identifier} missing CSV twin"


def test_builder_string_enabled_flags_respected():
    """QSettings-style backends persist booleans as strings; 'false'/'0'
    must disable the step (r3 review: bool('false') is True)."""

    from yamimageprocessor_tpu.pipeline.builders import (
        build_preprocessing_pipeline_from_dict,
    )

    snapshot = {
        "preprocess/grayscale": "false",
        "preprocess/gamma/enabled": "0",
        "preprocess/brightness_contrast/enabled": "true",
    }
    pipeline = build_preprocessing_pipeline_from_dict(snapshot)
    by_name = {s.name: s for s in pipeline.steps}
    assert not by_name["Grayscale"].enabled
    assert not by_name["Gamma"].enabled
    assert by_name["BrightnessContrast"].enabled
