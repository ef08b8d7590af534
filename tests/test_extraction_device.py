"""Device extraction kernels vs the numpy golden paths.

The jittable feature kernels run here on the jax CPU backend; real-TPU
behavior is the same program via XLA.  Integer-derived features (areas,
bboxes, labels, annotations) must be exact; float reductions carry f32
vs f64 tolerance.
"""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.ops import extraction as EX
from yamimageprocessor_tpu.ops import extraction_device as XD
from yamimageprocessor_tpu.ops import hogf as H
from yamimageprocessor_tpu.ops import regionprops as RP
from yamimageprocessor_tpu.ops import texture as TX
from yamimageprocessor_tpu.ops.labeling import label_np
from yamimageprocessor_tpu.ops.registry import get_impl
from yamimageprocessor_tpu.services.parity import synthetic_scene


@pytest.fixture(scope="module")
def scene():
    gray, bgr = synthetic_scene((96, 128), seed=5)
    return gray, bgr


def test_region_features_match_golden(scene):
    _, bgr = scene
    labels_j, feats = XD.region_features_j(bgr, max_regions=64)
    labels = label_np(EX._binary(bgr) > 0)
    assert (np.asarray(labels_j) == labels).all()
    meas = RP.measure_np(labels)
    n = int(np.asarray(feats["count"]))
    assert n == meas.count
    np.testing.assert_array_equal(
        np.asarray(feats["area"])[: n + 1], meas.area[: n + 1]
    )
    np.testing.assert_allclose(
        np.asarray(feats["centroid_r"])[: n + 1], meas.centroid_r, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(feats["perimeter"])[: n + 1], meas.perimeter, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(feats["eccentricity"])[: n + 1], meas.eccentricity(), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats["extent"])[: n + 1], meas.extent(), rtol=1e-5
    )
    bbox = np.stack(
        [
            np.asarray(feats["min_r"])[: n + 1],
            np.asarray(feats["min_c"])[: n + 1],
            np.asarray(feats["max_r"])[: n + 1] + 1,
            np.asarray(feats["max_c"])[: n + 1] + 1,
        ],
        axis=1,
    ).astype(np.int64)
    np.testing.assert_array_equal(bbox[1:], meas.bbox[1 : n + 1])


def test_region_annotation_matches_golden(scene):
    _, bgr = scene
    golden = EX.region_properties_extraction(bgr)
    impl = get_impl("extraction.region_properties")
    assert impl.device_fn is not None and impl.jittable
    device = np.asarray(impl.device_fn(bgr, {}))
    assert (device == golden).all()


def test_region_table_device_matches_host(scene):
    _, bgr = scene
    table = XD.region_table_device(bgr)
    labels = label_np(EX._binary(bgr) > 0)
    meas = RP.measure_np(labels)
    assert table["meas"].count == meas.count
    np.testing.assert_allclose(
        table["solidity"], RP.solidity_np(labels, meas), rtol=1e-5
    )


def test_hu_features_device(scene):
    _, bgr = scene
    golden = EX._hu(bgr)  # host path on the CPU harness
    device = np.asarray(XD.hu_features_j(bgr))
    np.testing.assert_allclose(device, golden, rtol=2e-3, atol=1e-12)


def test_haralick_features_device(scene):
    _, bgr = scene
    golden = EX._haralick_props(bgr, 1, 0.0)  # host path on the CPU harness
    device = np.asarray(XD.haralick_features_j(bgr, distance=1, angle=0.0))
    for i, key in enumerate(("contrast", "correlation", "energy", "homogeneity")):
        np.testing.assert_allclose(device[i], golden[key], rtol=1e-3)


def test_histogram_features_device(scene):
    _, bgr = scene
    from yamimageprocessor_tpu.ops import color as C

    golden = TX.histogram_stats_np(C.bgr_to_gray_np(bgr))
    device = np.asarray(XD.histogram_features_j(bgr))
    for i, key in enumerate(("mean", "variance", "skewness", "kurtosis")):
        np.testing.assert_allclose(device[i], golden[key], rtol=1e-4)


def test_fractal_feature_device(scene):
    _, bgr = scene
    binary = EX._binary(bgr, maxval=1)
    golden = H.fractal_dimension(binary, 2)
    device = float(np.asarray(XD.fractal_feature_j(bgr, min_box_size=2)))
    np.testing.assert_allclose(device, golden, rtol=1e-4)


def test_hog_device_fn_matches_golden(scene):
    gray, bgr = scene
    golden = EX.hog_extraction(bgr)
    impl = get_impl("extraction.hog")
    assert impl.device_fn is not None and impl.jittable
    static, dyn = impl.split_params({}, bgr.shape)
    device = np.asarray(impl.device_fn(bgr, dyn, **static))
    # f32 cell histograms vs f64: allow 1 LSB on the normalized render
    assert np.abs(device.astype(np.int16) - golden.astype(np.int16)).max() <= 1


def test_device_extraction_families_registered():
    """>=6 of the 8 previously host-only families now carry device compute
    (device_fn or feature_fn)."""

    families = {
        "extraction.region_properties": ("device_fn",),
        "extraction.hu_moments": ("feature_fn",),
        "extraction.haralick": ("feature_fn",),
        "extraction.hog": ("device_fn",),
        "extraction.histogram": ("feature_fn",),
        "extraction.fractal": ("feature_fn",),
    }
    for identifier, attrs in families.items():
        impl = get_impl(identifier)
        assert any(getattr(impl, a) is not None for a in attrs), identifier
