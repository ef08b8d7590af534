"""Extraction op parity: annotated images + DataFrame layouts vs the
reference semantics (cv2/scipy oracles where available; skimage/skfuzzy are
not installed, so their formulas are validated on analytic fixtures)."""
from __future__ import annotations

import cv2
import numpy as np
import pandas as pd
import pytest
from scipy.stats import kurtosis, skew

from yamimageprocessor_tpu.ops.registry import get_impl


def _shapes_image(h=96, w=128):
    img = np.zeros((h, w), np.uint8)
    img[20:50, 20:60] = 220  # rectangle 30x40
    yy, xx = np.mgrid[:h, :w]
    img[(yy - 70) ** 2 + (xx - 95) ** 2 <= 15**2] = 200  # disk r=15
    return img


@pytest.fixture()
def gray():
    return _shapes_image()


@pytest.fixture()
def bgr(gray):
    return cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)


def run_device(identifier, image, **params):
    import jax.numpy as jnp

    impl = get_impl(identifier)
    static, dyn = impl.split_params(params, image.shape)
    dyn_j = {k: jnp.asarray(v) for k, v in dyn.items()}
    return np.asarray(impl.device_fn(jnp.asarray(image), dyn_j, **static))


# ---------------------------------------------------------------------------
def test_region_properties_data(bgr):
    impl = get_impl("extraction.region_properties")
    df = impl.data_fn(bgr)
    assert list(df.columns) == [
        "region_index",
        "area",
        "perimeter",
        "centroid",
        "eccentricity",
        "solidity",
        "extent",
        "orientation",
    ]
    assert len(df) == 2
    rect = df.iloc[0]
    assert rect["area"] == 30 * 40
    assert rect["extent"] == pytest.approx(1.0)
    assert rect["solidity"] == pytest.approx(1.0, abs=0.02)
    assert rect["centroid"] == pytest.approx((34.5, 39.5))
    disk = df.iloc[1]
    assert disk["eccentricity"] < 0.2  # circle
    assert disk["perimeter"] == pytest.approx(2 * np.pi * 15, rel=0.08)
    annotated = impl.golden_fn(bgr)
    assert annotated.shape == bgr.shape
    assert (annotated != bgr).any()


def test_hu_moments_match_cv2(bgr):
    impl = get_impl("extraction.hu_moments")
    df = impl.data_fn(bgr)
    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    _, binary = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    ref = cv2.HuMoments(cv2.moments(binary)).flatten()
    np.testing.assert_allclose(df.iloc[0].to_numpy(), ref, rtol=1e-9)


def test_lbp(bgr):
    impl = get_impl("extraction.lbp")
    img = impl.golden_fn(bgr, P=8, R=1.0)
    assert img.dtype == np.uint8
    df = impl.data_fn(bgr, P=8, R=1.0)
    assert list(df.columns) == ["bin", "count"]
    assert df["count"].sum() == img.size
    device = run_device("extraction.lbp", bgr, P=8, R=1.0)
    assert (device == img).all()


def test_lbp_analytic():
    # flat region -> all neighbors equal center -> uniform pattern of all
    # ones -> code P (=8); spot check the uniform coding
    from yamimageprocessor_tpu.ops.texture import lbp_np

    flat = np.full((16, 16), 77, np.uint8)
    codes = lbp_np(flat, 8, 1.0)
    assert (codes[4:-4, 4:-4] == 8).all()


def test_haralick_matches_reference_formulation(gray):
    # reference my_greycomatrix (core/extraction.py:120-141) as oracle,
    # written independently here with python loops on a small crop
    crop = gray[40:72, 60:92]
    levels = 256
    glcm = np.zeros((levels, levels), np.float64)
    h, w = crop.shape
    dx, dy = 1, 0
    for r in range(h):
        for c in range(w):
            r2, c2 = r + dy, c + dx
            if 0 <= r2 < h and 0 <= c2 < w:
                glcm[crop[r, c], crop[r2, c2]] += 1
                glcm[crop[r2, c2], crop[r, c]] += 1
    glcm /= glcm.sum() + 1e-10

    from yamimageprocessor_tpu.ops.texture import glcm_np, glcm_props

    mine = glcm_np(crop, 1, 0.0)
    np.testing.assert_allclose(mine, glcm, atol=1e-12)

    props = glcm_props(mine)
    ii, jj = np.indices((levels, levels))
    assert props["contrast"] == pytest.approx(np.sum(glcm * (ii - jj) ** 2))
    assert props["energy"] == pytest.approx(np.sum(glcm**2))


def test_gabor_matches_cv2(bgr):
    impl = get_impl("extraction.gabor")
    params = dict(ksize=21, sigma=5.0, theta=0.3, lambd=10.0, gamma=0.5, psi=0.0)
    golden = impl.golden_fn(bgr, **params)

    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    kernel = cv2.getGaborKernel((21, 21), 5.0, 0.3, 10.0, 0.5, 0.0, ktype=cv2.CV_32F)
    filtered = cv2.filter2D(gray, cv2.CV_8UC3, kernel)
    ref = cv2.normalize(filtered, None, 0, 255, cv2.NORM_MINMAX)
    assert np.abs(golden.astype(int) - ref.astype(int)).max() <= 1

    device = run_device("extraction.gabor", bgr, **params)
    assert np.abs(device.astype(int) - golden.astype(int)).max() <= 1


def test_fourier(bgr):
    impl = get_impl("extraction.fourier")
    df = impl.data_fn(bgr, num_coeff=10)
    assert {"num_coeff", "area", "perimeter", "circularity"}.issubset(df.columns)
    assert "coeff_0_real" in df.columns and "coeff_19_imag" in df.columns
    # largest contour is the rectangle: reconstructed area close to 30*40
    assert df.iloc[0]["area"] == pytest.approx(30 * 40, rel=0.15)
    annotated = impl.golden_fn(bgr, num_coeff=10)
    yellow = (annotated[..., 1] == 255) & (annotated[..., 2] == 255)
    assert yellow.sum() > 50


def test_hog(bgr):
    impl = get_impl("extraction.hog")
    df = impl.data_fn(bgr, orientations=9, pixels_per_cell=(8, 8), cells_per_block=(3, 3))
    n_cells_r, n_cells_c = 96 // 8, 128 // 8
    expected_len = (n_cells_r - 2) * (n_cells_c - 2) * 3 * 3 * 9
    assert df.shape == (1, expected_len)
    feats = df.iloc[0].to_numpy()
    # L2-Hys: clip at 0.2 then renormalize — values stay in [0, 1]
    assert feats.max() <= 1.0 + 1e-6
    assert feats.min() >= 0.0
    viz = impl.golden_fn(bgr, orientations=9)
    assert viz.dtype == np.uint8 and viz.shape == (96, 128)

    from yamimageprocessor_tpu.ops.hogf import hog_features_j

    import jax.numpy as jnp

    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    dev_feats, _ = hog_features_j(jnp.asarray(gray))
    np.testing.assert_allclose(np.asarray(dev_feats), feats, atol=2e-5)


def test_histogram_stats_match_scipy(bgr):
    impl = get_impl("extraction.histogram")
    df = impl.data_fn(bgr)
    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    hist = cv2.calcHist([gray], [0], None, [256], [0, 256]).flatten()
    data = np.repeat(np.arange(256), hist.astype(int))
    assert df.iloc[0]["mean"] == pytest.approx(data.mean())
    assert df.iloc[0]["variance"] == pytest.approx(data.var())
    assert df.iloc[0]["skewness"] == pytest.approx(skew(data))
    assert df.iloc[0]["kurtosis"] == pytest.approx(kurtosis(data))


def test_fractal_matches_reference_boxcount(gray):
    impl = get_impl("extraction.fractal")
    df = impl.data_fn(cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR), min_box_size=2)

    _, binary = cv2.threshold(gray, 0, 1, cv2.THRESH_BINARY + cv2.THRESH_OTSU)

    def boxcount(Z, k):  # reference formulation (core/extraction.py:296-299)
        S = np.add.reduceat(
            np.add.reduceat(Z, np.arange(0, Z.shape[0], k), axis=0),
            np.arange(0, Z.shape[1], k),
            axis=1,
        )
        return len(np.where((S > 0) & (S < k * k))[0])

    sizes, counts = [], []
    k = 2
    while k <= min(binary.shape):
        sizes.append(k)
        counts.append(boxcount(binary, k))
        k *= 2
    coeffs = np.polyfit(np.log(sizes), np.log(np.maximum(counts, 1)), 1)
    assert df.iloc[0]["fractal_dimension"] == pytest.approx(-coeffs[0], abs=1e-9)


def test_approximate_shape(bgr):
    impl = get_impl("extraction.approximate_shape")
    df = impl.data_fn(bgr, error_threshold=1.0)
    assert list(df.columns) == [
        "region_index",
        "area",
        "perimeter",
        "vertices",
        "edge_lengths",
    ]
    assert len(df) == 2
    rect = df.iloc[0]
    assert rect["vertices"] <= 8  # rectangle simplifies to few vertices
    assert rect["area"] == pytest.approx(30 * 40, rel=0.15)


def test_export_segmented_regions(bgr, tmp_path):
    from yamimageprocessor_tpu.ops.extraction import export_segmented_regions

    src = tmp_path / "frame.png"
    cv2.imwrite(str(src), bgr)
    count = export_segmented_regions(bgr, src)
    assert count == 2
    out_dir = tmp_path / "frame_regions"
    exported = sorted(out_dir.glob("*.png"))
    assert len(exported) == 2
    crop = cv2.imread(str(exported[0]))
    assert crop.shape[0] >= 30 and crop.shape[1] >= 40


def test_region_properties_empty_frame_matches_reference_shape():
    """No regions -> a column-less empty DataFrame, exactly like the
    reference's row-of-dicts construction (CSV export writes no header)."""

    from yamimageprocessor_tpu.ops.registry import get_impl

    blank = np.zeros((48, 48, 3), np.uint8)
    df = get_impl("extraction.region_properties").data_fn(blank)
    assert len(df) == 0
    assert list(df.columns) == []


def test_orientation_matches_skimage_convention():
    """skimage regionprops convention (the reference's oracle): a vertical
    bar reports 0, a horizontal bar pi/2, the main diagonal -pi/4 (r3
    review: a/c were swapped and mu11 un-negated, rotating every angle)."""

    from yamimageprocessor_tpu.ops import regionprops as RP
    from yamimageprocessor_tpu.ops.labeling import label_np

    mask = np.zeros((64, 64), np.int32)
    mask[5:35, 10:13] = 1  # vertical bar
    mask[40:43, 5:45] = 2  # horizontal bar
    for t in range(20):
        mask[50 + t // 2, 30 + t // 2] = 3  # main diagonal (thick-ish)
    labels = label_np(mask > 0)
    meas = RP.measure_np(labels)
    ori = meas.orientation()
    # map raster-first labels back to our shapes via centroids
    by_shape = {}
    for region in range(1, meas.count + 1):
        r, c = meas.centroid_r[region], meas.centroid_c[region]
        if c < 20 and r < 40:
            by_shape["vertical"] = ori[region]
        elif r > 48:
            by_shape["diagonal"] = ori[region]
        else:
            by_shape["horizontal"] = ori[region]
    assert abs(by_shape["vertical"]) < 1e-6
    assert abs(abs(by_shape["horizontal"]) - np.pi / 2) < 1e-6
    assert abs(by_shape["diagonal"] + np.pi / 4) < 0.05


def test_contour_trace_visits_thin_shape_completely():
    """Boundaries that pass through the start pixel more than once must be
    fully traced (r3 review: the walk stopped at first start revisit and
    skipped whole branches)."""

    from yamimageprocessor_tpu.ops.shape import trace_external_contours

    mask = np.zeros((3, 3), np.uint8)
    mask[0, 1] = mask[1, 0] = mask[1, 2] = 1
    pts = set(map(tuple, trace_external_contours(mask)[0]))
    assert {(1, 0), (0, 1), (2, 1)} <= pts  # (x, y) of all three pixels
