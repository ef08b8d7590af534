"""Randomized scenes through the device extraction feature kernels vs the
host goldens — the fuzz twin of the fixed hardware audit's xfeat cases
(``services/parity.py``), over geometries and region populations the fixed
scene never shows: many small regions, thin diagonal structures, frames at
non-lane-aligned shapes, randomized Haralick/fractal/fourier parameters.
Tolerances per family follow the audit.
"""
from __future__ import annotations

import zlib

import numpy as np
import pytest

from yamimageprocessor_tpu.ops import extraction as EX
from yamimageprocessor_tpu.ops import extraction_device as XD
from yamimageprocessor_tpu.ops import regionprops as RP
from yamimageprocessor_tpu.ops import shape as SHp
from yamimageprocessor_tpu.ops.labeling import label_np


def _random_scene(seed: int):
    rng = np.random.default_rng(seed)
    shape = [(97, 131), (64, 200), (150, 96), (47, 311)][seed % 4]
    h, w = shape
    gray = np.zeros(shape, np.uint8)
    yy, xx = np.mgrid[:h, :w]
    # many blobs (some touching the border), a bar, and noise
    for _ in range(int(rng.integers(4, 14))):
        cy, cx = int(rng.integers(h)), int(rng.integers(w))
        r = int(rng.integers(2, max(3, min(h, w) // 6)))
        gray[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = int(rng.integers(140, 256))
    if rng.random() < 0.5:
        y0 = int(rng.integers(0, h - 4))
        gray[y0 : y0 + 3, :: int(rng.integers(1, 3))] = 210
    gray = (
        (gray.astype(np.int16) + rng.integers(-12, 13, shape))
        .clip(0, 255)
        .astype(np.uint8)
    )
    bgr = np.repeat(gray[..., None], 3, axis=-1)
    bgr[..., 1] = np.roll(gray, 2, axis=1)
    return rng, gray, bgr


@pytest.mark.parametrize("seed", range(4))
def test_fuzzed_region_features_and_solidity(seed):
    import jax

    _, _, bgr = _random_scene(seed)
    labels_np = label_np(EX._binary(bgr) > 0)
    meas = RP.measure_np(labels_np)
    if meas.count > XD.MAX_REGIONS:
        pytest.skip("scene exceeds device tier capacity")

    labels_j, feats = jax.jit(XD.region_features_j)(bgr)
    assert (np.asarray(labels_j) == labels_np).all()
    n = int(np.asarray(feats["count"]))
    assert n == meas.count
    np.testing.assert_array_equal(np.asarray(feats["area"])[: n + 1], meas.area)
    np.testing.assert_allclose(
        np.asarray(feats["perimeter"])[: n + 1], meas.perimeter, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats["centroid_r"])[: n + 1], meas.centroid_r, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats["eccentricity"])[: n + 1],
        meas.eccentricity(),
        rtol=1e-3,
        atol=1e-4,
    )

    table = XD.region_table_device(bgr)
    assert not table.get("saturated")
    np.testing.assert_array_equal(
        table["solidity"], RP.solidity_np(labels_np, meas)
    )


@pytest.mark.parametrize("seed", range(4))
def test_fuzzed_scalar_feature_families(seed):
    import jax

    rng, gray, bgr = _random_scene(seed)

    hu_d = np.asarray(jax.jit(XD.hu_features_j)(bgr))
    hu_g = SHp.hu_moments(SHp.moments_np(EX._binary(bgr)))
    np.testing.assert_allclose(hu_d, hu_g, rtol=1e-3, atol=1e-10)

    dist = int(rng.integers(1, 5))
    ang = float(rng.uniform(0.0, 2 * np.pi))
    har_d = np.asarray(
        jax.jit(lambda im: XD.haralick_features_j(im, distance=dist, angle=ang))(bgr)
    )
    pg = EX._haralick_props(bgr, dist, ang)
    har_g = np.array(
        [pg["contrast"], pg["correlation"], pg["energy"], pg["homogeneity"]]
    )
    np.testing.assert_allclose(har_d, har_g, rtol=1e-4, atol=1e-7)

    from yamimageprocessor_tpu.ops import color as Col
    from yamimageprocessor_tpu.ops import hogf as HG
    from yamimageprocessor_tpu.ops import texture as TX

    hist_d = np.asarray(jax.jit(XD.histogram_features_j)(bgr))
    hs = TX.histogram_stats_np(Col.bgr_to_gray_np(bgr))
    hist_g = np.array([hs["mean"], hs["variance"], hs["skewness"], hs["kurtosis"]])
    np.testing.assert_allclose(hist_d, hist_g, rtol=1e-3, atol=1e-4)

    mbs = int(rng.integers(2, 9))
    fr_d = float(
        np.asarray(
            jax.jit(lambda im: XD.fractal_feature_j(im, min_box_size=mbs))(bgr)
        )
    )
    fr_g = float(HG.fractal_dimension(EX._binary(bgr, maxval=1), mbs))
    assert abs(fr_d - fr_g) < 1e-3, (fr_d, fr_g, mbs)
