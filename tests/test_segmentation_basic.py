"""Segmentation parity — thresholds, edges, morphology, border removal.

cv2 oracle calls mirror ``core/segmentation.py:79-169,262-325``.
"""
from __future__ import annotations

import cv2
import numpy as np
import pytest

from yamimageprocessor_tpu.ops.registry import get_impl


def _blobs(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.uint8)
    yy, xx = np.mgrid[:h, :w]
    for cy, cx, r, v in ((25, 30, 14, 200), (60, 80, 18, 160), (70, 25, 10, 230)):
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = v
    img = img + rng.integers(0, 40, (h, w), dtype=np.uint8)
    return img


@pytest.fixture()
def gray():
    return _blobs()


@pytest.fixture()
def bgr(gray):
    return cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)


def run_device(identifier, image, **params):
    import jax.numpy as jnp

    impl = get_impl(identifier)
    static, dyn = impl.split_params(params, image.shape)
    dyn_j = {k: jnp.asarray(v) for k, v in dyn.items()}
    return np.asarray(impl.device_fn(jnp.asarray(image), dyn_j, **static))


def triple(identifier, image, cv2_fn, max_cv2=0, max_dev=0, **params):
    impl = get_impl(identifier)
    golden = impl.golden_fn(image, **params)
    oracle = cv2_fn(image)
    d1 = np.abs(golden.astype(np.int32) - oracle.astype(np.int32)).max()
    assert d1 <= max_cv2, f"{identifier} golden vs cv2: {d1}"
    device = run_device(identifier, image, **params)
    d2 = np.abs(device.astype(np.int32) - golden.astype(np.int32)).max()
    assert d2 <= max_dev, f"{identifier} device vs golden: {d2}"
    return golden


def test_global_threshold(bgr):
    def oracle(im):
        g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        _, th = cv2.threshold(g, 127, 255, cv2.THRESH_BINARY)
        return th

    triple("segmentation.global_threshold", bgr, oracle, threshold=127)


def test_otsu(bgr):
    def oracle(im):
        g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        _, th = cv2.threshold(g, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        return th

    triple("segmentation.otsu", bgr, oracle)


def test_otsu_threshold_value_matches_cv2(gray):
    from yamimageprocessor_tpu.ops.threshold import otsu_threshold_np

    ref, _ = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    assert otsu_threshold_np(gray) == int(ref)


def test_adaptive(bgr):
    def oracle(im):
        g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        return cv2.adaptiveThreshold(
            g, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, cv2.THRESH_BINARY, 11, 2
        )

    impl = get_impl("segmentation.adaptive")
    golden = impl.golden_fn(bgr, block_size=11, C=2)
    oracle_img = oracle(bgr)
    # cv2's gaussian mean is 16-bit fixed point; mask may flip where the
    # pixel sits exactly at the boundary — require near-total agreement
    agree = (golden == oracle_img).mean()
    assert agree > 0.995, agree
    device = run_device("segmentation.adaptive", bgr, block_size=11, C=2)
    assert (device == golden).all()


def test_sobel(bgr):
    def oracle(im):
        g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        gx = cv2.Sobel(g, cv2.CV_64F, 1, 0, ksize=3)
        gy = cv2.Sobel(g, cv2.CV_64F, 0, 1, ksize=3)
        return np.uint8(np.clip(cv2.magnitude(gx, gy), 0, 255))

    triple("segmentation.sobel", bgr, oracle, max_cv2=1, ksize=3)


def test_prewitt(bgr):
    def oracle(im):
        g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        kx = np.array([[1, 0, -1], [1, 0, -1], [1, 0, -1]])
        ky = np.array([[1, 1, 1], [0, 0, 0], [-1, -1, -1]])
        gx = cv2.filter2D(g, -1, kx)
        gy = cv2.filter2D(g, -1, ky)
        return np.uint8(
            np.clip(cv2.magnitude(gx.astype(np.float32), gy.astype(np.float32)), 0, 255)
        )

    triple("segmentation.prewitt", bgr, oracle, max_cv2=1)


def test_laplacian(bgr):
    def oracle(im):
        g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        lap = cv2.Laplacian(g, cv2.CV_64F, ksize=3)
        return np.uint8(np.clip(np.abs(lap), 0, 255))

    triple("segmentation.laplacian", bgr, oracle, max_cv2=1, ksize=3)


@pytest.mark.parametrize("method,cvop", [
    ("segmentation.opening", cv2.MORPH_OPEN),
    ("segmentation.closing", cv2.MORPH_CLOSE),
])
@pytest.mark.parametrize("shape", ["Rectangular", "Elliptical", "Cross"])
def test_morph_open_close(gray, method, cvop, shape):
    shapes = {
        "Rectangular": cv2.MORPH_RECT,
        "Elliptical": cv2.MORPH_ELLIPSE,
        "Cross": cv2.MORPH_CROSS,
    }
    mask = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)[1]

    def oracle(im):
        k = cv2.getStructuringElement(shapes[shape], (5, 5))
        return cv2.morphologyEx(im, cvop, k, iterations=2)

    triple(method, mask, oracle, kernel_shape=shape, kernel_size=5, iterations=2)


def test_dilate_erode(gray):
    mask = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)[1]
    k = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    triple(
        "segmentation.dilation",
        mask,
        lambda im: cv2.dilate(im, k, iterations=3),
        kernel_shape="Rectangular",
        kernel_size=3,
        iterations=3,
    )
    triple(
        "segmentation.erosion",
        mask,
        lambda im: cv2.erode(im, k, iterations=2),
        kernel_shape="Rectangular",
        kernel_size=3,
        iterations=2,
    )


def test_morph_color_image(bgr):
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    triple(
        "segmentation.dilation",
        bgr,
        lambda im: cv2.dilate(im, k, iterations=1),
        kernel_shape="Elliptical",
        kernel_size=5,
        iterations=1,
    )


def test_border_removal(bgr):
    def oracle(im):
        mask = np.ones(im.shape[:2], dtype=np.uint8) * 255
        mask[10:-10, 10:-10] = 0
        out = im.copy()
        out[mask == 255] = [0, 0, 0]
        return out

    triple("segmentation.border_removal", bgr, oracle, border_distance=10)


def test_edge_canny(bgr):
    def oracle(im):
        g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
        edges = cv2.Canny(g, 50, 150, apertureSize=3)
        return cv2.dilate(edges, np.ones((3, 3), np.uint8), iterations=1)

    triple(
        "segmentation.edge",
        bgr,
        oracle,
        low_threshold=50,
        high_threshold=150,
        aperture_size=3,
    )


def test_label_j_converges_on_high_turn_spiral(rng):
    """A fixed 256-round cap silently fragmented high-turn components
    (r3 review); the bound is now the true convergence limit."""

    import jax.numpy as jnp

    from yamimageprocessor_tpu.ops.labeling import label_j, label_np

    side = 129
    mask = np.zeros((side, side), bool)
    # square spiral, pitch 2: one connected component with ~side turns
    top, left, bottom, right = 0, 0, side - 1, side - 1
    while left <= right and top <= bottom:
        mask[top, left : right + 1] = True
        mask[top : bottom + 1, right] = True
        if top != bottom:
            mask[bottom, left : right + 1] = True
        if left != right and bottom - 1 >= top + 2:
            mask[top + 2 : bottom + 1, left] = True
        top += 2
        left += 2
        bottom -= 2
        right -= 2
    golden = label_np(mask)
    device = np.asarray(label_j(jnp.asarray(mask)))
    assert (device == golden).all()
    assert device.max() == golden.max()
