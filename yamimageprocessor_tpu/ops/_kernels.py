"""Host-side constructors for filter taps, LUTs and structuring elements.

These run on the host (numpy, float64) and feed both execution paths: the
golden CPU twins use them directly, the device path ships them to the chip
as small dynamic inputs so parameter changes never recompile the fused
chain.  Semantics follow the OpenCV kernels the reference calls
(``core/preprocessing.py:50-151``, ``core/segmentation.py:150-314``) and are
validated bit-for-bit against cv2 in ``tests/test_kernel_constructors.py``.
"""
from __future__ import annotations

import numpy as np

# Fixed small-aperture Gaussian taps used by OpenCV when sigma<=0 and
# ksize<=7 (cv2::getGaussianKernel small_gaussian_tab).
_SMALL_GAUSSIAN = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
    9: np.array([4, 13, 30, 51, 60, 51, 30, 13, 4], dtype=np.float64) / 256.0,
}


def gaussian_sigma_for_ksize(ksize: int) -> float:
    """Default sigma when 0 is requested (cv2.GaussianBlur contract)."""

    return 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8


def gaussian_taps(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """1-D normalized Gaussian taps matching ``cv2.getGaussianKernel``."""

    if ksize <= 0 and sigma > 0:
        ksize = int(round(sigma * 6 + 1)) | 1
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize].copy()
    sigma_x = sigma if sigma > 0 else gaussian_sigma_for_ksize(ksize)
    scale = -0.5 / (sigma_x * sigma_x)
    centre = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64) - centre
    taps = np.exp(scale * x * x)
    return taps / taps.sum()


def gaussian_ksize_for_sigma(sigma: float, depth_is_8u: bool = True) -> int:
    """Automatic aperture when ksize==0 (cv2.createGaussianFilter)."""

    factor = 3 if depth_is_8u else 4
    return int(round(sigma * factor * 2 + 1)) | 1


def gamma_lut(gamma: float) -> np.ndarray:
    """256-entry gamma LUT with the reference's exact construction
    (``core/preprocessing.py:66-71``: float64 pow then uint8 truncation)."""

    inv_gamma = 1.0 / float(gamma)
    table = (np.arange(256, dtype=np.float64) / 255.0) ** inv_gamma * 255.0
    return table.astype(np.uint8)


def equalize_lut(hist: np.ndarray) -> np.ndarray:
    """Histogram-equalization LUT with cv2.equalizeHist's exact algorithm:
    first non-zero bin maps to 0, remainder scaled by 255/(total-first)."""

    hist = np.asarray(hist, dtype=np.int64)
    total = int(hist.sum())
    lut = np.arange(256, dtype=np.uint8)
    nonzero = np.flatnonzero(hist)
    if nonzero.size == 0:
        return lut
    first = int(nonzero[0])
    remainder = total - int(hist[first])
    if remainder == 0:
        # constant image: cv2 leaves it untouched
        return lut
    # cv2 computes the scale in float32 (equalizeHist uses a float lut scale);
    # keeping f32 here makes the device path bit-identical.
    scale = np.float32(255.0) / np.float32(remainder)
    cumsum = np.cumsum(hist)
    # bins <= first map to 0; later bins scale the running sum that excludes
    # the first non-zero bin's own count.
    lut_f = (cumsum - cumsum[first]).astype(np.float32) * scale
    out = np.clip(np.rint(lut_f), 0, 255).astype(np.uint8)
    out[: first + 1] = 0
    return out


def structuring_element(shape: str, ksize: int) -> np.ndarray:
    """Binary structuring element matching ``cv2.getStructuringElement``
    for the shapes used by ``core/segmentation.py:264-314``."""

    name = shape.lower()
    rows = cols = int(ksize)
    if name == "cross":
        el = np.zeros((rows, cols), dtype=np.uint8)
        el[rows // 2, :] = 1
        el[:, cols // 2] = 1
        return el
    if name == "elliptical":
        el = np.zeros((rows, cols), dtype=np.uint8)
        r, c = rows // 2, cols // 2
        inv_r2 = 1.0 / (r * r) if r else 0.0
        for i in range(rows):
            dy = i - r
            if abs(dy) <= r:
                dx = int(np.clip(round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)), 0, None))
                j1 = max(c - dx, 0)
                j2 = min(c + dx + 1, cols)
                el[i, j1:j2] = 1
        return el
    # "rectangular" and unknown shapes fall back to a full box
    # (core/segmentation.py:272-273).
    return np.ones((rows, cols), dtype=np.uint8)


def deriv_taps(order: int, ksize: int) -> np.ndarray:
    """1-D Sobel derivative taps matching ``cv2.getDerivKernels``."""

    if ksize == 1:
        if order == 0:
            return np.array([1.0])
        if order == 1:
            return np.array([-1.0, 0.0, 1.0])
        return np.array([1.0, -2.0, 1.0])
    ker = np.zeros(ksize + 1, dtype=np.float64)
    ker[0] = 1.0
    for _ in range(ksize - order - 1):
        old = ker[0]
        for j in range(1, ksize + 1):
            new = ker[j] + ker[j - 1]
            ker[j - 1] = old
            old = new
    for _ in range(order):
        old = -ker[0]
        for j in range(1, ksize + 1):
            new = ker[j - 1] - ker[j]
            ker[j - 1] = old
            old = new
    return ker[:ksize].copy()


def sobel_kernels(dx: int, dy: int, ksize: int) -> tuple[np.ndarray, np.ndarray]:
    """(kx, ky) separable taps for cv2.Sobel semantics."""

    return deriv_taps(dx, ksize), deriv_taps(dy, ksize)


def laplacian_kernel(ksize: int) -> np.ndarray:
    """Dense Laplacian aperture (cv2.Laplacian): sum of second derivatives."""

    if ksize == 1:
        return np.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]])
    kx2 = deriv_taps(2, ksize)
    smooth = deriv_taps(0, ksize)
    return np.outer(smooth, kx2) + np.outer(kx2, smooth)


def gabor_kernel(
    ksize: int,
    sigma: float,
    theta: float,
    lambd: float,
    gamma: float,
    psi: float,
) -> np.ndarray:
    """Real Gabor kernel matching ``cv2.getGaborKernel`` (CV_32F)."""

    sigma_x = sigma
    sigma_y = sigma / gamma
    c, s = np.cos(theta), np.sin(theta)
    if ksize > 0:
        xmax = ymax = ksize // 2
    else:
        xmax = int(np.ceil(max(abs(3 * sigma_x * c), abs(3 * sigma_y * s))))
        ymax = int(np.ceil(max(abs(3 * sigma_x * s), abs(3 * sigma_y * c))))
    y, x = np.mgrid[-ymax : ymax + 1, -xmax : xmax + 1].astype(np.float64)
    xr = x * c + y * s
    yr = -x * s + y * c
    ex = -0.5 / (sigma_x * sigma_x)
    ey = -0.5 / (sigma_y * sigma_y)
    cscale = 2.0 * np.pi / lambd
    kernel = np.exp(ex * xr * xr + ey * yr * yr) * np.cos(cscale * xr + psi)
    # cv2 stores kernel.at(ymax - y, xmax - x): both axes are flipped.
    return kernel[::-1, ::-1].astype(np.float32)


def bilateral_space_weights(ksize: int, sigma_space: float) -> tuple[np.ndarray, np.ndarray]:
    """(weights, mask) over a circular window (cv2.bilateralFilter layout).

    ``d=ksize`` > 0 in the reference call (``core/preprocessing.py:90``), so
    radius = d // 2 and offsets with distance > radius are excluded.
    """

    radius = max(int(ksize) // 2, 1)
    coeff = -0.5 / (sigma_space * sigma_space)
    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1].astype(np.float64)
    dist = np.sqrt(dx * dx + dy * dy)
    mask = dist <= radius
    weights = np.exp(coeff * (dist * dist)) * mask
    return weights, mask


def bilateral_color_weights(sigma_color: float, channels: int) -> np.ndarray:
    """LUT of color weights exp(-k^2/(2 sc^2)) for k = sum abs channel diff."""

    coeff = -0.5 / (sigma_color * sigma_color)
    k = np.arange(256 * channels, dtype=np.float64)
    return np.exp(coeff * k * k)


__all__ = [
    "gaussian_taps",
    "gaussian_sigma_for_ksize",
    "gaussian_ksize_for_sigma",
    "gamma_lut",
    "equalize_lut",
    "structuring_element",
    "deriv_taps",
    "sobel_kernels",
    "laplacian_kernel",
    "gabor_kernel",
    "bilateral_space_weights",
    "bilateral_color_weights",
]
