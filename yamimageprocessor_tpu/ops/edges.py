"""Gradient / edge operators: Sobel, Prewitt, Laplacian, Canny.

Reference kernels: ``core/segmentation.py:116-169``.  Sobel/Laplacian follow
cv2's separable derivative kernels (:func:`..ops._kernels.deriv_taps`);
Canny reproduces cv2's integer pipeline exactly: int16 Sobel gradients,
L1 magnitude, fixed-point sector non-max suppression (TG22 = 13573 / 2^15)
and hysteresis as 8-connected reachability from strong seeds — reachability
is order-independent, so the device's iterative propagation and the golden
BFS produce bit-identical masks.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi

from yamimageprocessor_tpu.ops import _kernels as K

_TG22 = 13573  # tan(22.5 deg) * 2^15 + 0.5
_SHIFT = 15


# ---------------------------------------------------------------------------
# integer separable correlation (exact, shared semantics)
def _sep_int_np(
    img: np.ndarray, ky: np.ndarray, kx: np.ndarray, mode: str = "reflect"
) -> np.ndarray:
    ry, rx = len(ky) // 2, len(kx) // 2
    pad = [(ry, ry), (rx, rx)]
    work = np.pad(img.astype(np.int32), pad, mode=mode)
    h, w = img.shape
    acc = np.zeros((work.shape[0], w), dtype=np.int32)
    for i, t in enumerate(np.asarray(kx, dtype=np.int64).astype(np.int32)):
        acc += t * work[:, i : i + w]
    out = np.zeros((h, w), dtype=np.int32)
    for j, t in enumerate(np.asarray(ky, dtype=np.int64).astype(np.int32)):
        out += t * acc[j : j + h]
    return out


def _sep_int_j(img, ky: np.ndarray, kx: np.ndarray, mode: str = "reflect"):
    import jax.numpy as jnp

    ry, rx = len(ky) // 2, len(kx) // 2
    work = jnp.pad(img.astype(jnp.int32), [(ry, ry), (rx, rx)], mode=mode)
    h, w = img.shape
    acc = jnp.zeros((work.shape[0], w), dtype=jnp.int32)
    for i, t in enumerate(np.asarray(kx).astype(int).tolist()):
        acc = acc + t * work[:, i : i + w]
    out = jnp.zeros((h, w), dtype=jnp.int32)
    for j, t in enumerate(np.asarray(ky).astype(int).tolist()):
        out = out + t * acc[j : j + h]
    return out


# ---------------------------------------------------------------------------
# exact integer floor(sqrt(s)): float sqrt + one-step correction.  Removes
# the 1-ulp numpy/XLA sqrt ambiguity so truncation to uint8 is bit-stable.
def _isqrt_np(s: np.ndarray) -> np.ndarray:
    c = np.sqrt(s.astype(np.float64)).astype(np.int64)
    c = np.where((c + 1) * (c + 1) <= s, c + 1, c)
    c = np.where(c * c > s, c - 1, c)
    return c


def _isqrt_j(s):
    # int32 is safe: |g| <= 255 * sum|taps| < 2^15 for aperture <= 7, so
    # gx^2 + gy^2 < 2^31.
    import jax.numpy as jnp

    s = s.astype(jnp.int32)
    c = jnp.sqrt(s.astype(jnp.float32)).astype(jnp.int32)
    c = jnp.where((c + 1) * (c + 1) <= s, c + 1, c)
    c = jnp.where(c * c > s, c - 1, c)
    return c


# ---------------------------------------------------------------------------
# Sobel magnitude op (core/segmentation.py:150-155)
def sobel_np(gray: np.ndarray, ksize: int = 3) -> np.ndarray:
    kx_d, kx_s = K.deriv_taps(1, ksize), K.deriv_taps(0, ksize)
    gx = _sep_int_np(gray, kx_s, kx_d).astype(np.int64)
    gy = _sep_int_np(gray, kx_d, kx_s).astype(np.int64)
    # np.uint8(np.clip(sqrt, 0, 255)) truncates (core/segmentation.py:155)
    # == min(floor(sqrt(gx^2+gy^2)), 255), computed as an exact isqrt.
    mag = _isqrt_np(gx * gx + gy * gy)
    return np.clip(mag, 0, 255).astype(np.uint8)


def sobel_j(gray, ksize: int = 3):
    import jax.numpy as jnp

    kx_d, kx_s = K.deriv_taps(1, ksize), K.deriv_taps(0, ksize)
    gx = _sep_int_j(gray, kx_s, kx_d)
    gy = _sep_int_j(gray, kx_d, kx_s)
    mag = _isqrt_j(gx * gx + gy * gy)
    return jnp.clip(mag, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Prewitt (core/segmentation.py:157-164): filter2D ddepth=-1 saturates to
# uint8 before the magnitude.
_PREWITT_X = np.array([[1, 0, -1], [1, 0, -1], [1, 0, -1]], dtype=np.int32)
_PREWITT_Y = np.array([[1, 1, 1], [0, 0, 0], [-1, -1, -1]], dtype=np.int32)


def prewitt_np(gray: np.ndarray) -> np.ndarray:
    gx = np.clip(_filter2d_int_np(gray, _PREWITT_X), 0, 255).astype(np.int64)
    gy = np.clip(_filter2d_int_np(gray, _PREWITT_Y), 0, 255).astype(np.int64)
    mag = _isqrt_np(gx * gx + gy * gy)
    return np.clip(mag, 0, 255).astype(np.uint8)


def _filter2d_int_np(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    kh, kw = kernel.shape
    ry, rx = kh // 2, kw // 2
    work = np.pad(img.astype(np.int32), [(ry, ry), (rx, rx)], mode="reflect")
    h, w = img.shape
    out = np.zeros((h, w), dtype=np.int32)
    for j in range(kh):
        for i in range(kw):
            out += int(kernel[j, i]) * work[j : j + h, i : i + w]
    return out


def prewitt_j(gray):
    import jax.numpy as jnp

    def filt(kernel):
        kh, kw = kernel.shape
        ry, rx = kh // 2, kw // 2
        work = jnp.pad(gray.astype(jnp.int32), [(ry, ry), (rx, rx)], mode="reflect")
        h, w = gray.shape
        out = jnp.zeros((h, w), dtype=jnp.int32)
        for j in range(kh):
            for i in range(kw):
                out = out + int(kernel[j, i]) * work[j : j + h, i : i + w]
        return out

    gx = jnp.clip(filt(_PREWITT_X), 0, 255)
    gy = jnp.clip(filt(_PREWITT_Y), 0, 255)
    mag = _isqrt_j(gx * gx + gy * gy)
    return jnp.clip(mag, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Laplacian (core/segmentation.py:166-169)
def laplacian_np(gray: np.ndarray, ksize: int = 3) -> np.ndarray:
    kernel = K.laplacian_kernel(ksize).astype(np.int64)
    out = _filter2d_int_np(gray, kernel).astype(np.float32)
    return np.clip(np.abs(out), 0, 255).astype(np.uint8)


def laplacian_j(gray, ksize: int = 3):
    import jax.numpy as jnp

    kernel = K.laplacian_kernel(ksize).astype(np.int64)
    kh, kw = kernel.shape
    ry, rx = kh // 2, kw // 2
    work = jnp.pad(gray.astype(jnp.int32), [(ry, ry), (rx, rx)], mode="reflect")
    h, w = gray.shape
    out = jnp.zeros((h, w), dtype=jnp.int32)
    for j in range(kh):
        for i in range(kw):
            c = int(kernel[j, i])
            if c:
                out = out + c * work[j : j + h, i : i + w]
    return jnp.clip(jnp.abs(out).astype(jnp.float32), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Canny (cv2 semantics)
def _canny_candidates_np(gray, low: int, aperture: int):
    kd, ks = K.deriv_taps(1, aperture), K.deriv_taps(0, aperture)
    # cv2.Canny computes its Sobel with BORDER_REPLICATE (validated exact)
    gx = _sep_int_np(gray, ks, kd, mode="edge")
    gy = _sep_int_np(gray, kd, ks, mode="edge")
    mag = np.abs(gx) + np.abs(gy)
    h, w = gray.shape
    magp = np.pad(mag, 1, constant_values=0)

    m = mag
    x = np.abs(gx)
    y = np.abs(gy).astype(np.int64) << _SHIFT
    tg22x = x.astype(np.int64) * _TG22
    tg67x = tg22x + ((x.astype(np.int64) + x) << _SHIFT)

    left, right = magp[1:-1, :-2], magp[1:-1, 2:]
    up, down = magp[:-2, 1:-1], magp[2:, 1:-1]
    up_left, up_right = magp[:-2, :-2], magp[:-2, 2:]
    down_left, down_right = magp[2:, :-2], magp[2:, 2:]

    horiz = (y < tg22x) & (m > left) & (m >= right)
    vert = (y > tg67x) & (m > up) & (m >= down)
    s_neg = (gx ^ gy) < 0
    # s=1: compare along the main diagonal; s=-1: anti-diagonal
    diag_pos = (~s_neg) & (m > up_left) & (m > down_right)
    diag_neg = s_neg & (m > up_right) & (m > down_left)
    diag = (y >= tg22x) & (y <= tg67x) & (diag_pos | diag_neg)

    nms = (m > low) & (horiz | vert | diag)
    return nms, mag


def canny_np(gray: np.ndarray, low: int, high: int, aperture: int = 3) -> np.ndarray:
    low_i, high_i = int(np.floor(low)), int(np.floor(high))
    if low_i > high_i:
        low_i, high_i = high_i, low_i
    nms, mag = _canny_candidates_np(gray, low_i, aperture)
    strong = nms & (mag > high_i)
    # hysteresis: weak candidates 8-connected to a strong seed
    lab, _ = ndi.label(nms, structure=np.ones((3, 3)))
    keep = np.zeros(lab.max() + 1, dtype=bool)
    keep[np.unique(lab[strong])] = True
    keep[0] = False
    edges = keep[lab]
    return (edges * 255).astype(np.uint8)


def canny_j(gray, low_i, high_i, aperture: int = 3):
    """``low_i``/``high_i`` are (traced) int32 scalars, already floored and
    ordered by the caller."""

    import jax
    import jax.numpy as jnp

    kd, ks = K.deriv_taps(1, aperture), K.deriv_taps(0, aperture)
    gx = _sep_int_j(gray, ks, kd, mode="edge")
    gy = _sep_int_j(gray, kd, ks, mode="edge")
    mag = jnp.abs(gx) + jnp.abs(gy)
    h, w = gray.shape
    magp = jnp.pad(mag, 1, constant_values=0)

    m = mag
    x = jnp.abs(gx)
    # keep the fixed-point comparison in float64-free integer range: use
    # int64-equivalent via two int32 comparisons is overkill — int32 overflows
    # when |gy| << 15 for |gy| > 65535, which cannot happen for aperture<=7 on
    # uint8 inputs (|gy| <= 255 * sum|k| < 2^16).
    y = jnp.abs(gy) << _SHIFT
    tg22x = x * _TG22
    tg67x = tg22x + ((x + x) << _SHIFT)

    left, right = magp[1:-1, :-2], magp[1:-1, 2:]
    up, down = magp[:-2, 1:-1], magp[2:, 1:-1]
    up_left, up_right = magp[:-2, :-2], magp[:-2, 2:]
    down_left, down_right = magp[2:, :-2], magp[2:, 2:]

    horiz = (y < tg22x) & (m > left) & (m >= right)
    vert = (y > tg67x) & (m > up) & (m >= down)
    s_neg = (gx ^ gy) < 0
    diag_pos = (~s_neg) & (m > up_left) & (m > down_right)
    diag_neg = s_neg & (m > up_right) & (m > down_left)
    diag = (y >= tg22x) & (y <= tg67x) & (diag_pos | diag_neg)

    nms = (m > low_i) & (horiz | vert | diag)
    strong = nms & (mag > high_i)

    def dilate8(mask):
        p = jnp.pad(mask, 1, constant_values=False)
        out = mask
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                out = out | p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        return out

    def cond(state):
        edges, prev = state
        return jnp.any(edges != prev)

    def body(state):
        edges, _ = state
        return (nms & dilate8(edges)) | strong, edges

    edges, _ = jax.lax.while_loop(
        cond, body, ((nms & dilate8(strong)) | strong, strong)
    )
    return jnp.where(edges, jnp.uint8(255), jnp.uint8(0))


__all__ = [
    "sobel_np",
    "sobel_j",
    "prewitt_np",
    "prewitt_j",
    "laplacian_np",
    "laplacian_j",
    "canny_np",
    "canny_j",
]
