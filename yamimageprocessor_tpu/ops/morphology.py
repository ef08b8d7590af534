"""Morphological operators: erode / dilate / open / close.

Reference: ``core/segmentation.py:262-314`` (cv2.morphologyEx with
rect/ellipse/cross structuring elements).  cv2's default border value is
+inf for erosion and -inf for dilation, i.e. out-of-bounds pixels never
constrain the window extreme — reproduced here by padding with the dtype's
extreme value.  Pure integer min/max: the numpy and jnp paths are bit-exact,
on every pixel including borders.

The device path uses a separable fast path for rectangular elements (row
min/max then column min/max) and per-row horizontal-run decomposition for
ellipses, so large structuring elements stay O(k) not O(k^2).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from yamimageprocessor_tpu.ops._kernels import structuring_element


def _pad_value(dtype, erode: bool):
    if np.issubdtype(np.dtype(dtype), np.integer):
        info = np.iinfo(np.dtype(dtype))
        return info.max if erode else info.min
    return np.inf if erode else -np.inf


def _se_offsets(se: np.ndarray) -> List[Tuple[int, int]]:
    r = se.shape[0] // 2
    return [(int(dy) - r, int(dx) - r) for dy, dx in np.argwhere(se > 0)]


def _se_rows(se: np.ndarray) -> List[Tuple[int, int, int]]:
    """(dy, dx_start, run_length) horizontal runs of the element."""

    r = se.shape[0] // 2
    rows = []
    for i in range(se.shape[0]):
        idx = np.flatnonzero(se[i])
        if idx.size:
            rows.append((i - r, int(idx[0]) - r, int(idx[-1] - idx[0] + 1)))
    return rows


# ---------------------------------------------------------------------------
# numpy path
def _morph_once_np(img: np.ndarray, se: np.ndarray, erode: bool) -> np.ndarray:
    r = se.shape[0] // 2
    if r == 0:
        return img.copy()
    fill = _pad_value(img.dtype, erode)
    pad = [(r, r), (r, r)] + [(0, 0)] * (img.ndim - 2)
    work = np.pad(img, pad, mode="constant", constant_values=fill)
    h, w = img.shape[:2]
    out = np.full_like(img, fill)
    reduce_fn = np.minimum if erode else np.maximum
    for dy, dx in _se_offsets(se):
        out = reduce_fn(out, work[r + dy : r + dy + h, r + dx : r + dx + w])
    return out


def erode_np(img: np.ndarray, se: np.ndarray, iterations: int = 1) -> np.ndarray:
    for _ in range(max(int(iterations), 1) if iterations else 0):
        img = _morph_once_np(img, se, erode=True)
    return img


def dilate_np(img: np.ndarray, se: np.ndarray, iterations: int = 1) -> np.ndarray:
    for _ in range(max(int(iterations), 1) if iterations else 0):
        img = _morph_once_np(img, se, erode=False)
    return img


def open_np(img: np.ndarray, se: np.ndarray, iterations: int = 1) -> np.ndarray:
    # cv2.morphologyEx(OPEN, iterations=N) = erode^N then dilate^N
    return dilate_np(erode_np(img, se, iterations), se, iterations)


def close_np(img: np.ndarray, se: np.ndarray, iterations: int = 1) -> np.ndarray:
    return erode_np(dilate_np(img, se, iterations), se, iterations)


# ---------------------------------------------------------------------------
# jnp path
def _run_extreme_1d_j(work, axis: int, length: int, erode: bool):
    """Running min/max of ``length`` consecutive elements along ``axis``."""

    import jax.numpy as jnp

    fn = jnp.minimum if erode else jnp.maximum
    # direct offsets (length is small/static): min over `length` shifted slices
    slices = []
    for off in range(length):
        idx = [slice(None)] * work.ndim
        idx[axis] = slice(off, off + work.shape[axis] - length + 1)
        slices.append(work[tuple(idx)])
    res = slices[0]
    for s in slices[1:]:
        res = fn(res, s)
    return res


def _morph_once_j(img, se: np.ndarray, erode: bool):
    import jax.numpy as jnp

    r = se.shape[0] // 2
    if r == 0:
        return img
    fill = _pad_value(img.dtype, erode)
    fn = jnp.minimum if erode else jnp.maximum
    h, w = img.shape[0], img.shape[1]
    pad = [(r, r), (r, r)] + [(0, 0)] * (img.ndim - 2)
    work = jnp.pad(img, pad, mode="constant", constant_values=fill)

    rows = _se_rows(se)
    widths = sorted({run for _, _, run in rows})
    # horizontal running extreme per distinct run width
    horiz = {}
    for run in widths:
        horiz[run] = _run_extreme_1d_j(work, 1, run, erode)
    out = None
    for dy, dx_start, run in rows:
        src = horiz[run]
        # src has width (w + 2r - run + 1); column j of output reads
        # src[:, j + dx_start + r]
        col0 = dx_start + r
        sl = [slice(r + dy, r + dy + h), slice(col0, col0 + w)]
        sl += [slice(None)] * (img.ndim - 2)
        piece = src[tuple(sl)]
        out = piece if out is None else fn(out, piece)
    return out


def erode_j(img, se: np.ndarray, iterations: int = 1):
    for _ in range(max(int(iterations), 1) if iterations else 0):
        img = _morph_once_j(img, se, erode=True)
    return img


def dilate_j(img, se: np.ndarray, iterations: int = 1):
    for _ in range(max(int(iterations), 1) if iterations else 0):
        img = _morph_once_j(img, se, erode=False)
    return img


def open_j(img, se: np.ndarray, iterations: int = 1):
    return dilate_j(erode_j(img, se, iterations), se, iterations)


def close_j(img, se: np.ndarray, iterations: int = 1):
    return erode_j(dilate_j(img, se, iterations), se, iterations)


def make_se(kernel_shape: str, kernel_size: int) -> np.ndarray:
    return structuring_element(kernel_shape, int(kernel_size))


__all__ = [
    "make_se",
    "erode_np",
    "dilate_np",
    "open_np",
    "close_np",
    "erode_j",
    "dilate_j",
    "open_j",
    "close_j",
]
