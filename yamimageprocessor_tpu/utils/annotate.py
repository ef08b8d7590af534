"""Host-side annotation drawing (preview overlays, region boxes, labels).

The reference draws overlays with cv2 primitives (rectangles / circles /
polylines / text) directly inside its kernels; here annotation is a host
finalization concern — the device path produces data (masks, boxes, contour
points) and these numpy helpers render them for previews and annotated
exports.  Semantics follow the cv2 calls cited per function.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

BGRColor = Tuple[int, int, int]


def _as_color(image: np.ndarray, color: BGRColor):
    if image.ndim == 2:
        # grayscale target: use the luminance-ish mean of the BGR triple
        return np.uint8(sum(color) // 3)
    return np.array(color[: image.shape[2]], dtype=np.uint8)


def fill_rect(image: np.ndarray, x0: int, y0: int, x1: int, y1: int, color: BGRColor):
    """In-place filled rectangle, inclusive corners (cv2.rectangle thickness=-1)."""

    h, w = image.shape[:2]
    xa, xb = sorted((int(x0), int(x1)))
    ya, yb = sorted((int(y0), int(y1)))
    xa, ya = max(xa, 0), max(ya, 0)
    xb, yb = min(xb, w - 1), min(yb, h - 1)
    if xa > xb or ya > yb:
        return image
    image[ya : yb + 1, xa : xb + 1] = _as_color(image, color)
    return image


def rect_border(
    image: np.ndarray,
    x0: int,
    y0: int,
    x1: int,
    y1: int,
    color: BGRColor,
    thickness: int = 2,
):
    """Rectangle outline; thickness grows symmetrically like cv2.rectangle."""

    lo = -(thickness // 2)
    hi = thickness - thickness // 2
    for off in range(lo, hi):
        xa, ya, xb, yb = x0 - off, y0 - off, x1 + off, y1 + off
        h, w = image.shape[:2]
        cxa, cxb = max(min(xa, xb), 0), min(max(xa, xb), w - 1)
        cya, cyb = max(min(ya, yb), 0), min(max(ya, yb), h - 1)
        if cxa > cxb or cya > cyb:
            continue
        col = _as_color(image, color)
        if 0 <= ya < h:
            image[ya, cxa : cxb + 1] = col
        if 0 <= yb < h:
            image[yb, cxa : cxb + 1] = col
        if 0 <= xa < w:
            image[cya : cyb + 1, xa] = col
        if 0 <= xb < w:
            image[cya : cyb + 1, xb] = col
    return image


def blend(overlay: np.ndarray, image: np.ndarray, alpha: float) -> np.ndarray:
    """cv2.addWeighted(overlay, alpha, image, 1-alpha, 0) semantics."""

    out = (
        overlay.astype(np.float32) * np.float32(alpha)
        + image.astype(np.float32) * np.float32(1.0 - alpha)
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def crop_overlay(
    image: np.ndarray, x_offset: int, y_offset: int, width: int, height: int
) -> np.ndarray:
    """Green crop-region preview (core/preprocessing.py:131-150)."""

    overlay = image.copy()
    fill_rect(overlay, x_offset, y_offset, x_offset + width, y_offset + height, (0, 255, 0))
    out = blend(overlay, image, 0.3)
    rect_border(
        out, x_offset, y_offset, x_offset + width, y_offset + height, (0, 255, 0), 2
    )
    return out


def draw_disk(image: np.ndarray, cx: int, cy: int, radius: int, color: BGRColor):
    """Filled circle (cv2.circle thickness=-1)."""

    h, w = image.shape[:2]
    y, x = np.ogrid[:h, :w]
    mask = (x - cx) ** 2 + (y - cy) ** 2 <= radius * radius
    image[mask] = _as_color(image, color)
    return image


def draw_polyline(
    image: np.ndarray,
    points: np.ndarray,
    color: BGRColor,
    thickness: int = 2,
    closed: bool = True,
):
    """Polyline rasterized with thick Bresenham segments (cv2.polylines)."""

    pts = np.asarray(points, dtype=np.int64).reshape(-1, 2)
    n = len(pts)
    if n == 0:
        return image
    seg_end = n if closed else n - 1
    for i in range(seg_end):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        _draw_line(image, int(x0), int(y0), int(x1), int(y1), color, thickness)
    return image


def _draw_line(image, x0, y0, x1, y1, color, thickness):
    h, w = image.shape[:2]
    col = _as_color(image, color)
    steps = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.rint(np.linspace(x0, x1, steps)).astype(np.int64)
    ys = np.rint(np.linspace(y0, y1, steps)).astype(np.int64)
    r = max(thickness // 2, 0)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            xi = np.clip(xs + dx, 0, w - 1)
            yi = np.clip(ys + dy, 0, h - 1)
            image[yi, xi] = col
    return image


def draw_text(image: np.ndarray, text: str, org: Tuple[int, int], color: BGRColor,
              scale: float = 0.6, thickness: int = 2) -> np.ndarray:
    """Text annotation. Uses cv2's Hershey font when cv2 is available
    (matching e.g. core/extraction.py:97), else a no-op fallback."""

    try:
        import cv2

        cv2.putText(
            image, text, org, cv2.FONT_HERSHEY_SIMPLEX, scale,
            tuple(int(c) for c in color), thickness,
        )
    except ImportError:
        pass
    return image


__all__ = [
    "fill_rect",
    "rect_border",
    "blend",
    "crop_overlay",
    "draw_disk",
    "draw_polyline",
    "draw_text",
]
