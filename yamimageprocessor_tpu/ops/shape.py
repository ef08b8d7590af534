"""Shape analysis: image moments, Hu invariants, contours, polygon tools.

Reference kernels: ``core/extraction.py:90-105`` (cv2.moments/HuMoments on
the Otsu mask), ``:204-245`` (Fourier descriptors of the largest external
contour), ``:339-421`` (approxPolyDP with epsilon auto-tuning).

* moments/Hu — closed-form sums, device-friendly (a handful of weighted
  reductions); identical to cv2's definitions;
* contour tracing — Moore-neighbor border following of external boundaries
  (host; sequential by nature, the reference's cv2.findContours is too);
* polygon simplification — Douglas-Peucker (cv2.approxPolyDP semantics);
* point-polygon distance — signed distance (cv2.pointPolygonTest semantics).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# moments + Hu invariants
def moments_np(image: np.ndarray) -> Dict[str, float]:
    """Raw/central/normalized moments of an intensity image
    (cv2.moments semantics: values are weights)."""

    img = image.astype(np.float64)
    h, w = img.shape
    y, x = np.mgrid[:h, :w].astype(np.float64)
    m = {}
    for p in range(4):
        for q in range(4):
            if p + q <= 3:
                m[f"m{p}{q}"] = float((img * (x**p) * (y**q)).sum())
    m00 = m["m00"] if m["m00"] != 0 else 1.0
    cx = m["m10"] / m00
    cy = m["m01"] / m00
    for p in range(4):
        for q in range(4):
            if 2 <= p + q <= 3:
                m[f"mu{p}{q}"] = float(
                    (img * ((x - cx) ** p) * ((y - cy) ** q)).sum()
                )
    m["mu00"] = m["m00"]
    m["mu10"] = 0.0
    m["mu01"] = 0.0
    for p in range(4):
        for q in range(4):
            if 2 <= p + q <= 3:
                norm = m00 ** ((p + q) / 2 + 1)
                m[f"nu{p}{q}"] = m[f"mu{p}{q}"] / norm
    return m


def hu_moments(m: Dict[str, float]) -> np.ndarray:
    """The 7 Hu invariants from normalized central moments."""

    n20, n02, n11 = m["nu20"], m["nu02"], m["nu11"]
    n30, n03, n21, n12 = m["nu30"], m["nu03"], m["nu21"], m["nu12"]
    h1 = n20 + n02
    h2 = (n20 - n02) ** 2 + 4 * n11**2
    h3 = (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2
    h4 = (n30 + n12) ** 2 + (n21 + n03) ** 2
    h5 = (n30 - 3 * n12) * (n30 + n12) * (
        (n30 + n12) ** 2 - 3 * (n21 + n03) ** 2
    ) + (3 * n21 - n03) * (n21 + n03) * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2)
    h6 = (n20 - n02) * ((n30 + n12) ** 2 - (n21 + n03) ** 2) + 4 * n11 * (
        n30 + n12
    ) * (n21 + n03)
    h7 = (3 * n21 - n03) * (n30 + n12) * (
        (n30 + n12) ** 2 - 3 * (n21 + n03) ** 2
    ) - (n30 - 3 * n12) * (n21 + n03) * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2)
    return np.array([h1, h2, h3, h4, h5, h6, h7], dtype=np.float64)


def moments_j(image):
    """Device moments: the same weighted reductions in f32."""

    import jax
    import jax.numpy as jnp

    img = image.astype(jnp.float32)
    h, w = img.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    out = {}
    for p in range(4):
        for q in range(4):
            if p + q <= 3:
                out[f"m{p}{q}"] = (img * (x**p) * (y**q)).sum()
    m00 = jnp.where(out["m00"] == 0, 1.0, out["m00"])
    cx = out["m10"] / m00
    cy = out["m01"] / m00
    for p in range(4):
        for q in range(4):
            if 2 <= p + q <= 3:
                out[f"mu{p}{q}"] = (img * ((x - cx) ** p) * ((y - cy) ** q)).sum()
                out[f"nu{p}{q}"] = out[f"mu{p}{q}"] / (m00 ** ((p + q) / 2 + 1))
    return out


# ---------------------------------------------------------------------------
# external contour tracing (Moore neighborhood, clockwise, cv2-like order)
_MOORE = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def trace_external_contours(binary: np.ndarray) -> List[np.ndarray]:
    """External boundaries of 8-connected foreground components.

    Returns (x, y) point arrays (cv2 coordinate convention), one per
    component, ordered by raster-first occurrence.
    """

    from yamimageprocessor_tpu.ops.labeling import label_np

    fg = binary > 0
    labels = label_np(fg)
    n = int(labels.max())
    h, w = fg.shape
    padded = np.pad(labels, 1)

    # per-region bounding boxes in ONE pass: a `labels == region` scan per
    # region is O(n_regions * H * W) and dominated host extraction on
    # dense frames
    all_ys, all_xs = np.nonzero(fg)
    region_at = labels[all_ys, all_xs]
    min_y = np.full(n + 1, h, np.int64)
    max_y = np.full(n + 1, -1, np.int64)
    min_x = np.full(n + 1, w, np.int64)
    max_x = np.full(n + 1, -1, np.int64)
    np.minimum.at(min_y, region_at, all_ys)
    np.maximum.at(max_y, region_at, all_ys)
    np.minimum.at(min_x, region_at, all_xs)
    np.maximum.at(max_x, region_at, all_xs)

    contours: List[np.ndarray] = []
    for region in range(1, n + 1):
        y0, y1 = int(min_y[region]), int(max_y[region])
        x0, x1 = int(min_x[region]), int(max_x[region])
        crop = labels[y0 : y1 + 1, x0 : x1 + 1]
        cys, cxs = np.nonzero(crop == region)
        start = (cys[0] + y0, cxs[0] + x0)  # raster-first pixel

        def next_move(cur, prev_dir):
            # clockwise search starting just after the backtrack direction
            for k in range(8):
                d = (prev_dir + 1 + k) % 8
                dy, dx = _MOORE[d]
                ny, nx = cur[0] + dy, cur[1] + dx
                if padded[ny + 1, nx + 1] == region:
                    return (ny, nx), (d + 4) % 8
            return None, prev_dir

        points: List[Tuple[int, int]] = [(start[1], start[0])]  # (x, y)
        first_move, nb = next_move(start, 6)  # entered from the left
        if first_move is None:  # isolated pixel
            contours.append(np.array(points, dtype=np.int64))
            continue
        cur, prev_dir = first_move, nb
        # Jacob's stopping criterion: terminate on re-entering START with
        # the SAME next move as the first visit.  Stopping merely on
        # `cur == start` truncates boundaries that legitimately pass
        # through the start pixel more than once (thin shapes).
        max_steps = 8 * (len(cys) + 1)  # safety bound, never the stopper
        for _ in range(max_steps):
            if cur == start:
                nxt, nb = next_move(cur, prev_dir)
                if nxt is None or nxt == first_move:
                    break
                points.append((cur[1], cur[0]))
                cur, prev_dir = nxt, nb
                continue
            points.append((cur[1], cur[0]))
            nxt, nb = next_move(cur, prev_dir)
            if nxt is None:
                break
            cur, prev_dir = nxt, nb
        contours.append(np.array(points, dtype=np.int64))
    return contours


def compress_collinear(contour: np.ndarray) -> np.ndarray:
    """Drop interior points of straight runs (CHAIN_APPROX_SIMPLE spirit)."""

    if len(contour) <= 2:
        return contour
    keep = [0]
    for i in range(1, len(contour) - 1):
        a = contour[i] - contour[keep[-1]]
        b = contour[i + 1] - contour[i]
        if a[0] * b[1] - a[1] * b[0] != 0 or (a[0] * b[0] + a[1] * b[1]) <= 0:
            keep.append(i)
    keep.append(len(contour) - 1)
    return contour[keep]


def contour_area(points: np.ndarray) -> float:
    """Shoelace area (cv2.contourArea semantics, unsigned)."""

    if len(points) < 3:
        return 0.0
    x = points[:, 0].astype(np.float64)
    y = points[:, 1].astype(np.float64)
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def arc_length(points: np.ndarray, closed: bool = True) -> float:
    if len(points) < 2:
        return 0.0
    pts = points.astype(np.float64)
    diffs = np.diff(pts, axis=0)
    total = float(np.sqrt((diffs**2).sum(axis=1)).sum())
    if closed:
        total += float(np.linalg.norm(pts[0] - pts[-1]))
    return total


def point_polygon_distance(polygon: np.ndarray, point: Tuple[float, float]) -> float:
    """Unsigned distance from ``point`` to the polygon boundary
    (|cv2.pointPolygonTest(..., measureDist=True)|)."""

    px, py = float(point[0]), float(point[1])
    pts = polygon.reshape(-1, 2).astype(np.float64)
    best = np.inf
    n = len(pts)
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        dx, dy = x1 - x0, y1 - y0
        denom = dx * dx + dy * dy
        t = 0.0 if denom == 0 else max(0.0, min(1.0, ((px - x0) * dx + (py - y0) * dy) / denom))
        qx, qy = x0 + t * dx, y0 + t * dy
        best = min(best, np.hypot(px - qx, py - qy))
    return float(best)


def approx_poly_dp(points: np.ndarray, epsilon: float) -> np.ndarray:
    """Douglas-Peucker on a closed contour (cv2.approxPolyDP semantics)."""

    pts = points.reshape(-1, 2).astype(np.float64)
    n = len(pts)
    if n < 3 or epsilon <= 0:
        return points.reshape(-1, 2).copy()
    # split at the two most distant points for the closed case
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    i, j = np.unravel_index(np.argmax(d2), d2.shape)
    if i > j:
        i, j = j, i

    def dp(seg: np.ndarray) -> List[int]:
        if len(seg) <= 2:
            return [0, len(seg) - 1]
        a, b = pts[seg[0]], pts[seg[-1]]
        ab = b - a
        norm = np.hypot(*ab)
        if norm == 0:
            dist = np.hypot(*(pts[seg] - a).T)
        else:
            dist = np.abs(np.cross(ab, pts[seg] - a)) / norm
        k = int(np.argmax(dist))
        if dist[k] <= epsilon:
            return [0, len(seg) - 1]
        left = dp(seg[: k + 1])
        right = dp(seg[k:])
        return left + [r + k for r in right[1:]]

    seg1 = np.arange(i, j + 1)
    seg2 = np.concatenate([np.arange(j, n), np.arange(0, i + 1)])
    keep1 = [seg1[k] for k in dp(seg1)]
    keep2 = [seg2[k] for k in dp(seg2)]
    merged = list(dict.fromkeys([*keep1, *keep2[1:-1]]))
    merged.sort()
    return pts[merged].astype(points.dtype)


# ---------------------------------------------------------------------------
# Fourier descriptors (core/extraction.py:204-245)
def fourier_reconstruct(contour_xy: np.ndarray, num_coeff: int):
    """(coefficients, reconstructed points) of the truncated FFT."""

    z = contour_xy[:, 0].astype(np.float64) + 1j * contour_xy[:, 1].astype(np.float64)
    coeffs = np.fft.fft(z)
    n = len(coeffs)
    kept = np.zeros(n, dtype=complex)
    k = min(num_coeff, n)
    kept[:k] = coeffs[:k]
    if k:
        kept[-k:] = coeffs[-k:]
    recon = np.fft.ifft(kept)
    pts = np.stack([recon.real, recon.imag], axis=1)
    return coeffs, pts


__all__ = [
    "moments_np",
    "moments_j",
    "hu_moments",
    "trace_external_contours",
    "compress_collinear",
    "contour_area",
    "arc_length",
    "point_polygon_distance",
    "approx_poly_dp",
    "fourier_reconstruct",
]
