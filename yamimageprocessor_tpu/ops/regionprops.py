"""Per-region measurements over labeled masks (skimage.regionprops family).

Reference usage: ``core/extraction.py:57-87`` (area, perimeter, centroid,
eccentricity, solidity, extent, orientation per region).  skimage is not a
dependency — the formulas are re-implemented:

* area / centroid / bbox / central moments — label-indexed segment sums
  (``jax.ops.segment_sum`` on device; ``np.add.at`` golden twin), the
  TPU-native replacement for per-region python loops;
* orientation / eccentricity — inertia-tensor eigenvalues from central
  moments (skimage's definitions: orientation in (-pi/2, pi/2] measured
  against the row axis; eccentricity sqrt(1 - l2/l1));
* perimeter — skimage's weighted border-pixel categories (weights 1,
  sqrt(2), (1+sqrt(2))/2 over a [[10,2],[4,1]] category convolution);
* solidity — area / convex area, the hull rasterized on the host per
  region (a host finalization, as in the reference).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

_SQRT2 = float(np.sqrt(2.0))
_PERIMETER_WEIGHTS = np.zeros(50, dtype=np.float64)
_PERIMETER_WEIGHTS[[5, 7, 15, 17, 25, 27]] = 1.0
_PERIMETER_WEIGHTS[[21, 33]] = _SQRT2
_PERIMETER_WEIGHTS[[13, 23]] = (1.0 + _SQRT2) / 2.0


@dataclass
class RegionMeasurements:
    """Vectorized per-region metrics (index 0 = background, unused)."""

    count: int
    area: np.ndarray
    centroid_r: np.ndarray
    centroid_c: np.ndarray
    bbox: np.ndarray  # (n+1, 4): minr, minc, maxr(+1), maxc(+1)
    mu20: np.ndarray
    mu02: np.ndarray
    mu11: np.ndarray
    perimeter: np.ndarray

    def extent(self) -> np.ndarray:
        heights = np.maximum(self.bbox[:, 2] - self.bbox[:, 0], 1)
        widths = np.maximum(self.bbox[:, 3] - self.bbox[:, 1], 1)
        return self.area / (heights * widths)

    def orientation(self) -> np.ndarray:
        a = self.mu20 / np.maximum(self.area, 1)
        b = self.mu11 / np.maximum(self.area, 1)
        c = self.mu02 / np.maximum(self.area, 1)
        # skimage convention: orientation = 0.5*atan2(-2*T01, T11 - T00)
        # of the inertia tensor T = [[mu02, -mu11], [-mu11, mu20]]/m00
        # (T00 is the COLUMN variance: the sum-minus-corner diagonal in
        # skimage.measure.inertia_tensor).  With our a=mu20 (row var) that
        # reduces to 0.5*atan2(2b, a-c); a vertical bar reports 0, a
        # horizontal bar pi/2, the main diagonal -pi/4.
        with np.errstate(invalid="ignore"):
            out = np.where(
                a - c == 0,
                np.where(b > 0, -np.pi / 4.0, np.pi / 4.0),
                0.5 * np.arctan2(2.0 * b, a - c),
            )
        return out

    def eccentricity(self) -> np.ndarray:
        a = self.mu20 / np.maximum(self.area, 1)
        b = self.mu11 / np.maximum(self.area, 1)
        c = self.mu02 / np.maximum(self.area, 1)
        common = np.sqrt(np.maximum((a - c) ** 2 + 4 * b * b, 0.0))
        l1 = (a + c + common) / 2.0
        l2 = (a + c - common) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            ecc = np.sqrt(np.maximum(1.0 - l2 / np.maximum(l1, 1e-12), 0.0))
        return np.where(self.area > 0, ecc, 0.0)


def measure_np(labels: np.ndarray) -> RegionMeasurements:
    """Golden path: all metrics via vectorized scatter sums."""

    labels = np.asarray(labels, dtype=np.int64)
    n = int(labels.max())
    h, w = labels.shape
    rr, cc = np.mgrid[:h, :w]
    flat = labels.ravel()

    area = np.bincount(flat, minlength=n + 1).astype(np.float64)
    sum_r = np.bincount(flat, weights=rr.ravel(), minlength=n + 1)
    sum_c = np.bincount(flat, weights=cc.ravel(), minlength=n + 1)
    safe = np.maximum(area, 1)
    cen_r = sum_r / safe
    cen_c = sum_c / safe

    dr = rr.ravel() - cen_r[flat]
    dc = cc.ravel() - cen_c[flat]
    mu20 = np.bincount(flat, weights=dr * dr, minlength=n + 1)
    mu02 = np.bincount(flat, weights=dc * dc, minlength=n + 1)
    mu11 = np.bincount(flat, weights=dr * dc, minlength=n + 1)

    bbox = np.zeros((n + 1, 4), dtype=np.int64)
    if n:
        big = 1 << 30
        minr = np.full(n + 1, big)
        minc = np.full(n + 1, big)
        maxr = np.full(n + 1, -1)
        maxc = np.full(n + 1, -1)
        np.minimum.at(minr, flat, rr.ravel())
        np.minimum.at(minc, flat, cc.ravel())
        np.maximum.at(maxr, flat, rr.ravel())
        np.maximum.at(maxc, flat, cc.ravel())
        bbox[:, 0] = np.where(minr == big, 0, minr)
        bbox[:, 1] = np.where(minc == big, 0, minc)
        bbox[:, 2] = maxr + 1
        bbox[:, 3] = maxc + 1

    perim = perimeters_np(labels, n)

    return RegionMeasurements(
        count=n,
        area=area,
        centroid_r=cen_r,
        centroid_c=cen_c,
        bbox=bbox,
        mu20=mu20,
        mu02=mu02,
        mu11=mu11,
        perimeter=perim,
    )


def perimeters_np(labels: np.ndarray, n: int) -> np.ndarray:
    """skimage-style perimeter per region.

    skimage.measure.perimeter convolves the border mask (pixels removed by
    a 4-connected erosion) with [[10, 2, 10], [2, 1, 2], [10, 2, 10]] and
    sums category weights.  Here the category counts only same-region border
    neighbors, which equals running skimage per-region on isolated masks.
    """

    out = np.zeros(n + 1, dtype=np.float64)
    h, w = labels.shape
    padded = np.pad(labels, 1)

    def same(dy: int, dx: int) -> np.ndarray:
        return padded[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] == labels

    interior = same(-1, 0) & same(1, 0) & same(0, -1) & same(0, 1) & (labels > 0)
    border = (labels > 0) & ~interior

    bpad = np.pad(border, 1)

    def nb(dy: int, dx: int) -> np.ndarray:
        return bpad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] & same(dy, dx)

    orth = (
        nb(-1, 0).astype(np.int64)
        + nb(1, 0)
        + nb(0, -1)
        + nb(0, 1)
    )
    diag = (
        nb(-1, -1).astype(np.int64)
        + nb(-1, 1)
        + nb(1, -1)
        + nb(1, 1)
    )
    cat = np.where(border, 1 + 2 * orth + 10 * diag, 0)
    weights = _PERIMETER_WEIGHTS[np.clip(cat, 0, 49)]
    np.add.at(out, labels.ravel(), weights.ravel())
    out[0] = 0.0
    return out


def measure_j(labels, max_regions: int):
    """Device twin: segment sums with a static region capacity.

    Returns a dict of (max_regions+1,) arrays; entries past the true count
    are zero.  Hull area stays a host-side finalization (over device-
    extracted vertices, :func:`hull_vertices_j`).

    TPU scatters serialize per index, so the reductions are PACKED: one
    (N, 3) sum for {area, Σr, Σc}, one (N, 2) min and max for the bbox,
    and one (N, 3) sum for the central moments — 5 scatters instead of 10
    (plus the perimeter's, folded in by :func:`measure_with_perimeter_j`).
    """

    return _measure_packed(labels, max_regions, extra=None)


def _measure_packed(labels, max_regions: int, extra):
    import jax
    import jax.numpy as jnp

    labels = labels.astype(jnp.int32)
    h, w = labels.shape
    rr = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).ravel()
    cc = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).ravel()
    flat = jnp.clip(labels.ravel(), 0, max_regions)
    nseg = max_regions + 1

    s1 = jax.ops.segment_sum(
        jnp.stack([jnp.ones_like(rr), rr, cc], axis=1), flat, num_segments=nseg
    )
    area, sum_r, sum_c = s1[:, 0], s1[:, 1], s1[:, 2]
    safe = jnp.maximum(area, 1.0)
    cen_r = sum_r / safe
    cen_c = sum_c / safe

    rc = jnp.stack([rr, cc], axis=1)
    mins = jax.ops.segment_min(rc, flat, num_segments=nseg)
    maxs = jax.ops.segment_max(rc, flat, num_segments=nseg)
    minr, minc = mins[:, 0], mins[:, 1]
    maxr, maxc = maxs[:, 0], maxs[:, 1]

    dr = rr - cen_r[flat]
    dc = cc - cen_c[flat]
    mu_vals = [dr * dr, dc * dc, dr * dc]
    if extra is not None:
        mu_vals.append(extra)
    s2 = jax.ops.segment_sum(
        jnp.stack(mu_vals, axis=1), flat, num_segments=nseg
    )

    feats = {
        "area": area,
        "centroid_r": cen_r,
        "centroid_c": cen_c,
        "min_r": jnp.where(area > 0, minr, 0.0),
        "min_c": jnp.where(area > 0, minc, 0.0),
        "max_r": jnp.where(area > 0, maxr, -1.0),
        "max_c": jnp.where(area > 0, maxc, -1.0),
        "mu20": s2[:, 0],
        "mu02": s2[:, 1],
        "mu11": s2[:, 2],
    }
    if extra is not None:
        feats["perimeter"] = s2[:, 3].at[0].set(0.0)
    return feats


def measure_with_perimeter_j(labels, max_regions: int):
    """Fused measure + perimeter: the perimeter category weights ride the
    central-moment scatter as a fourth packed column."""

    return _measure_packed(
        labels, max_regions, extra=_perimeter_weights_j(labels).ravel()
    )


def perimeters_j(labels, max_regions: int):
    """Device twin of :func:`perimeters_np`: same border categories, the
    weight lookup folded into arithmetic selects (no per-pixel gather) and
    the per-region sum as a segment reduction."""

    import jax
    import jax.numpy as jnp

    weights = _perimeter_weights_j(labels)
    flat = jnp.clip(labels.astype(jnp.int32).ravel(), 0, max_regions)
    out = jax.ops.segment_sum(
        weights.ravel(), flat, num_segments=max_regions + 1
    )
    return out.at[0].set(0.0)


def _perimeter_weights_j(labels):
    """Per-pixel skimage perimeter category weights (the scatter-ready
    value map shared by :func:`perimeters_j` and the packed measure)."""

    import jax.numpy as jnp

    labels = labels.astype(jnp.int32)
    h, w = labels.shape
    padded = jnp.pad(labels, 1)

    def same(dy, dx):
        return padded[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] == labels

    pos = labels > 0
    interior = same(-1, 0) & same(1, 0) & same(0, -1) & same(0, 1) & pos
    border = pos & ~interior
    bpad = jnp.pad(border, 1)

    def nb(dy, dx):
        return bpad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w] & same(dy, dx)

    orth = (
        nb(-1, 0).astype(jnp.int32)
        + nb(1, 0)
        + nb(0, -1)
        + nb(0, 1)
    )
    diag = (
        nb(-1, -1).astype(jnp.int32)
        + nb(-1, 1)
        + nb(1, -1)
        + nb(1, 1)
    )
    # nonzero entries of _PERIMETER_WEIGHTS by (orth, diag) category:
    # orth in {2,3} & diag in {0,1,2} -> 1 ; (0,2)/(1,3) -> sqrt2 ;
    # (1,1)/(1,2) -> (1+sqrt2)/2
    one = (orth >= 2) & (orth <= 3) & (diag <= 2)
    s2 = ((orth == 0) & (diag == 2)) | ((orth == 1) & (diag == 3))
    mid = (orth == 1) & ((diag == 1) | (diag == 2))
    weights = jnp.where(
        one,
        jnp.float32(1.0),
        jnp.where(
            s2,
            jnp.float32(_SQRT2),
            jnp.where(mid, jnp.float32((1.0 + _SQRT2) / 2.0), 0.0),
        ),
    )
    return jnp.where(border, weights, 0.0)


# ---------------------------------------------------------------------------
# convex hull — device vertex extraction
def hull_vertices_j(labels, max_regions: int, max_vertices: int = 64):
    """Per-region convex-hull vertices, fully on device.

    Replicates :func:`convex_hull_points` over the same candidate set the
    host ``solidity_np`` builds (per-row column extremes inside each
    region): Andrew's monotone chain in *integer* arithmetic, so the
    vertex list is bit-identical to the host hull and the scan-line area
    can stay a tiny host finalization in f64 — no label-frame download.

    Returns ``(verts, nverts)``: ``verts`` (max_regions+1, max_vertices, 2)
    int32 in the host's ``lower[:-1] + upper[:-1]`` order; ``nverts`` the
    TRUE vertex count (may exceed ``max_vertices`` — callers must treat
    those regions as saturated and fall back to the host hull).
    """

    import jax
    import jax.numpy as jnp

    labels = labels.astype(jnp.int32)
    h, w = labels.shape
    r_cap = max_regions
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lab = jnp.clip(labels, 0, r_cap)
    seg = (lab * h + rows).ravel()
    nseg = (r_cap + 1) * h
    colf = cols.ravel().astype(jnp.float32)
    mn = jax.ops.segment_min(colf, seg, num_segments=nseg).reshape(r_cap + 1, h)
    mx = jax.ops.segment_max(colf, seg, num_segments=nseg).reshape(r_cap + 1, h)
    has = mn <= mx  # absent (region,row) pairs keep the min/max identities
    mn_i = jnp.where(has, mn, 0).astype(jnp.int32)
    mx_i = jnp.where(has, mx, 0).astype(jnp.int32)

    batch = r_cap + 1
    rr = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[None, :], (batch, h))
    # candidates in the host's np.unique order: (row, minc) then (row, maxc)
    cand = jnp.stack(
        [
            jnp.stack([rr, mn_i], axis=-1),
            jnp.stack([rr, mx_i], axis=-1),
        ],
        axis=2,
    ).reshape(batch, 2 * h, 2)
    valid = jnp.stack([has, has & (mx_i > mn_i)], axis=2).reshape(batch, 2 * h)

    # compact valid candidates to the front of each lane (stable, so the
    # lexicographic candidate order is preserved); the chain loop's trip
    # count then tracks the LARGEST region, not the frame height
    order = jnp.argsort(~valid, axis=1, stable=True)
    cand = jnp.take_along_axis(
        cand, jnp.broadcast_to(order[..., None], cand.shape), axis=1
    )
    ncand = jnp.sum(valid, axis=1).astype(jnp.int32)
    # lane 0 is the background pseudo-region: it touches nearly every row,
    # so left alone it alone would set the while trip count to ~2H
    ncand = ncand.at[0].set(0)

    ncap = 2 * h
    stack_cap = h + 8  # chain keeps <=1 point per closed row (+ transients)
    bidx = jnp.arange(batch)

    def chain(cand, ncand):
        # flat Andrew scan: every while iteration each lane either pops
        # once or pushes once and advances — no nested pop loop, and lanes
        # progress independently (total trips <= 2 * max ncand)
        def cond(state):
            _, _, t = state
            return jnp.any(t < ncand)

        def body(state):
            stack, cnt, t = state
            active = t < ncand
            p = cand[bidx, jnp.minimum(t, ncap - 1)]
            o = stack[bidx, jnp.maximum(cnt - 2, 0)]
            a = stack[bidx, jnp.maximum(cnt - 1, 0)]
            cross = (a[:, 0] - o[:, 0]) * (p[:, 1] - o[:, 1]) - (
                a[:, 1] - o[:, 1]
            ) * (p[:, 0] - o[:, 0])
            pop = active & (cnt >= 2) & (cross <= 0)
            push = active & ~pop
            cnt = cnt - pop.astype(jnp.int32)
            slot = jnp.minimum(cnt, stack_cap - 1)
            cur = stack[bidx, slot]
            stack = stack.at[bidx, slot].set(jnp.where(push[:, None], p, cur))
            return stack, cnt + push.astype(jnp.int32), t + push.astype(jnp.int32)

        init = (
            jnp.zeros((batch, stack_cap, 2), jnp.int32),
            jnp.zeros(batch, jnp.int32),
            jnp.zeros(batch, jnp.int32),
        )
        stack, cnt, _ = jax.lax.while_loop(cond, body, init)
        return stack, cnt

    # reversed per-lane candidate order for the upper chain
    j2 = jnp.arange(ncap, dtype=jnp.int32)[None, :]
    rev_idx = jnp.clip(ncand[:, None] - 1 - j2, 0, ncap - 1)
    rcand = jnp.take_along_axis(
        cand, jnp.broadcast_to(rev_idx[..., None], cand.shape), axis=1
    )
    lower, nl = chain(cand, ncand)
    upper, nu = chain(rcand, ncand)
    nl1 = jnp.maximum(nl - 1, 0)
    nu1 = jnp.maximum(nu - 1, 0)
    nverts = nl1 + nu1

    j = jnp.arange(max_vertices)
    from_lower = j[None, :] < nl1[:, None]
    li = jnp.broadcast_to(
        jnp.minimum(j, stack_cap - 1)[None, :, None], (batch, max_vertices, 2)
    )
    ui = jnp.broadcast_to(
        jnp.clip(j[None, :] - nl1[:, None], 0, stack_cap - 1)[..., None],
        (batch, max_vertices, 2),
    )
    lv = jnp.take_along_axis(lower, li, axis=1)
    uv = jnp.take_along_axis(upper, ui, axis=1)
    verts = jnp.where(from_lower[..., None], lv, uv)
    return verts, nverts


def solidity_from_hulls(
    area: np.ndarray,
    verts: np.ndarray,
    nverts: np.ndarray,
    count: int,
    max_vertices: int,
) -> Tuple[np.ndarray, List[int]]:
    """Host finalization of device hulls: the same f64 scan-line fill as
    :func:`solidity_np` over pre-extracted vertices.  Returns (solidity,
    saturated_regions) — saturated = true vertex count exceeded the device
    padding, caller must redo those from the label frame."""

    out = np.zeros(count + 1, dtype=np.float64)
    saturated: List[int] = []
    for region in range(1, count + 1):
        n = int(nverts[region])
        if n > max_vertices:
            saturated.append(region)
            continue
        if n <= 2:
            hull_area = float(area[region])
        else:
            hull_area = _hull_pixel_area(verts[region, :n].astype(np.float64))
        out[region] = area[region] / max(hull_area, 1.0)
    return out, saturated


# ---------------------------------------------------------------------------
# convex hull (host finalization for solidity)
def convex_hull_points(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; ``points`` (n, 2) as (r, c)."""

    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: List[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: List[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def convex_area(points: np.ndarray, shape: Tuple[int, int]) -> float:
    """Pixel count of the filled convex hull (skimage's convex_area)."""

    hull = convex_hull_points(points)
    if len(hull) <= 2:
        return float(len(np.unique(points, axis=0)))
    minr = int(hull[:, 0].min())
    maxr = int(hull[:, 0].max())
    count = 0
    # scan-line fill over hull edges (pixel centers inside or on the hull)
    edges = list(zip(hull, np.roll(hull, -1, axis=0)))
    for r in range(minr, maxr + 1):
        xs: List[float] = []
        for (r0, c0), (r1, c1) in edges:
            if r0 == r1:
                if r0 == r:
                    xs.extend([c0, c1])
                continue
            t = (r - r0) / (r1 - r0)
            if 0.0 <= t <= 1.0:
                xs.append(c0 + t * (c1 - c0))
        if not xs:
            continue
        lo = int(np.ceil(min(xs) - 1e-9))
        hi = int(np.floor(max(xs) + 1e-9))
        count += max(0, hi - lo + 1)
    return float(count)


def _hull_pixel_area(hull: np.ndarray) -> float:
    """Vectorized scan-line fill of the hull polygon — identical
    arithmetic to :func:`convex_area`'s row loop (same f64 divisions and
    ceil/floor epsilons), one numpy pass instead of rows x edges Python."""

    minr = int(hull[:, 0].min())
    maxr = int(hull[:, 0].max())
    r0 = hull[:, 0].astype(np.float64)
    c0 = hull[:, 1].astype(np.float64)
    r1 = np.roll(r0, -1)
    c1 = np.roll(c0, -1)
    rows = np.arange(minr, maxr + 1, dtype=np.float64)[:, None]
    horiz = r0 == r1
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (rows - r0[None, :]) / (r1 - r0)[None, :]
    valid = (~horiz[None, :]) & (t >= 0.0) & (t <= 1.0)
    xs = c0[None, :] + t * (c1 - c0)[None, :]
    hmask = horiz[None, :] & (rows == r0[None, :])
    xs_min = np.where(valid, xs, np.inf)
    xs_min = np.minimum(
        xs_min, np.where(hmask, np.minimum(c0, c1)[None, :], np.inf)
    )
    xs_max = np.where(valid, xs, -np.inf)
    xs_max = np.maximum(
        xs_max, np.where(hmask, np.maximum(c0, c1)[None, :], -np.inf)
    )
    mn = xs_min.min(axis=1)
    mx = xs_max.max(axis=1)
    has = np.isfinite(mn)
    lo = np.ceil(mn[has] - 1e-9)
    hi = np.floor(mx[has] + 1e-9)
    return float(np.maximum(0.0, hi - lo + 1.0).sum())


def solidity_np(labels: np.ndarray, measurements: RegionMeasurements) -> np.ndarray:
    """area / filled-hull-area per region.

    Hull vertices on a pixel grid are always per-row column extremes, so
    each region's hull is built from <= 2 candidate points per bbox row
    (vectorized from the bbox crop) instead of every member pixel — the
    same hull polygon, orders of magnitude less Python.  Degenerate hulls
    (<= 2 vertices after collinear removal) fall back to the member-pixel
    count, exactly as the all-points implementation did.
    """

    out = np.zeros(measurements.count + 1, dtype=np.float64)
    for region in range(1, measurements.count + 1):
        minr, minc, maxr, maxc = measurements.bbox[region]
        crop = labels[minr:maxr, minc:maxc] == region
        rows, cols = np.nonzero(crop)
        if len(rows) == 0:
            continue
        order = np.lexsort((cols, rows))
        rs = rows[order]
        cs = cols[order]
        urows, starts = np.unique(rs, return_index=True)
        ends = np.append(starts[1:], len(cs)) - 1
        cand = np.concatenate(
            [
                np.stack([urows + minr, cs[starts] + minc], axis=1),
                np.stack([urows + minr, cs[ends] + minc], axis=1),
            ]
        )
        hull = convex_hull_points(cand)
        if len(hull) <= 2:
            hull_area = float(measurements.area[region])
        else:
            hull_area = _hull_pixel_area(hull)
        out[region] = measurements.area[region] / max(hull_area, 1.0)
    return out


__all__ = [
    "RegionMeasurements",
    "measure_np",
    "measure_j",
    "measure_with_perimeter_j",
    "perimeters_np",
    "convex_hull_points",
    "convex_area",
    "solidity_np",
    "hull_vertices_j",
    "solidity_from_hulls",
]
