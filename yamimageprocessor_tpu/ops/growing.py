"""Region growing via flood fill (cv2.floodFill floating-range capability).

Reference: ``core/segmentation.py:171-175`` — floodFill from a seed with
``loDiff = upDiff = tolerance`` (floating range, 4-connectivity), painting
the region white on the grayscale image.

The region is the reachability closure over edges (p, q) with
``orig[q] - lo <= orig[p] <= orig[q] + up`` evaluated on ORIGINAL values —
order independent, hence identical between the golden BFS and the device's
iterative mask propagation.
"""
from __future__ import annotations

from collections import deque

import numpy as np


def flood_region_np(gray: np.ndarray, seed_xy, tolerance: int) -> np.ndarray:
    h, w = gray.shape
    sx, sy = int(seed_xy[0]), int(seed_xy[1])
    sx = min(max(sx, 0), w - 1)
    sy = min(max(sy, 0), h - 1)
    lo = int(tolerance)
    up = int(tolerance)
    vals = gray.astype(np.int32)
    region = np.zeros((h, w), dtype=bool)
    region[sy, sx] = True
    queue = deque([(sy, sx)])
    while queue:
        y, x = queue.popleft()
        v = vals[y, x]
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and not region[ny, nx]:
                nv = vals[ny, nx]
                if v - lo <= nv <= v + up:
                    region[ny, nx] = True
                    queue.append((ny, nx))
    return region


def region_growing_np(gray: np.ndarray, seed, tolerance: int = 10) -> np.ndarray:
    region = flood_region_np(gray, seed, tolerance)
    out = gray.copy()
    out[region] = 255
    return out


def region_growing_j_dyn(gray, seed_x, seed_y, tolerance):
    """Device twin; ``seed_x``/``seed_y``/``tolerance`` may be traced int32
    scalars (seed drags in the UI never recompile)."""

    import jax
    import jax.numpy as jnp

    h, w = gray.shape
    sx = jnp.clip(seed_x, 0, w - 1)
    sy = jnp.clip(seed_y, 0, h - 1)
    tol = tolerance
    vals = gray.astype(jnp.int32)

    region0 = jnp.zeros((h, w), bool).at[sy, sx].set(True)

    def grow(region):
        pr = jnp.pad(region, 1, constant_values=False)
        pv = jnp.pad(vals, 1, constant_values=-(10**6))
        out = region
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            sr = pr[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            sv = pv[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            out = out | ((sr) & (jnp.abs(vals - sv) <= tol))
        return out

    def cond(state):
        cur, prev = state
        return jnp.any(cur != prev)

    def body(state):
        cur, _ = state
        return grow(cur), cur

    region, _ = jax.lax.while_loop(cond, body, (grow(region0), region0))
    return jnp.where(region, jnp.uint8(255), gray)


__all__ = ["flood_region_np", "region_growing_np", "region_growing_j_dyn"]
