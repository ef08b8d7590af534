"""Mean-shift color filtering (cv2.pyrMeanShiftFiltering capability).

Reference: ``core/segmentation.py:209-213`` — pyrMeanShiftFiltering with
spatial radius sp and color radius sr, followed by Otsu binarization.

Design: single-level mean shift (the reference's pyramid only seeds the
iteration; segmentation output passes through Otsu anyway).  Each pixel
iterates a (2*sp+1)^2 window mean restricted to colors with squared
L2 distance <= sr^2, moving both the spatial window center and the color
estimate, for up to 5 iterations (cv2's default TermCriteria) with eps=1
freeze.  The device path scans over window offsets with per-pixel gathers;
the golden twin runs identical arithmetic in numpy.
"""
from __future__ import annotations

import numpy as np

_ITERS = 5
_EPS2 = 1.0  # squared movement epsilon


def mean_shift_np(image: np.ndarray, sp: int, sr: int) -> np.ndarray:
    img = image.astype(np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    sr2 = np.float32(sr * sr)
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    cy, cx = ys.copy(), xs.copy()
    col = img.copy()
    active = np.ones((h, w), bool)
    offsets = [(dy, dx) for dy in range(-sp, sp + 1) for dx in range(-sp, sp + 1)]
    for _ in range(_ITERS):
        if not active.any():
            break
        num_c = np.zeros_like(col)
        num_y = np.zeros((h, w), np.float32)
        num_x = np.zeros((h, w), np.float32)
        cnt = np.zeros((h, w), np.float32)
        iy = np.rint(cy).astype(np.int64)
        ix = np.rint(cx).astype(np.int64)
        for dy, dx in offsets:
            ny = np.clip(iy + dy, 0, h - 1)
            nx = np.clip(ix + dx, 0, w - 1)
            vals = img[ny, nx]
            d2 = ((vals - col) ** 2).sum(-1)
            sel = (d2 <= sr2).astype(np.float32)
            cnt += sel
            num_c += sel[..., None] * vals
            num_y += sel * ny.astype(np.float32)
            num_x += sel * nx.astype(np.float32)
        cnt = np.maximum(cnt, 1.0)
        new_col = num_c / cnt[..., None]
        new_y = num_y / cnt
        new_x = num_x / cnt
        move2 = (new_y - cy) ** 2 + (new_x - cx) ** 2 + ((new_col - col) ** 2).sum(-1)
        upd = active
        col = np.where(upd[..., None], new_col, col)
        cy = np.where(upd, new_y, cy)
        cx = np.where(upd, new_x, cx)
        active = active & (move2 > _EPS2)
    out = np.clip(np.rint(col), 0, 255).astype(np.uint8)
    return out[..., 0] if image.ndim == 2 else out


def mean_shift_j(image, sp: int, sr: int):
    import jax
    import jax.numpy as jnp

    img = image.astype(jnp.float32)
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    h, w, c = img.shape
    sr2 = jnp.float32(sr * sr)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    offsets = jnp.array(
        [(dy, dx) for dy in range(-sp, sp + 1) for dx in range(-sp, sp + 1)],
        dtype=jnp.int32,
    )

    def iteration(state, _):
        col, cy, cx, active = state
        iy = jnp.rint(cy).astype(jnp.int32)
        ix = jnp.rint(cx).astype(jnp.int32)

        def off_step(acc, off):
            num_c, num_y, num_x, cnt = acc
            ny = jnp.clip(iy + off[0], 0, h - 1)
            nx = jnp.clip(ix + off[1], 0, w - 1)
            vals = img[ny, nx]
            d2 = ((vals - col) ** 2).sum(-1)
            sel = (d2 <= sr2).astype(jnp.float32)
            return (
                num_c + sel[..., None] * vals,
                num_y + sel * ny.astype(jnp.float32),
                num_x + sel * nx.astype(jnp.float32),
                cnt + sel,
            ), None

        (num_c, num_y, num_x, cnt), _ = jax.lax.scan(
            off_step,
            (
                jnp.zeros_like(col),
                jnp.zeros((h, w), jnp.float32),
                jnp.zeros((h, w), jnp.float32),
                jnp.zeros((h, w), jnp.float32),
            ),
            offsets,
        )
        cnt = jnp.maximum(cnt, 1.0)
        new_col = num_c / cnt[..., None]
        new_y = num_y / cnt
        new_x = num_x / cnt
        move2 = (
            (new_y - cy) ** 2
            + (new_x - cx) ** 2
            + ((new_col - col) ** 2).sum(-1)
        )
        col = jnp.where(active[..., None], new_col, col)
        cy = jnp.where(active, new_y, cy)
        cx = jnp.where(active, new_x, cx)
        active = active & (move2 > _EPS2)
        return (col, cy, cx, active), None

    state0 = (img, ys, xs, jnp.ones((h, w), bool))
    (col, _, _, _), _ = jax.lax.scan(iteration, state0, None, length=_ITERS)
    out = jnp.clip(jnp.rint(col), 0, 255).astype(jnp.uint8)
    return out[..., 0] if squeeze else out


__all__ = ["mean_shift_np", "mean_shift_j"]
