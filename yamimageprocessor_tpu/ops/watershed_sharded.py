"""Mesh-parallel watershed: the full marker pipeline + flood over a
row-sharded frame (SURVEY hard part #1).

Every stage keeps bit-parity with the dense device path by construction:

* threshold — psum'd Otsu histogram (identical integer decision);
* morphology — halo exchange with the op's OWN border fill (erode: dtype
  max, dilate: dtype min), so even frame-edge rows match cv2 semantics;
* distance transform — ppermute carry wavefront
  (:func:`..distance.distance_transform_sharded_j`);
* connected components — the same min-label flood as ``labeling.label_j``
  with 1-row halo exchange per round and a psum'd convergence check; roots
  are global raster flat indices, so the compact renumbering (via an
  all-gathered sorted root list) reproduces ``label_np`` exactly;
* flood — the level-synchronous automaton of ``watershed.watershed_j``
  with per-sweep 1-row label halos and psum/pmin level control: one global
  synchronous sweep per iteration, the same trajectory as dense.

Reference obligation: ``core/segmentation.py:96-114`` + SURVEY §2.5's
collectives row ("all-gather for label merge in watershed flooding").
"""
from __future__ import annotations

import numpy as np

from yamimageprocessor_tpu.ops import color as C
from yamimageprocessor_tpu.ops import morphology as M
from yamimageprocessor_tpu.ops import threshold as T
from yamimageprocessor_tpu.ops.distance import distance_transform_sharded_j
from yamimageprocessor_tpu.parallel.collectives import (
    axis_len,
    exchange_rows,
    sharded_stencil,
)

_WSHED = -1
_SENT = 0x7FFF
MAX_REGIONS = 512


def _morph_sharded(kind: str, img, se: np.ndarray, iterations: int, axis: str):
    r = (se.shape[0] // 2) * max(int(iterations), 1)
    fill = M._pad_value(img.dtype, erode=(kind == "erode"))
    fn = M.erode_j if kind == "erode" else M.dilate_j
    return sharded_stencil(
        lambda p: fn(p, se, iterations), img, r, axis, fill=fill
    )


def open_sharded_j(img, se: np.ndarray, iterations: int, axis: str):
    return _morph_sharded(
        "dilate", _morph_sharded("erode", img, se, iterations, axis), se,
        iterations, axis,
    )


def close_sharded_j(img, se: np.ndarray, iterations: int, axis: str):
    return _morph_sharded(
        "erode", _morph_sharded("dilate", img, se, iterations, axis), se,
        iterations, axis,
    )


def dilate_sharded_j(img, se: np.ndarray, iterations: int, axis: str):
    return _morph_sharded("dilate", img, se, iterations, axis)


def erode_sharded_j(img, se: np.ndarray, iterations: int, axis: str):
    return _morph_sharded("erode", img, se, iterations, axis)


# ---------------------------------------------------------------------------
# connected components
def label_sharded_j(fg, axis: str, max_regions: int = MAX_REGIONS):
    """Row-sharded twin of ``labeling.label_j`` (bit-identical labels).

    Static capacity: up to ``max_regions`` component roots PER SHARD row
    band (total n_shards * max_regions); bands denser than that truncate
    their root list and the renumbering diverges from the dense path.
    """

    import jax
    import jax.numpy as jnp

    from yamimageprocessor_tpu.ops.labeling import _segmented_min_both

    n = axis_len(axis)
    idx = jax.lax.axis_index(axis)
    h, w = fg.shape
    total = n * h * w
    sentinel = jnp.int32(total)
    gidx = (
        (idx * h + jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    lab0 = jnp.where(fg, gidx, sentinel)
    bg = ~fg
    row_runs = jnp.where(fg, jnp.cumsum(bg.astype(jnp.int32), axis=1), -2)
    col_runs = jnp.where(fg, jnp.cumsum(bg.astype(jnp.int32), axis=0), -2)

    def neighbor_min(lab):
        p = exchange_rows(lab, 1, axis, fill=sentinel)
        p = jnp.pad(p, ((0, 0), (1, 1)), constant_values=sentinel)
        m = lab
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                if dy == 1 and dx == 1:
                    continue
                m = jnp.minimum(m, p[dy : dy + h, dx : dx + w])
        return jnp.where(fg, m, sentinel)

    def spread(lab):
        lab = neighbor_min(lab)
        lab = jnp.where(fg, _segmented_min_both(lab, row_runs, 1, sentinel), sentinel)
        lab = jnp.where(fg, _segmented_min_both(lab, col_runs, 0, sentinel), sentinel)
        return lab

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed > 0, it < 4096)

    def body(state):
        lab, _, it = state
        new = spread(lab)
        changed = jax.lax.psum(jnp.sum((new != lab).astype(jnp.int32)), axis)
        return new, changed, it + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (spread(lab0), jnp.int32(1), jnp.int32(0))
    )

    # compact raster-first renumbering: all-gather the (sparse) root
    # lists, then rank every pixel's root against the sorted global roots.
    # Each shard contributes up to ``max_regions`` roots from its OWN row
    # band (the only remaining static bound — per-band, not global) and
    # the gathered list is NOT re-truncated, so the total capacity is
    # n_shards * max_regions components.  The rank loop walks only the
    # real roots (sentinel-terminated), so cost scales with the actual
    # component count.
    flat = lab.ravel()
    is_root = jnp.logical_and(flat != sentinel, flat == gidx.ravel())
    local_roots = jnp.sort(jnp.where(is_root, flat, sentinel))[:max_regions]
    all_roots = jax.lax.all_gather(local_roots, axis).reshape(-1)
    roots = jnp.sort(all_roots)  # global raster order, sentinel-padded
    total = roots.shape[0]

    # rank(label) = #roots <= label  (labels ARE roots, so rank >= 1)
    def cond_rank(state):
        r, _ = state
        return jnp.logical_and(r < total, roots[r] != sentinel)

    def body_rank(state):
        r, rank = state
        hit = roots[r] <= flat
        return r + 1, rank + hit.astype(jnp.int32)

    _, rank = jax.lax.while_loop(
        cond_rank, body_rank, (jnp.int32(0), jnp.zeros_like(flat))
    )
    out = jnp.where(flat == sentinel, 0, rank)
    return out.reshape(h, w)


# ---------------------------------------------------------------------------
# level-synchronous flood
def flood_sharded_j(image_block, markers_block, axis: str):
    """Row-sharded twin of ``watershed.watershed_j`` (same trajectory)."""

    import jax
    import jax.numpy as jnp

    n = axis_len(axis)
    idx = jax.lax.axis_index(axis)
    h, w = markers_block.shape
    img = image_block.astype(jnp.int16)
    if img.ndim == 2:
        img = img[..., None]

    # vertical edge costs including the shard boundary rows
    img_p = exchange_rows(img, 1, axis, fill=0)
    d = jnp.abs(
        img_p[1:].astype(jnp.int32) - img_p[:-1].astype(jnp.int32)
    ).max(axis=-1)  # (h+1, w): d[r] = cost(row r-1, row r) in block coords
    sent = jnp.int32(_SENT)
    c_up = d[:h]
    c_dn = d[1:]
    c_up = jnp.where(
        (idx == 0)
        & (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) == 0),
        sent,
        c_up,
    )
    c_dn = jnp.where(
        (idx == n - 1)
        & (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) == h - 1),
        sent,
        c_dn,
    )
    img2 = img.astype(jnp.int32)
    dxc = jnp.abs(img2[:, 1:] - img2[:, :-1]).max(axis=-1)
    c_lf = jnp.full((h, w), sent).at[:, 1:].set(dxc)
    c_rt = jnp.full((h, w), sent).at[:, :-1].set(dxc)

    lab0 = markers_block.astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (
        ((idx == 0) & (rows == 0))
        | ((idx == n - 1) & (rows == h - 1))
        | (cols == 0)
        | (cols == w - 1)
    )
    lab0 = jnp.where(border, _WSHED, lab0)
    big = jnp.int32(1 << 30)

    def sweep(lab, level):
        p = exchange_rows(lab, 1, axis, fill=0)
        p = jnp.pad(p, ((0, 0), (1, 1)), constant_values=0)
        labs = (p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:])
        costs = (c_up, c_dn, c_lf, c_rt)
        unknown = lab == 0
        trig_cost = jnp.full((h, w), sent)
        pos_min = jnp.full((h, w), big)
        pos_max = jnp.zeros((h, w), jnp.int32)
        for nl, cost in zip(labs, costs):
            pos = nl > 0
            trig_cost = jnp.minimum(trig_cost, jnp.where(pos, cost, sent))
            pos_min = jnp.minimum(pos_min, jnp.where(pos, nl, big))
            pos_max = jnp.maximum(pos_max, nl)
        trig = unknown & (trig_cost <= level)
        new_val = jnp.where(pos_min != pos_max, jnp.int32(_WSHED), pos_min)
        return jnp.where(trig, new_val, lab), trig_cost, trig

    def cond(state):
        _, level, unknown_total = state
        return (level < 256) & (unknown_total > 0)

    def body(state):
        lab, level, _ = state
        lab, trig_cost, trig = sweep(lab, level)
        changed = jax.lax.psum(jnp.sum(trig.astype(jnp.int32)), axis) > 0
        still_unknown = lab == 0
        frontier = jnp.where(still_unknown, trig_cost, sent)
        next_active = jax.lax.pmin(jnp.min(frontier), axis)
        next_active = jnp.minimum(next_active, 256)
        new_level = jnp.where(
            changed, level, jnp.maximum(next_active, level + 1)
        )
        unknown_total = jax.lax.psum(
            jnp.sum(still_unknown.astype(jnp.int32)), axis
        )
        return lab, new_level, unknown_total

    unknown0 = jax.lax.psum(jnp.sum((lab0 == 0).astype(jnp.int32)), axis)
    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, jnp.int32(0), unknown0))
    return lab


# ---------------------------------------------------------------------------
# the full sharded op
def watershed_sharded_j(
    img,
    dyn,
    *,
    axis: str,
    kernel_size: int = 3,
    opening_iterations: int = 2,
    dilation_iterations: int = 3,
):
    """``sharded_device_fn`` for segmentation.watershed: bit-identical to
    the dense device path on every row of every shard."""

    import jax
    import jax.numpy as jnp

    from yamimageprocessor_tpu.ops import watershed as W
    from yamimageprocessor_tpu.ops.lutops import histogram256_j

    gray = C.bgr_to_gray_j(img) if img.ndim == 3 else img
    hist = jax.lax.psum(histogram256_j(gray), axis)
    thresh = T.binary_j(gray, T.otsu_from_hist_j(hist), inverse=True)
    se = np.ones((int(kernel_size), int(kernel_size)), np.uint8)
    opening = open_sharded_j(thresh, se, int(opening_iterations), axis)
    sure_bg = dilate_sharded_j(opening, se, int(dilation_iterations), axis)
    dist = distance_transform_sharded_j(opening, axis)
    thr = dyn["factor"] * jax.lax.pmax(dist.max(), axis)
    sure_fg = jnp.where(dist > thr, jnp.uint8(255), jnp.uint8(0))
    unknown = jnp.maximum(
        sure_bg.astype(jnp.int16) - sure_fg.astype(jnp.int16), 0
    ).astype(jnp.uint8)
    markers = label_sharded_j(sure_fg > 0, axis) + 1
    markers = jnp.where(unknown == 255, 0, markers)
    labels = flood_sharded_j(img, markers, axis)
    return W.paint_boundaries_j(img, labels)


__all__ = [
    "open_sharded_j",
    "close_sharded_j",
    "dilate_sharded_j",
    "erode_sharded_j",
    "label_sharded_j",
    "flood_sharded_j",
    "watershed_sharded_j",
]
