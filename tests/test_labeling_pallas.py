"""Pallas block-local connected components: partition parity with scipy.

The kernel runs in interpreter mode here (CPU CI); real-TPU parity is
re-asserted every bench run via the labeling case in
``yamimageprocessor_tpu.services.parity``.  Because the canonical
raster-first renumbering depends only on the partition, agreement with
``label_np`` is exact whatever schedule the solver took.
"""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.ops.labeling import _renumber, label_np
from yamimageprocessor_tpu.ops.labeling_pallas import (
    SENTINEL,
    cc_pallas,
    propagate_pallas,
)


def _labels_via_pallas(fg, **kw):
    """Solve + the production gather-free rank-spread renumbering, all in
    interpreter mode (the TPU path's exact structure)."""

    import jax.numpy as jnp

    h, w = fg.shape
    fg_j = jnp.asarray(fg)
    lab = cc_pallas(fg_j, interpret=True, **kw)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    is_root = lab == idx
    rank = jnp.cumsum(is_root.ravel().astype(jnp.int32)).reshape(h, w)
    seed = jnp.where(
        is_root,
        rank,
        jnp.where(fg_j, jnp.int32(SENTINEL) - 1, jnp.int32(SENTINEL)),
    )
    spread = propagate_pallas(seed, interpret=True, **kw)
    got = np.asarray(jnp.where(fg_j, spread, 0).astype(jnp.int32))
    # the gather renumbering must agree with the rank spread exactly
    gathered = np.asarray(_renumber(lab, jnp.int32(SENTINEL), h, w))
    assert (got == gathered).all()
    return got


def _disks(h, w, seed=0, blobs=6):
    rng = np.random.default_rng(seed)
    fg = np.zeros((h, w), bool)
    yy, xx = np.mgrid[:h, :w]
    for _ in range(blobs):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = int(rng.integers(3, max(4, min(h, w) // 5)))
        fg |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return fg


@pytest.mark.parametrize(
    "shape,block", [((40, 56), 8), ((64, 130), 16), ((33, 300), 8)]
)
def test_cc_pallas_disks(shape, block):
    fg = _disks(*shape, seed=shape[1])
    assert (_labels_via_pallas(fg, block_rows=block) == label_np(fg)).all()


def test_cc_pallas_random_noise():
    rng = np.random.default_rng(11)
    fg = rng.random((48, 160)) > 0.55
    assert (_labels_via_pallas(fg, block_rows=8) == label_np(fg)).all()


def test_cc_pallas_spiral_converges_across_blocks():
    # a single spiral component winding through many blocks: worst case for
    # block-local solving (information must cross block boundaries many
    # times); the alternating-direction passes must still converge
    h = w = 64
    fg = np.zeros((h, w), bool)
    top, bottom, left, right = 0, h - 1, 0, w - 1
    while top < bottom and left < right:
        fg[top, left : right + 1] = True
        fg[top : bottom + 1, right] = True
        fg[bottom, left : right + 1] = True
        fg[top : bottom + 1, left] = True
        top += 4
        bottom -= 4
        left += 4
        right -= 4
    got = _labels_via_pallas(fg, block_rows=8)
    assert (got == label_np(fg)).all()


def test_cc_pallas_edge_cases():
    empty = np.zeros((24, 136), bool)
    assert (_labels_via_pallas(empty, block_rows=8) == 0).all()
    full = np.ones((24, 136), bool)
    assert (_labels_via_pallas(full, block_rows=8) == 1).all()
    # single-pixel components in every corner
    fg = np.zeros((30, 140), bool)
    fg[0, 0] = fg[0, -1] = fg[-1, 0] = fg[-1, -1] = True
    assert (_labels_via_pallas(fg, block_rows=8) == label_np(fg)).all()


def test_cc_pallas_thin_lines():
    fg = np.zeros((41, 133), bool)
    fg[7, :] = True  # full-width run
    fg[:, 64] = True  # full-height run crossing it (one component)
    fg[30, 3:40] = True  # disjoint horizontal segment
    assert (_labels_via_pallas(fg, block_rows=8) == label_np(fg)).all()


def test_label_j_cpu_path_unchanged():
    # off-TPU label_j must still take (and pass through) the XLA loop
    from yamimageprocessor_tpu.ops.labeling import label_j

    fg = _disks(45, 150, seed=3)
    assert (np.asarray(label_j(fg)) == label_np(fg)).all()
