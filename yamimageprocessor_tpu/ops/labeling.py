"""Connected-component labeling (8-connectivity, cv2-compatible numbering).

Reference usage: ``cv2.connectedComponents`` inside watershed marker
construction (``core/segmentation.py:108``) and ``skimage.measure.label``
in extraction (``core/extraction.py:61``).  cv2 numbers components compactly
in raster order of first occurrence (validated empirically); we use the same
canonical numbering in both paths:

* golden — scipy.ndimage two-pass labeling + raster-first renumbering;
* device — parallel label propagation: every foreground pixel starts with
  its flat index, then alternating neighbor-min + pointer-jumping (path
  compression via gather) rounds converge in O(log diameter) iterations;
  a final sort-based ranking produces compact raster-first labels.

Both paths produce bit-identical int32 label images.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi

_EIGHT = np.ones((3, 3), dtype=np.uint8)


def label_np(fg: np.ndarray, connectivity: int = 8) -> np.ndarray:
    """Compact raster-first labels for the boolean foreground ``fg``."""

    structure = _EIGHT if connectivity == 8 else None
    raw, count = ndi.label(fg > 0, structure=structure)
    if count == 0:
        return np.zeros(fg.shape, dtype=np.int32)
    flat = raw.ravel()
    first_idx = np.full(count + 1, flat.size, dtype=np.int64)
    nz = np.flatnonzero(flat)
    # first occurrence of each label in raster order
    labels_at_nz = flat[nz]
    order = np.argsort(labels_at_nz, kind="stable")
    sorted_labels = labels_at_nz[order]
    firsts = np.searchsorted(sorted_labels, np.arange(1, count + 1))
    first_idx[1:] = nz[order[firsts]]
    rank = np.empty(count + 1, dtype=np.int32)
    rank[0] = 0
    rank[1:][np.argsort(first_idx[1:], kind="stable")] = np.arange(
        1, count + 1, dtype=np.int32
    )
    return rank[raw].astype(np.int32)


def _shifted(x, offset: int, axis: int, fill):
    """x shifted by +offset along axis (values move toward higher indices),
    vacated positions filled — static slicing only, no gathers."""

    import jax.numpy as jnp

    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if offset >= 0:
        pad[axis] = (offset, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
    else:
        pad[axis] = (0, -offset)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(-offset, n - offset)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def _segmented_min_both(values, run_id, axis: int, sentinel):
    """Min within contiguous runs (equal ``run_id``) along ``axis``, both
    directions, via Hillis-Steele doubling with static shifts.  Gather-free
    AND compile-light (the log-depth associative_scan alternative overflows
    the TPU compile helper when nested in a while_loop)."""

    import jax.numpy as jnp

    n = values.shape[axis]
    out = values
    shift = 1
    while shift < n:
        for sign in (1, -1):
            moved = _shifted(out, sign * shift, axis, sentinel)
            moved_id = _shifted(run_id, sign * shift, axis, -1)
            out = jnp.where(moved_id == run_id, jnp.minimum(out, moved), out)
        shift *= 2
    return out


def _renumber(lab, sentinel, h: int, w: int):
    """Canonical raster-first renumbering of a converged min-flat-index
    label field: roots are component min flat indices, automatically ordered
    by raster-first occurrence.  Depends only on the PARTITION, so every
    solver schedule (XLA Jacobi loop, Pallas Gauss-Seidel blocks, sharded
    collective merge) lands on bit-identical labels."""

    import jax.numpy as jnp

    n = h * w
    flat = lab.ravel()
    is_root = jnp.logical_and(
        flat != sentinel, flat == jnp.arange(n, dtype=jnp.int32)
    )
    rank_of_root = jnp.cumsum(is_root.astype(jnp.int32))  # 1-based at roots
    ranks = jnp.where(is_root, rank_of_root, 0)
    out = jnp.where(flat == sentinel, 0, ranks[jnp.clip(flat, 0, n - 1)])
    return out.reshape(h, w).astype(jnp.int32)


_batchable_cache: dict = {}


def _batchable(name: str):
    """vmap-safe wrapper around a single-frame pallas entry point
    (pallas calls have no batching rule; batched inputs map frame by
    frame) — one shared factory for the CC solver and the rank spreader."""

    hit = _batchable_cache.get(name)
    if hit is not None:
        return hit

    import jax

    from yamimageprocessor_tpu.ops import labeling_pallas

    fn = getattr(labeling_pallas, name)

    @jax.custom_batching.custom_vmap
    def one(arr):
        return fn(arr)

    @one.def_vmap
    def _rule(axis_size, in_batched, arr):  # noqa: ANN001
        import jax.numpy as jnp

        if not in_batched[0]:
            arr = jnp.broadcast_to(arr[None], (axis_size,) + arr.shape)
        return jax.lax.map(one, arr), True

    _batchable_cache[name] = one
    return one


def _cc_pallas_batchable():
    return _batchable("cc_pallas")


def _propagate_batchable():
    return _batchable("propagate_pallas")


def _rank_spread(lab, fg, h: int, w: int):
    """Gather-free raster-first renumbering for the Pallas path: compact
    ranks are seeded at component roots and min-propagated through
    foreground (a second, cheap solver run) instead of the 4M-element
    table gather ``ranks[flat]`` — measured 38 ms at 2048^2 on this link,
    5x the whole CC solve."""

    import jax.numpy as jnp

    from yamimageprocessor_tpu.ops.labeling_pallas import SENTINEL

    n = h * w
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    is_root = lab == idx  # background is SENTINEL (> any flat index)
    rank = jnp.cumsum(is_root.ravel().astype(jnp.int32)).reshape(h, w)
    seed = jnp.where(
        is_root,
        rank,
        jnp.where(fg, jnp.int32(SENTINEL) - 1, jnp.int32(SENTINEL)),
    )
    spread = _propagate_batchable()(seed)
    return jnp.where(fg, spread, 0).astype(jnp.int32)


def label_j(fg, max_iters: int = 0):
    """Device twin of :func:`label_np`; ``fg`` is a bool (H, W) array.

    Each round does a 1-pixel 8-neighbor min (covers diagonal links) then
    full-run row/column segmented min-scans (straight runs collapse in one
    pass), so convergence is a few rounds for realistic masks instead of
    O(diameter) sweeps.  Returns int32 labels, 0 = background.

    On TPU the propagation runs as the Pallas block-local kernel
    (:mod:`.labeling_pallas`): per-block VMEM solves with in-place
    Gauss-Seidel passes and active-block skipping — same unique fixed
    point, ~two orders of magnitude less HBM traffic than the XLA
    doubling scans.
    """

    import jax
    import jax.numpy as jnp

    h, w = fg.shape

    # an EXPLICIT iteration cap asks for possibly-unconverged output; the
    # Pallas solver always runs to the fixed point, so honoring the cap
    # means taking the XLA loop (keeps CPU/TPU semantics identical)
    if max_iters <= 0 and jax.default_backend() == "tpu":
        from yamimageprocessor_tpu.ops.labeling_pallas import cc_fits

        if cc_fits(w):
            lab = _cc_pallas_batchable()(fg)
            return _rank_spread(lab, fg, h, w)
    n = h * w
    if max_iters <= 0:
        # the min-propagation is monotone, so n rounds is a TRUE
        # convergence bound (a fixed 256 silently fragmented high-turn
        # spiral/maze components).  The while_loop exits at convergence —
        # realistic masks take only a few rounds; the bound is never the
        # stopping reason, only a safety net.
        max_iters = n
    sentinel = jnp.int32(n)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    lab0 = jnp.where(fg, idx, sentinel)
    bg = ~fg
    # run ids per axis (bg pixels get unique negative-ish ids so they never
    # match anything): computed once, reused every round
    row_runs = jnp.where(fg, jnp.cumsum(bg.astype(jnp.int32), axis=1), -2)
    col_runs = jnp.where(fg, jnp.cumsum(bg.astype(jnp.int32), axis=0), -2)

    def neighbor_min(lab):
        p = jnp.pad(lab, 1, constant_values=sentinel)
        m = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                m = jnp.minimum(m, p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w])
        return jnp.where(fg, m, sentinel)

    def spread(lab):
        lab = neighbor_min(lab)
        lab = jnp.where(
            fg, _segmented_min_both(lab, row_runs, 1, sentinel), sentinel
        )
        lab = jnp.where(
            fg, _segmented_min_both(lab, col_runs, 0, sentinel), sentinel
        )
        return lab

    def cond(state):
        lab, prev, it = state
        return jnp.logical_and(jnp.any(lab != prev), it < max_iters)

    def body(state):
        lab, _, it = state
        return spread(lab), lab, it + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (spread(lab0), lab0, jnp.int32(0)))
    return _renumber(lab, sentinel, h, w)


def label_seeds_j(fg):
    """Distinct-positive seed labels: flood-equivalent to
    ``label_j(fg) + 1`` up to an injective relabeling (foreground
    components get distinct positive ints, background gets 1).

    The watershed flood's painted output depends only on label
    DISTINCTNESS — conflicts (``pos_min != pos_max``) and the propagated
    unique label are invariant under any injective positive relabeling —
    so marker construction can skip the canonical raster-first
    renumbering (a second solver run on the Pallas path) entirely."""

    import jax
    import jax.numpy as jnp

    h, w = fg.shape
    if jax.default_backend() == "tpu":
        from yamimageprocessor_tpu.ops.labeling_pallas import cc_fits

        if cc_fits(w):
            lab = _cc_pallas_batchable()(fg)
            # min-flat-index labels: < h*w << 2^30, so +2 keeps them
            # positive, distinct, and clear of the background seed 1
            return jnp.where(fg, lab + 2, 1).astype(jnp.int32)
    return label_j(fg) + 1


__all__ = ["label_np", "label_j", "label_seeds_j"]
