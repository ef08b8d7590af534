"""Marker-based watershed flooding (cv2.watershed capability).

Reference: ``core/segmentation.py:96-114`` builds markers (Otsu-inv -> open
-> dilate sure-bg -> distance transform -> threshold sure-fg ->
connectedComponents) and calls ``cv2.watershed``, painting boundary pixels
red.

cv2 floods with a per-level FIFO priority queue; the queue order makes its
boundary placement depend on raster order at ties.  The TPU-native design
replaces the queue with LEVEL-SYNCHRONOUS flooding, a deterministic parallel
fixed-point iteration:

  for level L in 0..255:
      repeat until stable:
          every unlabeled pixel whose cheapest labeled 4-neighbor edge
          (edge cost = max-channel abs diff, cv2's c_diff) costs <= L takes
          that neighborhood's label — or becomes a boundary (-1) when its
          labeled neighbors disagree.

Both paths implement the identical rule, so CPU and TPU masks are
bit-identical; placement can differ from cv2 by one pixel at flood-order
ties (measured agreement is asserted in tests).  Image borders start as
boundary, matching cv2's initialization.
"""
from __future__ import annotations

import numpy as np

_WSHED = -1


def _edge_costs_np(image: np.ndarray):
    """4-neighbor edge costs: max over channels of abs difference."""

    img = image.astype(np.int16)
    if img.ndim == 2:
        img = img[..., None]
    dy = np.abs(img[1:, :] - img[:-1, :]).max(axis=-1).astype(np.int32)
    dx = np.abs(img[:, 1:] - img[:, :-1]).max(axis=-1).astype(np.int32)
    return dy, dx  # (H-1, W), (H, W-1)


def watershed_np(image: np.ndarray, markers: np.ndarray) -> np.ndarray:
    h, w = markers.shape
    lab = markers.astype(np.int32).copy()
    lab[0, :] = lab[-1, :] = _WSHED
    lab[:, 0] = lab[:, -1] = _WSHED
    dyc, dxc = _edge_costs_np(image)
    big = np.int32(1 << 30)

    for level in range(256):
        while True:
            unknown = lab == 0
            if not unknown.any():
                return lab
            # per-direction: neighbor label and edge cost
            nb_labs = []
            nb_costs = []
            # up
            l_up = np.full((h, w), 0, np.int32)
            c_up = np.full((h, w), big, np.int32)
            l_up[1:] = lab[:-1]
            c_up[1:] = dyc
            nb_labs.append(l_up)
            nb_costs.append(c_up)
            # down
            l_dn = np.zeros((h, w), np.int32)
            c_dn = np.full((h, w), big, np.int32)
            l_dn[:-1] = lab[1:]
            c_dn[:-1] = dyc
            nb_labs.append(l_dn)
            nb_costs.append(c_dn)
            # left
            l_lf = np.zeros((h, w), np.int32)
            c_lf = np.full((h, w), big, np.int32)
            l_lf[:, 1:] = lab[:, :-1]
            c_lf[:, 1:] = dxc
            nb_labs.append(l_lf)
            nb_costs.append(c_lf)
            # right
            l_rt = np.zeros((h, w), np.int32)
            c_rt = np.full((h, w), big, np.int32)
            l_rt[:, :-1] = lab[:, 1:]
            c_rt[:, :-1] = dxc
            nb_labs.append(l_rt)
            nb_costs.append(c_rt)

            positive = [nl > 0 for nl in nb_labs]
            # trigger: some positive-labeled neighbor with cost <= level
            trig = np.zeros((h, w), bool)
            for pos, cost in zip(positive, nb_costs):
                trig |= pos & (cost <= level)
            trig &= unknown
            if not trig.any():
                break
            # conflict detection among ALL positive-labeled neighbors
            chosen = np.zeros((h, w), np.int32)
            conflict = np.zeros((h, w), bool)
            for pos, nl in zip(positive, nb_labs):
                newly = pos & (chosen == 0)
                conflict |= pos & (chosen > 0) & (nl != chosen)
                chosen = np.where(newly, nl, chosen)
            new_val = np.where(conflict, np.int32(_WSHED), chosen)
            lab = np.where(trig, new_val, lab)
    return lab


_flood_vmap = None


def _flood_pallas_batchable():
    global _flood_vmap
    if _flood_vmap is None:
        import jax

        from yamimageprocessor_tpu.ops.watershed_pallas import flood_pallas

        @jax.custom_batching.custom_vmap
        def one(image, markers):
            return flood_pallas(image, markers)

        @one.def_vmap
        def _rule(axis_size, in_batched, image, markers):  # noqa: ANN001
            import jax.numpy as jnp

            img_b, mk_b = in_batched
            if not img_b:
                image = jnp.broadcast_to(image[None], (axis_size,) + image.shape)
            if not mk_b:
                markers = jnp.broadcast_to(
                    markers[None], (axis_size,) + markers.shape
                )
            return jax.lax.map(lambda t: one(t[0], t[1]), (image, markers)), True

        _flood_vmap = one
    return _flood_vmap


def watershed_j(image, markers):
    """Level-synchronous flooding, device edition.

    Identical fixed point to :func:`watershed_np` but restructured for the
    chip: edge costs are hoisted out of the loop (they never change), and a
    SINGLE while loop both stabilizes the current level and — when a sweep
    makes no progress — jumps directly to the next ACTIVE level (the min
    frontier cost), so the 256-level outer loop never grinds through empty
    levels.  Every sweep is ~15 fused elementwise passes; there are no
    gathers or scatters anywhere.

    On TPU the flood runs as the Pallas block-local kernel
    (:mod:`.watershed_pallas`): K sweeps per VMEM-resident row block with
    K-row halos plus stable-block skipping — bit-identical trajectory,
    ~order-of-magnitude fewer HBM passes.
    """

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        from yamimageprocessor_tpu.ops.watershed_pallas import pallas_fits

        if pallas_fits(markers.shape[-1]):
            # vmap-safe wrapper: batched frames flood sequentially (pallas
            # calls have no batching rule; convergence is per-frame anyway)
            return _flood_pallas_batchable()(image, markers)
        # frames too wide for even the minimal block/k geometry overflow
        # the kernel's scoped VMEM — take the XLA flood below instead

    h, w = markers.shape
    img = image.astype(jnp.int16)
    if img.ndim == 2:
        img = img[..., None]
    dyc = jnp.abs(img[1:, :] - img[:-1, :]).max(axis=-1).astype(jnp.int32)
    dxc = jnp.abs(img[:, 1:] - img[:, :-1]).max(axis=-1).astype(jnp.int32)
    big = jnp.int32(1 << 30)

    lab0 = markers.astype(jnp.int32)
    border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    lab0 = jnp.where(border, _WSHED, lab0)

    # per-direction edge costs, hoisted (constant across the flood);
    # uint16 keeps the four cost streams at half bandwidth (levels <= 255,
    # sentinel 0xFFFF marks frame-edge "no neighbor")
    big16 = jnp.uint16(0xFFFF)
    c16 = lambda a: a.astype(jnp.uint16)  # noqa: E731
    c_up = jnp.full((h, w), big16, jnp.uint16).at[1:, :].set(c16(dyc))
    c_dn = jnp.full((h, w), big16, jnp.uint16).at[:-1, :].set(c16(dyc))
    c_lf = jnp.full((h, w), big16, jnp.uint16).at[:, 1:].set(c16(dxc))
    c_rt = jnp.full((h, w), big16, jnp.uint16).at[:, :-1].set(c16(dxc))
    costs = (c_up, c_dn, c_lf, c_rt)

    def sweep(lab, level16):
        p = jnp.pad(lab, 1, constant_values=0)
        labs = (
            p[:-2, 1:-1],  # up
            p[2:, 1:-1],  # down
            p[1:-1, :-2],  # left
            p[1:-1, 2:],  # right
        )
        unknown = lab == 0
        trig_cost = jnp.full((h, w), big16, jnp.uint16)
        pos_min = jnp.full((h, w), big, jnp.int32)
        pos_max = jnp.zeros((h, w), jnp.int32)
        for nl, cost in zip(labs, costs):
            pos = nl > 0
            trig_cost = jnp.minimum(trig_cost, jnp.where(pos, cost, big16))
            pos_min = jnp.minimum(pos_min, jnp.where(pos, nl, big))
            pos_max = jnp.maximum(pos_max, nl)  # WSHED/-1 never wins a max>0
        trig = unknown & (trig_cost <= level16)
        # conflict iff two distinct positive labels touch the pixel
        new_val = jnp.where(pos_min != pos_max, jnp.int32(_WSHED), pos_min)
        new_lab = jnp.where(trig, new_val, lab)
        return new_lab, trig_cost, jnp.any(trig)

    def cond(state):
        _, level = state
        return level < jnp.uint16(256)

    def body(state):
        lab, level = state
        lab, trig_cost, changed = sweep(lab, level)
        still_unknown = lab == 0
        frontier = jnp.where(still_unknown, trig_cost, big16)
        next_active = jnp.minimum(frontier.min().astype(jnp.uint32), 256).astype(
            jnp.uint16
        )
        new_level = jnp.where(
            changed, level, jnp.maximum(next_active, level + jnp.uint16(1))
        )
        return lab, new_level

    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.uint16(0)))
    return lab


def paint_boundaries_np(image: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Annotate watershed lines in red (core/segmentation.py:112-114)."""

    out = image.copy()
    mask = labels == _WSHED
    if out.ndim == 2:
        out[mask] = 0
    else:
        out[mask] = np.array([0, 0, 255], dtype=out.dtype)
    return out


def paint_boundaries_j(image, labels):
    import jax.numpy as jnp

    mask = labels == _WSHED
    if image.ndim == 2:
        return jnp.where(mask, jnp.uint8(0), image)
    red = jnp.array([0, 0, 255], dtype=image.dtype)
    return jnp.where(mask[..., None], red, image)


__all__ = [
    "watershed_np",
    "watershed_j",
    "paint_boundaries_np",
    "paint_boundaries_j",
]
