"""Pallas/Mosaic block-local connected-components labeling for TPU.

The XLA label loop (:mod:`.labeling`, ``label_j``) pays ~240 full-frame HBM
passes per round: the Hillis-Steele segmented min-scans stream the whole
int32 frame once per doubling step per direction per axis.  Measured on the
BASELINE dense scene that makes watershed-marker labeling the single most
expensive piece of the segmentation chain (~35 ms of a 52 ms 2048^2 frame —
the flood itself is ~11 ms).

This kernel restructures the same monotone min-label propagation around
VMEM, exploiting a freedom the watershed flood does not have: connected
components is ORDER-FREE.  The fixed point (min flat index per component)
is unique whatever the update schedule, and ``label_j``'s canonical
raster-first renumbering depends only on that fixed point, so ANY schedule
yields labels bit-identical to ``label_np`` (scipy golden,
``core/extraction.py:61`` / ``core/segmentation.py:108`` capability).
That permits:

* **in-place Gauss-Seidel over row blocks** — the label frame is a single
  aliased HBM buffer (``input_output_aliases``); each sequential grid step
  reads its block plus a 1-row halo, solves LOCALLY in VMEM (neighbor-min +
  segmented row/column min-scans, ``rounds`` iterations), and writes the
  center rows back in place, so later blocks see earlier blocks' NEW labels
  within the same pass (information crosses the whole frame downward in one
  pass);
* **alternating sweep direction** — odd passes process blocks bottom-up
  (dynamic DMA offsets from a prefetched direction scalar), so upward
  chains also converge in O(1) passes instead of one block-hop per pass;
* **active-block skipping** — a block is re-solved only when it or a
  vertical neighbor changed in the previous pass; skipped blocks cost
  NOTHING (no DMA, no copy) because the aliased buffer already holds their
  rows, unlike the watershed kernel whose Jacobi trajectory forces a
  copy-through of every inactive block.

Layout: labels int32, background = ``SENTINEL`` (constant, > any flat
index); run ids for the segmented scans are recomputed in-kernel from the
label plane (background never leaves sentinel), costing a prefix-sum
doubling once per active block-pass instead of two extra HBM planes.
"""
from __future__ import annotations

import functools

import numpy as np

SENTINEL = np.int32(1 << 30)
_NO_RUN = np.int32(-3)  # run-id fill for out-of-window shifts


@functools.lru_cache(maxsize=32)
def _build_cc(hp: int, wp: int, block: int, rounds: int, interpret: bool):
    """Compiled CC pass over a (hp+2, wp) padded label frame; returns a
    jitted ``run(lab_pad) -> lab_pad`` that iterates to the global fixed
    point."""

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = hp // block
    # 8-row halo per side: Mosaic DMA row-slices must be 8-aligned in both
    # start and shape, and the automaton only needs >=1 halo row — the
    # extra context rows just speed cross-block convergence
    r2 = block + 16
    # plain Python int: pallas kernels cannot capture jnp constants
    sent = int(SENTINEL)

    def _shift(x, off: int, axis: int, fill):
        """x shifted by +off along axis (values move toward higher
        indices), vacated positions filled — concatenate form (the flood
        kernel's proven Mosaic-friendly shift)."""

        if axis == 0:
            blk = jnp.full((abs(off), x.shape[1]), fill, x.dtype)
            if off > 0:
                return jnp.concatenate([blk, x[:-off]], axis=0)
            return jnp.concatenate([x[-off:], blk], axis=0)
        blk = jnp.full((x.shape[0], abs(off)), fill, x.dtype)
        if off > 0:
            return jnp.concatenate([blk, x[:, :-off]], axis=1)
        return jnp.concatenate([x[:, -off:], blk], axis=1)

    def _prefix_sum(x, axis: int):
        n = x.shape[axis]
        d = 1
        while d < n:
            x = x + _shift(x, d, axis, jnp.int32(0))
            d *= 2
        return x

    def _seg_min(vals, run_id, axis: int):
        """Min within contiguous equal-run_id runs, both directions —
        Hillis-Steele doubling, the in-VMEM twin of
        ``labeling._segmented_min_both``."""

        n = vals.shape[axis]
        out = vals
        d = 1
        while d < n:
            for sign in (1, -1):
                moved = _shift(out, sign * d, axis, sent)
                moved_id = _shift(run_id, sign * d, axis, _NO_RUN)
                out = jnp.where(moved_id == run_id, jnp.minimum(out, moved), out)
            d *= 2
        return out

    def _neighbor_min8(lab, fg):
        m = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                s = lab
                if dy:
                    s = _shift(s, dy, 0, sent)
                if dx:
                    s = _shift(s, dx, 1, sent)
                m = jnp.minimum(m, s)
        return jnp.where(fg, m, jnp.int32(sent))

    # rounds cap: percolation-like masks (55% noise) measured 20% faster
    # at 128 than 64 (the cap binds and forces extra global passes);
    # blob-like masks converge in a few rounds so the early exit makes a
    # high cap free for them
    def kernel(active_ref, dir_ref, lab_hbm, out_hbm, changed_ref,
               lab_s, out_s, sems):
        gi = pl.program_id(0)
        # odd passes sweep bottom-up so upward chains converge as fast as
        # downward ones under the in-place (Gauss-Seidel) schedule
        i = jax.lax.select(dir_ref[0] > 0, nb - 1 - gi, gi)
        active = active_ref[i] > 0

        @pl.when(jnp.logical_not(active))
        def _():
            # aliased in/out buffer: skipped rows already hold their values
            changed_ref[i] = 0

        @pl.when(active)
        def _():
            cp_in = pltpu.make_async_copy(
                lab_hbm.at[pl.ds(i * block, r2)], lab_s, sems.at[0]
            )
            cp_in.start()
            cp_in.wait()
            lab0 = lab_s[:]
            fg = lab0 != jnp.int32(sent)
            bgi = jnp.where(fg, 0, 1).astype(jnp.int32)
            # run ids: equality at distance d <=> contiguous foreground
            # (cumsum is constant on runs, strictly increasing across gaps);
            # window-local cumsum differs from the frame-global one only by
            # a per-column constant, which equality tests never see
            row_id = jnp.where(fg, _prefix_sum(bgi, 1), _NO_RUN)
            col_id = jnp.where(fg, _prefix_sum(bgi, 0), _NO_RUN)

            def one_round(lab):
                lab = _neighbor_min8(lab, fg)
                lab = jnp.where(fg, _seg_min(lab, row_id, 1), jnp.int32(sent))
                lab = jnp.where(fg, _seg_min(lab, col_id, 0), jnp.int32(sent))
                return lab

            # iterate to the LOCAL fixed point (capped at ``rounds``): winding
            # components inside the block resolve fully per pass, so outer
            # passes pay only for cross-block information flow
            def rcond(state):
                it, _, changed = state
                return jnp.logical_and(changed, it < rounds)

            def rbody(state):
                it, lab, _ = state
                new = one_round(lab)
                return it + 1, new, jnp.any(new != lab)

            _, lab, _ = jax.lax.while_loop(
                rcond, rbody, (jnp.int32(0), lab0, jnp.bool_(True))
            )
            center = lab[8 : 8 + block]
            out_s[:] = center
            changed_ref[i] = jnp.any(center != lab0[8 : 8 + block]).astype(
                jnp.int32
            )
            cp_out = pltpu.make_async_copy(
                out_s, out_hbm.at[pl.ds(8 + i * block, block)], sems.at[1]
            )
            cp_out.start()
            cp_out.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # active flags, direction
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((r2, wp), jnp.int32),
            pltpu.VMEM((block, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kwargs = {}
    if not interpret:
        # the kernel budgets its own working set at 13 MiB (_block_cap),
        # but the SCOPED limit is shared with whatever XLA co-schedules
        # around the custom call — at 4096-lane widths inside large
        # programs the combined stack measured 16.39M against the default
        # 16M limit.  There is no auto-pipelining to starve; give the
        # manually-DMA'd set headroom like the watershed flood does.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=24 << 20
        )
    cc_pass = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((hp + 16, wp), jnp.int32),
            jax.ShapeDtypeStruct((nb,), jnp.int32),
        ),
        # input index 2 = lab (scalar-prefetch args count first); the label
        # frame is updated in place so skipped blocks truly cost nothing
        input_output_aliases={2: 0},
        interpret=interpret,
        **kwargs,
    )

    from yamimageprocessor_tpu.pallas_kernels import dilate1_flags

    def run(lab_pad):
        def cond(state):
            _, changed, _ = state
            return jnp.sum(changed) > 0

        def body(state):
            lab, changed, parity = state
            active = dilate1_flags(changed)
            lab, new_changed = cc_pass(
                active.astype(jnp.int32), parity[None], lab
            )
            return lab, new_changed, 1 - parity

        init = (lab_pad, jnp.ones((nb,), jnp.int32), jnp.int32(0))
        lab, _, _ = jax.lax.while_loop(cond, body, init)
        return lab

    run.cc_pass = cc_pass  # exposed for parity debugging
    return run


def cc_pallas(fg, *, block_rows: int = 0, rounds: int = 128,
              interpret: bool = False):
    """Converged min-flat-index label field for boolean ``fg`` (H, W):
    foreground pixels carry their component's minimum flat index, background
    carries :data:`SENTINEL`.  Same fixed point as ``label_j``'s XLA loop;
    callers renumber via :func:`propagate_pallas` rank spreading (or
    ``labeling._renumber``)."""

    import jax.numpy as jnp

    h, w = fg.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab0 = jnp.where(fg, idx, jnp.int32(SENTINEL))
    return propagate_pallas(
        lab0, block_rows=block_rows, rounds=rounds, interpret=interpret
    )


def propagate_pallas(field, *, block_rows: int = 0, rounds: int = 128,
                     interpret: bool = False):
    """Min-propagate ``field`` (H, W) int32 within 8-connected foreground
    regions: pixels equal to :data:`SENTINEL` are background (propagation
    barriers); every other pixel converges to the minimum value reachable
    through foreground.  With ``field = flat index`` this IS connected
    components; with ``field = rank at component roots, SENTINEL-1 at other
    foreground`` it spreads compact ranks without a gather (distinct
    components are never 8-adjacent, so run-limited propagation cannot leak
    between them)."""

    import jax.numpy as jnp

    h, w = field.shape

    wp = -(-w // 128) * 128
    block = block_rows if block_rows > 0 else _auto_block(wp)
    # Mosaic DMA row alignment: window starts/shapes must be 8-multiples
    block = -(-max(8, min(block, 256)) // 8) * 8
    hp = -(-h // block) * block

    lab0 = jnp.pad(
        field.astype(jnp.int32),
        ((8, hp - h + 8), (0, wp - w)),
        constant_values=int(SENTINEL),
    )
    run = _build_cc(hp, wp, block, rounds, interpret)
    lab = run(lab0)
    return lab[8 : 8 + h, :w]


def _block_cap(wp: int) -> int:
    """Max block rows whose working set (~10 live (block+16, wp) int32
    planes: window + out scratch + scan temporaries) fits a 13 MiB
    scoped-VMEM budget — the SINGLE source of truth for both the geometry
    chooser and the path gate."""

    return (13 << 20) // (40 * wp) - 16


def _auto_block(wp: int) -> int:
    """Largest power-of-two block within :func:`_block_cap`."""

    cap = _block_cap(wp)
    block = 8
    while block * 2 <= min(cap, 256):
        block *= 2
    return block


def cc_fits(width: int) -> bool:
    """True when the minimal geometry (block=8) fits the scoped-VMEM budget
    at this frame width; wider frames take the XLA label loop."""

    wp = -(-int(width) // 128) * 128
    return _block_cap(wp) >= 8


__all__ = ["cc_pallas", "propagate_pallas", "cc_fits", "SENTINEL"]
