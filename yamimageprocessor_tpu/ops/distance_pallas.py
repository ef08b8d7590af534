"""Pallas TPU kernel for the chamfer distance transform's raster passes.

The XLA twin (``distance.distance_transform_j``) pays ~36us of scan
machinery per row (4096 sequential scan steps at 2048^2 -> ~150ms).  This
kernel runs the SAME row recurrence inside VMEM: a sequential grid over
row blocks with the 2-row carry in scratch, each row relaxed with
lane-roll Hillis-Steele prefix mins.  Bit-identical by construction —
prefix-min networks compute exact mins of the same sets, and every f32
add (vertical candidate weights, the +-j linear-offset trick) matches the
scan version operation for operation.
"""
from __future__ import annotations

import numpy as np

from yamimageprocessor_tpu.ops.distance import A, B, C, INF


def _dt_forward_pallas(d, *, block_rows: int = 128, interpret: bool = False):
    """One forward raster pass over ``d`` (h, w) f32; h must divide by
    ``block_rows`` and w by 128 (caller pads with INF)."""

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = d.shape
    nsteps = h // block_rows
    log_w = max(1, (w - 1).bit_length())

    def kernel(d_ref, out_ref, carry_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            carry_ref[:] = jnp.full_like(carry_ref, INF)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        jvec = lane.astype(jnp.float32)

        def shift_from_left(x, s):
            # value at j-s lands at j; INF where j < s
            rolled = pltpu.roll(x, s, axis=1)
            return jnp.where(lane >= s, rolled, INF)

        def shift_from_right(x, s):
            # roll accepts only non-negative shifts; w-s is the same
            # circular rotation as -s
            rolled = pltpu.roll(x, w - s, axis=1)
            return jnp.where(lane < w - s, rolled, INF)

        def cummin_left(x):
            s = 1
            for _ in range(log_w):
                x = jnp.minimum(x, shift_from_left(x, s))
                s *= 2
            return x

        def cummin_right(x):
            s = 1
            for _ in range(log_w):
                x = jnp.minimum(x, shift_from_right(x, s))
                s *= 2
            return x

        def row_fn(r, _):
            prev1 = carry_ref[0:1, :]
            prev2 = carry_ref[1:2, :]
            row = d_ref[pl.ds(r, 1), :]
            cand = jnp.full((1, w), INF)
            cand = jnp.minimum(cand, prev1 + A)
            cand = jnp.minimum(cand, shift_from_left(prev1, 1) + B)
            cand = jnp.minimum(cand, shift_from_right(prev1, 1) + B)
            cand = jnp.minimum(cand, shift_from_left(prev1, 2) + C)
            cand = jnp.minimum(cand, shift_from_right(prev1, 2) + C)
            cand = jnp.minimum(cand, shift_from_left(prev2, 1) + C)
            cand = jnp.minimum(cand, shift_from_right(prev2, 1) + C)
            cand = jnp.minimum(row, cand)
            left = cummin_left(cand - jvec) + jvec
            right = cummin_right(cand + jvec) - jvec
            new = jnp.minimum(left, right)
            out_ref[pl.ds(r, 1), :] = new
            carry_ref[1:2, :] = prev1
            carry_ref[0:1, :] = new
            return 0

        jax.lax.fori_loop(0, block_rows, row_fn, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(
                (block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (block_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((2, w), jnp.float32)],
        interpret=interpret,
    )(d)


def _dt_forward_chunked(d, *, block_rows: int = 128, interpret: bool = False):
    """Forward raster pass with each row CHUNKED across sublanes: row j-space
    splits into 8 contiguous chunks, chunk c -> sublane c, so every row op
    touches (8, w/8) tiles at full sublane utilization instead of (1, w)
    vectors at 1/8 (the (1, w) form burns ~16 vregs per op at w=2048; this
    one touches 2).  Bit-identical to :func:`_dt_forward_pallas`: every
    min is over the same value sets (segmented Hillis-Steele prefix +
    exclusive cross-chunk combine == full-row prefix; min is associative/
    idempotent) and every f32 add is the same ``value + weight`` /
    ``±jvec`` arithmetic.  Requires w % (8*128) == 0 and h % block_rows == 0
    (caller pads with INF)."""

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = d.shape
    w8 = w // 8
    nsteps = h // block_rows
    log_w8 = max(1, (w8 - 1).bit_length())
    dc = d.reshape(h * 8, w8)  # row r -> rows [8r, 8r+8), chunk-major

    def kernel(d_ref, out_ref, carry_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            carry_ref[:] = jnp.full_like(carry_ref, INF)

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 1)
        chunk = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 0)
        jvec = (chunk * w8 + lane).astype(jnp.float32)
        inf_row = jnp.full((1, w8), INF, jnp.float32)

        def from_left(x, s):
            # value at j-s lands at j; INF where j < s.  Lanes >= s read
            # their own chunk; lanes < s wrap to the previous chunk's tail
            # (chunk 0's deficit reads the injected INF row).
            same = pltpu.roll(x, s, axis=1)
            prev = jnp.concatenate([inf_row, x[:-1]], axis=0)
            prevr = pltpu.roll(prev, s, axis=1)
            return jnp.where(lane >= s, same, prevr)

        def from_right(x, s):
            same = pltpu.roll(x, w8 - s, axis=1)
            nxt = jnp.concatenate([x[1:], inf_row], axis=0)
            nxtr = pltpu.roll(nxt, w8 - s, axis=1)
            return jnp.where(lane < w8 - s, same, nxtr)

        def cummin_left(x):
            s = 1
            for _ in range(log_w8):  # within-chunk prefix min
                rolled = pltpu.roll(x, s, axis=1)
                x = jnp.minimum(x, jnp.where(lane >= s, rolled, INF))
                s *= 2
            # exclusive prefix over chunk totals (3 sublane steps)
            tot = jnp.min(x, axis=1, keepdims=True)  # (8, 1)
            p = jnp.concatenate([jnp.full((1, 1), INF, x.dtype), tot[:-1]], axis=0)
            s = 1
            for _ in range(3):
                p = jnp.minimum(
                    p,
                    jnp.concatenate(
                        [jnp.full((s, 1), INF, x.dtype), p[:-s]], axis=0
                    ),
                )
                s *= 2
            return jnp.minimum(x, p)

        def cummin_right(x):
            s = 1
            for _ in range(log_w8):  # within-chunk suffix min
                rolled = pltpu.roll(x, w8 - s, axis=1)
                x = jnp.minimum(x, jnp.where(lane < w8 - s, rolled, INF))
                s *= 2
            tot = jnp.min(x, axis=1, keepdims=True)
            p = jnp.concatenate([tot[1:], jnp.full((1, 1), INF, x.dtype)], axis=0)
            s = 1
            for _ in range(3):
                p = jnp.minimum(
                    p,
                    jnp.concatenate(
                        [p[s:], jnp.full((s, 1), INF, x.dtype)], axis=0
                    ),
                )
                s *= 2
            return jnp.minimum(x, p)

        def row_fn(r, _):
            prev1 = carry_ref[0:8, :]
            prev2 = carry_ref[8:16, :]
            row = d_ref[pl.ds(8 * r, 8), :]
            cand = jnp.full((8, w8), INF)
            cand = jnp.minimum(cand, prev1 + A)
            cand = jnp.minimum(cand, from_left(prev1, 1) + B)
            cand = jnp.minimum(cand, from_right(prev1, 1) + B)
            cand = jnp.minimum(cand, from_left(prev1, 2) + C)
            cand = jnp.minimum(cand, from_right(prev1, 2) + C)
            cand = jnp.minimum(cand, from_left(prev2, 1) + C)
            cand = jnp.minimum(cand, from_right(prev2, 1) + C)
            cand = jnp.minimum(row, cand)
            left = cummin_left(cand - jvec) + jvec
            right = cummin_right(cand + jvec) - jvec
            new = jnp.minimum(left, right)
            out_ref[pl.ds(8 * r, 8), :] = new
            carry_ref[8:16, :] = prev1
            carry_ref[0:8, :] = new
            return 0

        jax.lax.fori_loop(0, block_rows, row_fn, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h * 8, w8), jnp.float32),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(
                (block_rows * 8, w8), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (block_rows * 8, w8), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((16, w8), jnp.float32)],
        interpret=interpret,
    )(dc)
    return out.reshape(h, w)


# minimum width for the chunked-row kernel: 8 sublane chunks x 128 lanes
_CHUNK_MIN_W = 8 * 128


def distance_transform_pallas(binary, *, interpret: bool = False):
    """cv2 DIST_L2/5 chamfer transform, forward+backward raster passes in
    two pallas calls (bit-identical to ``distance_transform_j``).  Wide
    frames take the sublane-chunked row layout (4-5x the row rate); narrow
    ones keep the plain row kernel (chunk padding would dominate)."""

    import jax.numpy as jnp

    h, w = binary.shape
    d0 = jnp.where(binary != 0, INF, jnp.float32(0.0))
    chunked = w >= _CHUNK_MIN_W
    ph = (-h) % 8
    pw = (-w) % (_CHUNK_MIN_W if chunked else 128)
    if ph or pw:
        d0 = jnp.pad(d0, ((0, ph), (0, pw)), constant_values=INF)
    hp, wp = d0.shape
    # Scoped VMEM is 16 MiB and the grid pipeline double-buffers the in
    # and out blocks (4 block copies of block_rows*wp f32 live at once,
    # plus the carry scratch) — cap block rows so the kernel fits at any
    # width (at 4096^2 an uncapped 256-row block is 32 KiB OVER the limit)
    max_block = max(8, (14 * 2**20) // (16 * wp))
    block = 8
    while (
        block * 2 <= min(hp, 256)
        and hp % (block * 2) == 0
        and block * 2 <= max_block
    ):
        block *= 2
    while hp % block:
        block //= 2
    fwd_fn = _dt_forward_chunked if chunked else _dt_forward_pallas
    fwd = fwd_fn(d0, block_rows=block, interpret=interpret)
    bwd = fwd_fn(fwd[::-1], block_rows=block, interpret=interpret)[::-1]
    return bwd[:h, :w]


__all__ = ["distance_transform_pallas"]
