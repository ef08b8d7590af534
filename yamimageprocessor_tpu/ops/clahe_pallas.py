"""Pallas TPU kernel for the CLAHE bilinear LUT blend.

The plain-XLA blend (``clahe.clahe_j``) sweeps all 256 levels per pixel,
upsampling four corner tables per level (~10 ops/pixel/level).  This
kernel exploits the interpolation structure instead: within a HALF-TILE
block of the CLAHE grid the four corner tiles (y0, y1, x0, x1) are
constants, so each pixel needs exactly four table lookups — done with the
packed-word select tree from :mod:`yamimageprocessor_tpu.pallas_kernels`
(tables packed 4 bytes/int32, 63 selects + a per-lane variable shift per
lookup) — and one fused bilinear combine in the SAME f32 term order as
``clahe_j`` (bit parity).

Per-tile histograms reuse the CSA bitslice batch histogram; the
clip/redistribute/cdf LUT math is shared (``clahe._clip_and_lut_j``).

Constraints: grid-divisible frame with EVEN tile sides (half-tile blocks
must tile exactly); anything else falls back to ``clahe_j``.
"""
from __future__ import annotations

from typing import Tuple


def clahe_blend_pallas(vals, luts, interp, grid: Tuple[int, int], *,
                       interpret: bool = False):
    """``vals`` (h, w) or (n, h, w) int/uint8 gray; ``luts`` (gh, gw, 256)
    or (n, gh, gw, 256) f32 integer tables; ``interp`` = ((y0, y1, fy),
    (x0, x1, fx)) host arrays from ``clahe._interp_weights``.  Returns the
    blended uint8 frame(s).

    A whole batch is ONE pallas call with a leading frame grid dimension —
    the batched preprocessing chain (BASELINE config 2) previously paid 64
    sequential kernel launches through the ``lax.map`` vmap rule."""

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = vals.ndim == 2
    if squeeze:
        vals = vals[None]
        luts = luts[None]
    n, h, w = vals.shape
    gh, gw = grid
    th, tw = h // gh, w // gw
    bh, bw = th // 2, tw // 2
    nby, nbx = h // bh, w // bw  # = 2gh x 2gw

    (y0, y1, fy), (x0, x1, fx) = interp
    # per half-band corner indices (constant within a block, by construction
    # of the interpolation: bands of constant (y0, y1) are th/2-aligned)
    by0 = np.asarray(y0[::bh], np.int32)
    by1 = np.asarray(y1[::bh], np.int32)
    bx0 = np.asarray(x0[::bw], np.int32)
    bx1 = np.asarray(x1[::bw], np.int32)
    assert (np.asarray(y0).reshape(nby, bh) == by0[:, None]).all()
    assert (np.asarray(x0).reshape(nbx, bw) == bx0[:, None]).all()

    from yamimageprocessor_tpu.pallas_kernels import (
        _pack_lut_words,
        _select_word_tree,
    )

    # pack each (256,) table into 64 int32 words (tables are integer 0..255)
    words = _pack_lut_words(luts)  # (n, gh, gw, 64)

    # full 2-D weight maps (4 MB f32 each, shared across frames): Mosaic
    # rejects in-kernel broadcasts of (bh, 1)/(1, w) vectors to (bh, bw)
    # tiles ("invalid input layout"), so the rank-1 factors are expanded
    # here and the kernel slices native 2-D blocks instead
    fy_map = jnp.broadcast_to(
        jnp.asarray(fy, jnp.float32).reshape(h, 1), (h, w)
    )
    fx_map = jnp.broadcast_to(
        jnp.asarray(fx, jnp.float32).reshape(1, w), (h, w)
    )

    def tree_lookup(x, read_word):
        word = _select_word_tree(x, read_word, 64, 2)
        sh = (x & 3) * 8
        return (jnp.right_shift(word, sh) & 255).astype(jnp.float32)

    def kernel(by0_r, by1_r, bx0_r, bx1_r, v_ref, w_ref, fy_ref, fx_ref,
               out_ref):
        # grid is (y-band, frame) only — a 3-D grid's per-step pipeline
        # bookkeeping overflowed the 1 MiB SMEM at batch 64; the
        # x-segments are a static in-kernel loop instead.  Band-major
        # order keeps the fy weight block resident across the inner
        # frame sweep (frame-major re-DMA'd it once per frame).
        i = pl.program_id(0)
        f = pl.program_id(1)
        ty0 = by0_r[i]
        ty1 = by1_r[i]
        x_row = v_ref[0].astype(jnp.int32)
        fyb = fy_ref[:]
        fxb = fx_ref[:]
        for j in range(nbx):
            sl = slice(j * bw, (j + 1) * bw)
            tx0 = bx0_r[j]
            tx1 = bx1_r[j]
            x = x_row[:, sl]
            t00 = tree_lookup(x, lambda k: w_ref[f, ty0, tx0, k])
            t01 = tree_lookup(x, lambda k: w_ref[f, ty0, tx1, k])
            t10 = tree_lookup(x, lambda k: w_ref[f, ty1, tx0, k])
            t11 = tree_lookup(x, lambda k: w_ref[f, ty1, tx1, k])
            fy2 = fyb[:, sl]
            fx2 = fxb[:, sl]
            w00 = (1 - fy2) * (1 - fx2)
            w01 = (1 - fy2) * fx2
            w10 = fy2 * (1 - fx2)
            w11 = fy2 * fx2
            out = w00 * t00 + w01 * t01 + w10 * t10 + w11 * t11
            out_ref[0, :, sl] = (
                jnp.clip(jnp.rint(out), 0, 255)
                .astype(jnp.int32)
                .astype(jnp.uint8)
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # by0, by1, bx0, bx1
        grid=(nby, n),
        in_specs=[
            pl.BlockSpec((1, bh, w), lambda i, f, *_: (f, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed tables
            pl.BlockSpec((bh, w), lambda i, f, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, w), lambda i, f, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w), lambda i, f, *_: (f, i, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        interpret=interpret,
    )(
        jnp.asarray(by0),
        jnp.asarray(by1),
        jnp.asarray(bx0),
        jnp.asarray(bx1),
        vals.astype(jnp.uint8),  # cast to i32 in-kernel: 1/4 the DMA bytes
        words,
        fy_map,
        fx_map,
    )
    return out[0] if squeeze else out


def clahe_tile_histograms(work, grid: Tuple[int, int]):
    """(gh*gw, 256) histograms of the grid tiles.

    Large tiles go through the CSA batch kernel; small tiles (the common
    CLAHE case — tens of tiles of a few hundred KPix) through the
    lane-grouped CSA kernel, which amortizes the bit-plane decode over 8
    lane-resident tiles per group."""

    import jax.numpy as jnp

    gh, gw = grid
    h, w = work.shape
    th, tw = h // gh, w // gw
    tiles = (
        work.reshape(gh, th, gw, tw)
        .transpose(0, 2, 1, 3)
        .reshape(gh * gw, th, tw)
    )
    if th * tw >= 1 << 20:
        from yamimageprocessor_tpu.pallas_kernels import histogram256_batch

        return histogram256_batch(tiles.astype(jnp.uint8))
    from yamimageprocessor_tpu.pallas_kernels import histogram256_lane_grouped

    return histogram256_lane_grouped(tiles.astype(jnp.uint8))


def clahe_tile_histograms_batch(work, grid: Tuple[int, int]):
    """(n, gh, gw, 256) histograms for a BATCH of frames (n, h, w) in one
    lane-grouped CSA call — the batched chain's per-frame launches
    collapsed, with the decode shared 8 tiles at a time."""

    import jax.numpy as jnp

    from yamimageprocessor_tpu.pallas_kernels import histogram256_lane_grouped

    gh, gw = grid
    n, h, w = work.shape
    th, tw = h // gh, w // gw
    tiles = (
        work.reshape(n, gh, th, gw, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n * gh * gw, th, tw)
    )
    return histogram256_lane_grouped(tiles.astype(jnp.uint8)).reshape(
        n, gh, gw, 256
    )


__all__ = [
    "clahe_blend_pallas",
    "clahe_tile_histograms",
    "clahe_tile_histograms_batch",
]
