"""Pallas TPU kernel for separable correlation on uint8 frames.

``filters.sep_filter_j``'s lane-shifted column taps (``work[:, i:i+w]``)
cost a cross-lane shuffle per tap in XLA and the f32 intermediate breaks
fusion; this kernel stages row blocks (plus the y-halo) in VMEM via
manual DMA and runs both passes on-chip — column taps as ``pltpu.roll``
lane rotations over the pre-padded width, row taps as sublane slices.

Bit-exact with the XLA twin: the input is reflect-padded identically, the
cast to f32 happens before the x-pass, and both tap loops accumulate in
the same ascending order, so every f32 add matches; the final
``clip(rint(.))`` is the shared cv2 rounding.  Scope: 2-D uint8 frames
(optionally leading batch), reflect101 border — everything else stays on
the XLA path.
"""
from __future__ import annotations


def sep_filter_u8_pallas(imgs, taps_y, taps_x, *, interpret: bool = False):
    """``imgs`` (N, H, W) uint8; returns (N, H, W) uint8 (x-pass then
    y-pass then saturate-round, identical to
    ``to_uint8_j(sep_filter_j(img, taps_y, taps_x))``)."""

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ky = int(taps_y.shape[0])
    kx = int(taps_x.shape[0])
    ry, rx = ky // 2, kx // 2
    n, h, w = imgs.shape

    padded = jnp.pad(
        imgs, ((0, 0), (ry, ry), (rx, rx)), mode="reflect"
    )  # reflect101
    wp = w + 2 * rx
    wpad = (-wp) % 128
    if wpad:
        padded = jnp.pad(padded, ((0, 0), (0, 0), (0, wpad)))
    WP = wp + wpad

    # Mosaic's scoped stack holds ~(k) live f32 planes of the staged
    # window during the unrolled tap loops; big kernels need short blocks
    # to stay inside the 16 MB scoped-VMEM limit
    rows = 256 if max(kx, ky) <= 9 else 64
    while rows > 8 and rows > h:
        rows //= 2
    hp = -(-h // rows) * rows
    # staged windows are rows+32 tall: DMA slice lengths must be aligned
    # to the sublane tiling, and the slack rows double as the y-halo
    # (ry <= 16); overhang rows read garbage and are cropped
    stage = rows + 32
    assert 2 * ry <= 32, "kernel taller than the staged halo"
    pad_bottom = (hp + stage - rows) - (h + 2 * ry)
    padded = jnp.pad(padded, ((0, 0), (0, pad_bottom), (0, 0)))
    nblocks = hp // rows
    r2 = stage

    def kernel(ty_ref, tx_ref, in_hbm, out_ref, scratch, sem):
        # double-buffered staging: the slot for step s+1 is filled while
        # step s computes, so the halo DMA never serializes with the taps
        f = pl.program_id(0)
        i = pl.program_id(1)
        step = f * nblocks + i
        slot = step % 2

        @pl.when(step == 0)
        def _first():
            pltpu.make_async_copy(
                in_hbm.at[f, pl.ds(i * rows, r2)], scratch.at[0], sem.at[0]
            ).start()

        nf = jnp.where(i + 1 < nblocks, f, f + 1)
        ni = jnp.where(i + 1 < nblocks, i + 1, 0)

        @pl.when(step + 1 < n * nblocks)
        def _prefetch():
            pltpu.make_async_copy(
                in_hbm.at[nf, pl.ds(ni * rows, r2)],
                scratch.at[(step + 1) % 2],
                sem.at[(step + 1) % 2],
            ).start()

        pltpu.make_async_copy(
            in_hbm.at[f, pl.ds(i * rows, r2)], scratch.at[slot], sem.at[slot]
        ).wait()
        # Mosaic has no direct u8->f32 cast; widen via int32
        x = scratch[slot].astype(jnp.int32).astype(jnp.float32)
        acc = tx_ref[0] * x
        for t in range(1, kx):
            rolled = pltpu.roll(x, (WP - t) % WP, axis=1)
            acc = acc + tx_ref[t] * rolled
        out = ty_ref[0] * acc[0:rows]
        for t in range(1, ky):
            out = out + ty_ref[t] * acc[t : t + rows]
        out_ref[0] = (
            jnp.clip(jnp.rint(out), 0, 255).astype(jnp.int32).astype(jnp.uint8)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, nblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, WP), lambda f, i: (f, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, r2, WP), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, hp, WP), jnp.uint8),
        interpret=interpret,
    )(taps_y.astype(jnp.float32), taps_x.astype(jnp.float32), padded)
    return out[:, :h, :w]


def sep_filter_u8_planes(imgs, taps_y, taps_x, *, interpret: bool = False):
    """Channel-image twin: ``imgs`` (N, H, W, C) uint8 → same shape.

    Channels move to the pallas grid's frame axis (one (N*C, H, W) batched
    call), exactly equivalent to the XLA path's per-channel lanes: the
    taps apply per channel with identical f32 accumulation order, so the
    result is bit-exact vs ``to_uint8_j(sep_filter_j(img, ty, tx))``.  The
    two u8 transposes cost ~2x frame bytes of HBM traffic — small against
    the lane-shuffle taps they replace."""

    import jax.numpy as jnp

    n, h, w, c = imgs.shape
    planes = jnp.transpose(imgs, (0, 3, 1, 2)).reshape(n * c, h, w)
    out = sep_filter_u8_pallas(planes, taps_y, taps_x, interpret=interpret)
    return jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))


_batchable = None


def sep_filter_u8_batchable():
    """vmap-safe single-frame wrapper (batched frames dispatch the one-call
    batched grid); accepts (H, W) gray or (H, W, C) channel frames."""

    global _batchable
    if _batchable is not None:
        return _batchable

    import jax

    @jax.custom_batching.custom_vmap
    def one(img, ty, tx):
        if img.ndim == 3:  # (H, W, C)
            return sep_filter_u8_planes(img[None], ty, tx)[0]
        return sep_filter_u8_pallas(img[None], ty, tx)[0]

    @one.def_vmap
    def _rule(axis_size, in_batched, img, tx_ty, tx):  # noqa: ANN001
        del axis_size, in_batched
        if img.ndim == 4:  # (N, H, W, C)
            return sep_filter_u8_planes(img, tx_ty, tx), True
        return sep_filter_u8_pallas(img, tx_ty, tx), True

    _batchable = one
    return _batchable


__all__ = [
    "sep_filter_u8_pallas",
    "sep_filter_u8_planes",
    "sep_filter_u8_batchable",
]
