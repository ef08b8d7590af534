"""Pallas/Mosaic TPU kernels for the gather/scatter-shaped hot ops.

XLA's TPU lowering serializes per-pixel table gathers and scatter-adds
(measured ~100x below roofline), and the VPU has no per-lane table
gather, so ``lut[img]`` and ``zeros.at[img].add(1)`` are re-expressed as
vectorized bit algorithms (the plain-XLA fallbacks in
:mod:`yamimageprocessor_tpu.ops.lutops` use 256-level compare sweeps;
these kernels replace the sweeps with O(log)/bitslice formulations):

* :func:`lut_apply` — ``lut[img]``: the 256-entry table is packed 4
  bytes per int32 word (64 words in SMEM); each pixel selects its word
  through a 63-select binary tree keyed on bits 2..7 of the pixel and
  extracts its byte with a per-lane variable shift.  ~75 VPU ops/pixel
  vs the sweep's ~512 — measured 11.6 GPix/s vs 2.7 on a v5e chip.
* :func:`histogram256` — carry-save bitsliced counting: each pixel
  turns into a single set bit (``1 << (x & 31)``) in one of 8 int32
  word-streams (``x >> 5``); per-lane bit-plane counters accumulate the
  streams through a CSA (3:2 compressor) tree kept in VMEM scratch
  across the sequential grid, and one final decode pass converts bit
  planes to the (256,) counts.  Measured 12.5 GPix/s @4096^2 (26 @8192^2)
  vs 2.2 for the sweep.

Both are bit-exact (pure selection / exact counting) and fall back to
the lutops implementations off-TPU (CPU tests run the fallback; TPU
parity is asserted in the benchmark harness).
"""
from __future__ import annotations

import math


def _row_block(h: int, max_rows: int = 512) -> int:
    rows = min(h, max_rows)
    # keep block height a divisor-friendly multiple of 8 where possible
    while h % rows and rows > 8:
        rows -= 8
    return max(rows, 1)


def _pack_lut_words(lut):
    """(..., 256) table(s) -> (..., 64) int32, 4 consecutive entries per
    word (shared by the LUT-apply and CLAHE kernels)."""
    import jax.numpy as jnp

    l32 = lut.astype(jnp.uint32)
    return (
        l32[..., 0::4]
        | (l32[..., 1::4] << 8)
        | (l32[..., 2::4] << 16)
        | (l32[..., 3::4] << 24)
    ).astype(jnp.int32)


def _select_word_tree(x, read_word, n_words: int, first_bit: int):
    """Per-lane select of 1 of ``n_words`` SMEM words via a binary tree
    keyed on bits ``first_bit..`` of ``x``.  ``read_word(i)`` returns
    word i (a scalar); the tree runs log2(n_words) select levels."""
    import jax.numpy as jnp

    levels = int(math.log2(n_words))
    bits = [(x & (1 << (first_bit + b))) != 0 for b in range(levels)]
    level = [
        jnp.where(bits[0], read_word(2 * i + 1), read_word(2 * i))
        for i in range(n_words // 2)
    ]
    for b in range(1, levels):
        level = [
            jnp.where(bits[b], level[2 * i + 1], level[2 * i])
            for i in range(len(level) // 2)
        ]
    return level[0]


def lut_apply(img, lut):
    """``lut[img]`` (uint8 image, (256,) uint8 LUT): packed-word select
    tree + per-lane byte extraction, one HBM read/write, bit-exact."""

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        from yamimageprocessor_tpu.ops.lutops import apply_lut_j

        return apply_lut_j(img, lut)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = img.shape
    flat = img.reshape(-1)
    pad = (-flat.shape[0]) % 1024
    if pad:
        flat = jnp.pad(flat, (0, pad))
    work = flat.reshape(-1, 1024)
    h, w = work.shape
    # 128 rows: the 32 live tree intermediates (32 x rows x 1024 x 4B)
    # must fit VMEM next to the in/out blocks; 128 measured fastest
    # (11.6 GPix/s vs 10.7 at 32 rows)
    rows = _row_block(h, max_rows=128)

    def kernel(img_ref, w_ref, out_ref):
        x = img_ref[:].astype(jnp.int32)
        word = _select_word_tree(x, lambda i: w_ref[i], 64, 2)
        sh = (x & 3) * 8
        out_ref[:] = (jnp.right_shift(word, sh) & 255).astype(jnp.uint8)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint8),
        grid=(pl.cdiv(h, rows),),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(work, _pack_lut_words(lut))
    flat_out = out.reshape(-1)
    if pad:
        flat_out = flat_out[:-pad]
    return flat_out.reshape(orig_shape)


def lut_apply_batch(imgs, luts):
    """Per-frame LUT apply in ONE pallas call: ``imgs`` (N, ...) uint8,
    ``luts`` (N, 256).  The packed (N, 64) word table sits in SMEM and
    each grid step runs the select tree against its frame's row — this
    replaces the sequential per-frame ``lax.map`` with a single batched
    dispatch, which is what makes hist-equalization cheap inside vmapped
    chains."""

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        from yamimageprocessor_tpu.ops.lutops import apply_lut_j

        return jax.vmap(apply_lut_j)(
            imgs.reshape(imgs.shape[0], -1), luts
        ).reshape(imgs.shape)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = imgs.shape[0]
    flat = imgs.reshape(n, -1)
    pad = (-flat.shape[1]) % 1024
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    work = flat.reshape(n, -1, 1024)
    h, w = work.shape[1], work.shape[2]
    rows = _row_block(h, max_rows=128)
    words = _pack_lut_words(luts)  # (N, 64)

    def kernel(img_ref, w_ref, out_ref):
        frame = pl.program_id(0)
        x = img_ref[0].astype(jnp.int32)
        word = _select_word_tree(x, lambda i: w_ref[frame, i], 64, 2)
        sh = (x & 3) * 8
        out_ref[0] = (jnp.right_shift(word, sh) & 255).astype(jnp.uint8)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.uint8),
        grid=(n, pl.cdiv(h, rows)),
        in_specs=[
            pl.BlockSpec(
                (1, rows, w), lambda f, i: (f, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, w), lambda f, i: (f, i, 0), memory_space=pltpu.VMEM
        ),
    )(work, words)
    flat_out = out.reshape(n, -1)
    if pad:
        flat_out = flat_out[:, : flat.shape[1] - pad]
    return flat_out.reshape(imgs.shape)


_CHUNK = 8  # vreg sublane height: the CSA word granularity


def _csa_tree(words):
    """Reduce 0/1-bitmask int32 arrays to bit-plane counters
    (count = sum_d 2^d * bit(plane_d)) with 3:2 compressors."""
    n = len(words)
    if n == 1:
        return [words[0]]
    half = n // 2
    left = _csa_tree(words[:half])
    right = _csa_tree(words[half:])
    out = []
    carry = None
    for d in range(max(len(left), len(right))):
        a = left[d] if d < len(left) else None
        b = right[d] if d < len(right) else None
        terms = [t for t in (a, b, carry) if t is not None]
        if len(terms) == 1:
            out.append(terms[0])
            carry = None
        elif len(terms) == 2:
            out.append(terms[0] ^ terms[1])
            carry = terms[0] & terms[1]
        else:
            x, y, z = terms
            out.append(x ^ y ^ z)
            carry = (x & y) | (z & (x ^ y))
    if carry is not None:
        out.append(carry)
    return out


def _hist_grid(flat, max_rows):
    """Pad a flat uint8 vector into (h, 1024) tiled by ``rows`` blocks."""
    import jax.numpy as jnp

    n0 = flat.shape[0]
    pad = (-n0) % 1024
    if pad:
        flat = jnp.pad(flat, (0, pad))
    work = flat.reshape(-1, 1024)
    h = work.shape[0]
    # the grid must tile the rows EXACTLY and rows must be a multiple of
    # the CSA chunk height: this kernel COUNTS every lane it reads, so
    # overhang rows are zero-padded and bin 0 is corrected afterwards
    rows = max(_CHUNK, (min(h, max_rows) // _CHUNK) * _CHUNK)
    if h % rows:
        extra = rows - (h % rows)
        work = jnp.pad(work, ((0, extra), (0, 0)))
        pad += extra * 1024
        h += extra
    return work, h, rows, pad


def _hist_kernel_body(x, acc_ref, depth: int, nchunks: int):
    """One grid step of CSA accumulation: 8 word-streams, ripple-added
    into the persistent bit-plane scratch."""
    import jax.numpy as jnp

    one = jnp.left_shift(jnp.int32(1), x & 31)
    hi3 = x >> 5
    for j in range(8):
        wj = jnp.where(hi3 == j, one, 0)
        words = [wj[c * _CHUNK : (c + 1) * _CHUNK, :] for c in range(nchunks)]
        new = _csa_tree(words)
        carry = None
        for d in range(depth):
            a = acc_ref[j * depth + d]
            terms = [a]
            if d < len(new):
                terms.append(new[d])
            if carry is not None:
                terms.append(carry)
            if len(terms) == 1:
                break
            if len(terms) == 2:
                s = terms[0] ^ terms[1]
                carry = terms[0] & terms[1]
            else:
                p, q, r = terms
                s = p ^ q ^ r
                carry = (p & q) | (r & (p ^ q))
            acc_ref[j * depth + d] = s


def _swar_decode_ok(depth: int) -> bool:
    """The SWAR decode packs per-bin partial counts into 16-bit halves of
    an int32: a field holds at most CHUNK * (2^depth - 1), so it is exact
    iff that fits 16 bits (true for every CLAHE/batch configuration; only
    gigapixel single-frame accumulations exceed it and fall back)."""

    return _CHUNK * ((1 << depth) - 1) <= 0xFFFF


def _swar_bin_sums(acc_ref, j: int, depth: int):
    """Per-lane bin sums of group ``j`` via hierarchical SWAR popcount —
    yields ``(bin_offset 0..31, (1, 1024) int32 lane sums)``.

    The naive decode re-extracts every bin from the full (CHUNK, 1024)
    scratch (32 bins x depth x 3 ops on 8K words); here each plane is
    split ONCE into four 4-bit-field words (bits p == s mod 4 -> fields,
    8 ops for all 32 bins), rows are summed in-field (fields <= CHUNK
    <= 15), and the 2^d weighting accumulates in 16-bit halves — ~6x
    fewer ops, measured 8.25 -> 3.21 ms on the 64x1024^2 CLAHE batch.
    Requires :func:`_swar_decode_ok`.  Masks after the arithmetic right
    shifts keep only live fields, so sign fill never corrupts a bin; the
    hi half is masked explicitly because bin counts >= 2^15 set bit 31.
    """
    import jax.numpy as jnp

    acc16 = [[jnp.zeros((1, 1024), jnp.int32) for _ in range(4)]
             for _ in range(4)]
    for d in range(depth):
        plane = acc_ref[j * depth + d]
        for s in range(4):
            g4 = jnp.right_shift(plane, s) & 0x11111111
            rsum = jnp.sum(g4, axis=0, keepdims=True)
            for t in range(4):
                t16 = jnp.right_shift(rsum, 4 * t) & 0x000F000F
                acc16[s][t] = acc16[s][t] + jnp.left_shift(t16, d)
    for s in range(4):
        for t in range(4):
            packed = acc16[s][t]
            yield s + 4 * t, packed & 0xFFFF
            yield s + 4 * t + 16, jnp.right_shift(packed, 16) & 0xFFFF


def _hist_decode(out_ref, acc_ref, depth: int, row_fn):
    """Bit-plane -> (256,) decode; ``row_fn(k)`` maps bin k to the SMEM
    output index (identity for single frames, (frame, k) for batches)."""
    import jax
    import jax.numpy as jnp

    if _swar_decode_ok(depth):
        for j in range(8):
            for bb, lane in _swar_bin_sums(acc_ref, j, depth):
                out_ref[row_fn(j * 32 + bb)] = jnp.sum(lane)
        return

    for j in range(8):

        def body(b, _, j=j):
            cnt = jnp.zeros((_CHUNK, 1024), jnp.int32)
            for d in range(depth):
                cnt = cnt + (
                    jnp.right_shift(acc_ref[j * depth + d], b) & 1
                ) * (1 << d)
            out_ref[row_fn(j * 32 + b)] = jnp.sum(cnt)
            return 0

        jax.lax.fori_loop(0, 32, body, 0)


def dilate1_flags(flags):
    """Per-block activation dilation shared by the flood and CC kernels:
    a changed block wakes itself and both vertical neighbors (influence
    travels at most one block per pass).  Both kernels' skip-inactive
    soundness arguments reference THIS function."""
    import jax.numpy as jnp

    z = jnp.zeros((1,), flags.dtype)
    return (
        flags
        | jnp.concatenate([flags[1:], z])
        | jnp.concatenate([z, flags[:-1]])
    )


def _hist_depth(total_chunks: int) -> int:
    # +1 headroom so the final ripple carry never overflows the planes
    return max(6, math.ceil(math.log2(total_chunks + 1)) + 1)


def _hist_decode_grouped(out_ref, acc_ref, depth: int, g):
    """Bit-plane decode for 8 lane-resident tiles at once: per-lane bin
    sums come from the SWAR hierarchical popcount (:func:`_swar_bin_sums`)
    and are segment-reduced per 128-lane tile slot; deep accumulations
    past the 16-bit field capacity fall back to the per-bin extraction."""
    import jax
    import jax.numpy as jnp

    if _swar_decode_ok(depth):
        for j in range(8):
            for bb, lane in _swar_bin_sums(acc_ref, j, depth):
                for t in range(8):
                    out_ref[g * 8 + t, j * 32 + bb] = jnp.sum(
                        lane[0, t * 128 : (t + 1) * 128]
                    )
        return

    for j in range(8):

        def body(b, _, j=j):
            cnt = jnp.zeros((_CHUNK, 1024), jnp.int32)
            for d in range(depth):
                cnt = cnt + (
                    jnp.right_shift(acc_ref[j * depth + d], b) & 1
                ) * (1 << d)
            for t in range(8):
                out_ref[g * 8 + t, j * 32 + b] = jnp.sum(
                    cnt[:, t * 128 : (t + 1) * 128]
                )
            return 0

        jax.lax.fori_loop(0, 32, body, 0)


def histogram256_lane_grouped(tiles, *, interpret: bool = False):
    """(N, ...) uint8 -> (N, 256) int32 histograms for MANY SMALL tiles:
    8 tiles share each vreg row (tile t of a group owns lanes
    [128t, 128(t+1))), so the decode's per-bin bit-plane extraction — the
    dominant cost at CLAHE tile sizes, where `histogram256_batch` pays a
    full-width decode per tile — is amortized over 8 tiles.  Measured on
    the 64x16-tile CLAHE batch this replaces a 39 ms level sweep."""

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu" and not interpret:
        from yamimageprocessor_tpu.ops.lutops import histogram256_j

        return jax.vmap(histogram256_j)(tiles.reshape(tiles.shape[0], -1))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = tiles.shape[0]
    if n > 768:
        # whole-array SMEM output: stay under the 1 MiB space per call
        pieces = [
            histogram256_lane_grouped(tiles[s : s + 768], interpret=interpret)
            for s in range(0, n, 768)
        ]
        return jnp.concatenate(pieces, axis=0)

    flat = tiles.reshape(n, -1)
    pad_px = (-flat.shape[1]) % (128 * _CHUNK)
    if pad_px:
        flat = jnp.pad(flat, ((0, 0), (0, pad_px)))
    pad_tiles = (-n) % 8
    if pad_tiles:
        flat = jnp.pad(flat, ((0, pad_tiles), (0, 0)))
    ng = flat.shape[0] // 8
    r = flat.shape[1] // 128
    work = (
        flat.reshape(ng, 8, r, 128)
        .transpose(0, 2, 1, 3)
        .reshape(ng, r, 1024)
    )
    rows = max(_CHUNK, (min(r, 512) // _CHUNK) * _CHUNK)
    if r % rows:
        extra = rows - (r % rows)
        work = jnp.pad(work, ((0, 0), (0, extra), (0, 0)))
        pad_px += extra * 128  # per tile: each pad row adds 128 zeros
        r += extra
    nsteps = r // rows
    nchunks = rows // _CHUNK
    depth = _hist_depth(nsteps * nchunks)

    def kernel(img_ref, out_ref, acc_ref):
        g = pl.program_id(0)
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        _hist_kernel_body(
            img_ref[0].astype(jnp.int32), acc_ref, depth, nchunks
        )

        @pl.when(step == nsteps - 1)
        def _decode():
            _hist_decode_grouped(out_ref, acc_ref, depth, g)

    counts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ng * 8, 256), jnp.int32),
        grid=(ng, nsteps),
        in_specs=[
            pl.BlockSpec(
                (1, rows, 1024),
                lambda g, i: (g, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((8 * depth, _CHUNK, 1024), jnp.int32)],
        interpret=interpret,
    )(work)
    counts = counts[:n]
    if pad_px:
        counts = counts.at[:, 0].add(-pad_px)
    return counts


def histogram256(img):
    """(256,) int32 level counts for a uint8 image — CSA bitslice."""

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        from yamimageprocessor_tpu.ops.lutops import histogram256_j

        return histogram256_j(img)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    work, h, rows, pad = _hist_grid(img.reshape(-1), max_rows=512)
    nsteps = h // rows
    nchunks = rows // _CHUNK
    depth = _hist_depth(nsteps * nchunks)

    def kernel(img_ref, out_ref, acc_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        _hist_kernel_body(
            img_ref[:].astype(jnp.int32), acc_ref, depth, nchunks
        )

        @pl.when(step == nsteps - 1)
        def _decode():
            _hist_decode(out_ref, acc_ref, depth, lambda k: k)

    counts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256,), jnp.int32),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((rows, 1024), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((8 * depth, _CHUNK, 1024), jnp.int32)
        ],
    )(work)
    hist = counts
    if pad:
        hist = hist.at[0].add(-pad)
    return hist


def histogram256_batch(imgs):
    """(N, ...) uint8 → (N, 256) int32 histograms in ONE pallas call;
    the CSA scratch is reset/decoded per frame along the major grid dim."""

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        from yamimageprocessor_tpu.ops.lutops import histogram256_j

        return jax.vmap(histogram256_j)(imgs.reshape(imgs.shape[0], -1))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = imgs.shape[0]
    if n > 768:
        # the whole-array (n, 256) int32 output lives in SMEM (1 MiB):
        # larger batches are split so each call stays under ~768 KiB
        pieces = [
            histogram256_batch(imgs[s : s + 768]) for s in range(0, n, 768)
        ]
        return jnp.concatenate(pieces, axis=0)
    flat = imgs.reshape(n, -1)
    pad = (-flat.shape[1]) % 1024
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    work = flat.reshape(n, -1, 1024)
    h = work.shape[1]
    rows = max(_CHUNK, (min(h, 512) // _CHUNK) * _CHUNK)
    if h % rows:
        extra = rows - (h % rows)
        work = jnp.pad(work, ((0, 0), (0, extra), (0, 0)))
        pad += extra * 1024
        h += extra
    nsteps = h // rows
    nchunks = rows // _CHUNK
    depth = _hist_depth(nsteps * nchunks)

    def kernel(img_ref, out_ref, acc_ref):
        frame = pl.program_id(0)
        step = pl.program_id(1)

        @pl.when(step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        _hist_kernel_body(
            img_ref[0].astype(jnp.int32), acc_ref, depth, nchunks
        )

        @pl.when(step == nsteps - 1)
        def _decode():
            _hist_decode(out_ref, acc_ref, depth, lambda k: (frame, k))

    counts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 256), jnp.int32),
        grid=(n, nsteps),
        in_specs=[
            pl.BlockSpec(
                (1, rows, 1024), lambda f, i: (f, i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((8 * depth, _CHUNK, 1024), jnp.int32)
        ],
    )(work)
    if pad:
        counts = counts.at[:, 0].add(-pad)
    return counts


_batchable_histogram = None


def histogram256_batchable():
    """vmap-safe wrapper: single frames hit the pallas kernel; under vmap
    a custom batching rule dispatches the one-call batched kernel (the
    SMEM output block is not batchable directly)."""

    global _batchable_histogram
    if _batchable_histogram is not None:
        return _batchable_histogram

    import jax

    @jax.custom_batching.custom_vmap
    def hist(img):
        return histogram256(img)

    @hist.def_vmap
    def _rule(axis_size, in_batched, img):  # noqa: ANN001
        del axis_size
        return histogram256_batch(img), True

    _batchable_histogram = hist
    return hist


_batchable_lut = None


def lut_apply_batchable():
    """vmap-safe LUT apply: handles batched images with per-frame LUTs
    (histogram equalization under a vmapped chain) via the one-call
    batched kernel; the plain kernel covers the unbatched cases."""

    global _batchable_lut
    if _batchable_lut is not None:
        return _batchable_lut

    import jax
    import jax.numpy as jnp

    @jax.custom_batching.custom_vmap
    def apply(img, lut):
        return lut_apply(img, lut)

    @apply.def_vmap
    def _rule(axis_size, in_batched, img, lut):  # noqa: ANN001
        img_b, lut_b = in_batched
        if not img_b:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        if not lut_b:
            lut = jnp.broadcast_to(lut[None], (axis_size,) + lut.shape)
        return lut_apply_batch(img, lut), True

    _batchable_lut = apply
    return apply


__all__ = [
    "lut_apply",
    "lut_apply_batch",
    "histogram256",
    "histogram256_batch",
    "histogram256_batchable",
    "lut_apply_batchable",
]
