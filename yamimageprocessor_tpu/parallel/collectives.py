"""Reusable shard_map collective helpers (row-sharded frames over a 1-D
mesh axis).

The reference has no distributed machinery (SURVEY §2.5); these helpers are
the ICI vocabulary the spatially-sharded ops build on: neighbor halo
exchange via ``ppermute`` and static axis sizing.  Fill values at TRUE
frame edges are per-op (each op's own border semantics), which is what
makes sharded results bit-identical to the dense path rather than merely
interior-identical.
"""
from __future__ import annotations

from typing import Any, Tuple


def axis_len(axis: str) -> int:
    """Static size of a shard_map mesh axis."""

    import jax

    return int(jax.lax.psum(1, axis))


def neighbor_perms(n: int) -> Tuple[list, list]:
    """(down, up) ppermute pairs: ``down`` sends shard i -> i+1 (so each
    shard RECEIVES from above); ``up`` sends i -> i-1 (receive from
    below)."""

    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i + 1, i) for i in range(n - 1)]
    return down, up


def exchange_rows(block, halo: int, axis: str, *, fill: Any = 0):
    """Concatenate ``halo`` rows from both mesh neighbors around ``block``.

    At the true frame edges (first shard's top, last shard's bottom) the
    halo is filled with ``fill`` — a scalar broadcast to the halo shape —
    so the caller can reproduce its op's dense border semantics exactly
    (erosion wants the dtype max, dilation the min, distance transforms
    +inf, flood costs a sentinel...).
    """

    import jax
    import jax.numpy as jnp

    n = axis_len(axis)
    idx = jax.lax.axis_index(axis)
    down, up = neighbor_perms(n)
    top_rows = block[:halo]
    bottom_rows = block[-halo:]
    from_above = jax.lax.ppermute(bottom_rows, axis, down)
    from_below = jax.lax.ppermute(top_rows, axis, up)
    fill_above = jnp.full_like(from_above, fill)
    fill_below = jnp.full_like(from_below, fill)
    from_above = jnp.where(idx == 0, fill_above, from_above)
    from_below = jnp.where(idx == n - 1, fill_below, from_below)
    return jnp.concatenate([from_above, block, from_below], axis=0)


def sharded_stencil(fn, block, halo: int, axis: str, *, fill: Any = 0):
    """Run ``fn`` on the halo-padded block and crop the center rows —
    exact for any stencil of radius <= halo given the right edge fill."""

    if halo <= 0:
        return fn(block)
    padded = exchange_rows(block, halo, axis, fill=fill)
    return fn(padded)[halo:-halo]


__all__ = ["axis_len", "neighbor_perms", "exchange_rows", "sharded_stencil"]
