"""Persistent XLA compilation cache wiring.

Mosaic/Pallas kernels in this package (bit-plane histograms, select-tree
LUTs, the watershed flood) carry multi-minute first-compile costs on slow
compile services; the persistent cache bounds that to once per machine.
Every entry point (bench, graft entry, CLI, tests) calls
:func:`enable_persistent_cache` before building jitted programs.

The reference app has no compiled artifacts; this is TPU-runtime
infrastructure with no reference counterpart.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"
_enabled = False


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None) -> str:
    """Point jax at an on-disk compilation cache (idempotent).

    Honors an explicit ``JAX_COMPILATION_CACHE_DIR`` if the environment
    already set one; otherwise uses ``<repo>/.jax_cache``.
    """

    global _enabled
    import jax

    # TPU-only: Mosaic first-compiles are the multi-minute cost the cache
    # bounds.  CPU compiles are cheap AND the XLA:CPU AOT loader accepts
    # cache entries from hosts with different CPU features ("could lead to
    # execution errors such as SIGILL"), so a shared cache dir must never
    # serve the CPU harness (the driver's virtual-mesh dryrun).
    platforms = os.environ.get("JAX_PLATFORMS", jax.config.jax_platforms or "")
    if "cpu" in platforms.lower():
        return ""
    # An EXPLICIT non-CPU platform (axon/tpu) is trusted as-is — no backend
    # init, so host-only CLI subcommands stay cheap and never contend for
    # the chip lock.  Only the ambiguous case (platforms unset, where jax
    # may silently default to CPU — the machines where a shared CPU AOT
    # cache is the documented SIGILL hazard) pays a backend init to find
    # out; there the resolved backend is CPU iff no accelerator exists, so
    # the init is cheap and lock-free.
    if not platforms and jax.default_backend() == "cpu":
        return ""

    target = str(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    if _enabled and jax.config.jax_compilation_cache_dir == target:
        return target
    Path(target).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", target)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return target


__all__ = ["enable_persistent_cache"]
