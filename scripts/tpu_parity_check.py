#!/usr/bin/env python
"""One-shot CPU<->TPU parity audit on real hardware.

Thin wrapper over :mod:`yamimageprocessor_tpu.services.parity` (the same
audit `bench.py` runs in-process every round).  Exit code 0 iff every op
meets its documented parity class (bit-exact for integer/mask ops, <=1 LSB
for float filter ops).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import bench

    if not bench.accelerator_available():
        print(
            "accelerator backend unavailable (relay down?) — aborting "
            "instead of hanging; re-run when jax.devices() responds"
        )
        return 2

    import jax

    from yamimageprocessor_tpu.services.parity import run_parity_cases
    from yamimageprocessor_tpu.utils.jaxcache import enable_persistent_cache

    # share bench.py's on-disk compile cache so each Mosaic kernel's
    # multi-minute first compile is paid at most once per machine
    enable_persistent_cache()
    print(f"backend: {jax.default_backend()}")
    passed, total = run_parity_cases(report=print)
    print("PARITY:", "PASS" if passed == total else f"{total - passed} FAILURES")
    return 0 if passed == total else 1


if __name__ == "__main__":
    raise SystemExit(main())
