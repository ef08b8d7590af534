"""Test harness configuration.

Tests run against the JAX CPU backend with a virtual 8-device mesh so the
multi-chip sharding paths compile and execute without TPU hardware.  This
mirrors the reference suite's fake-backend strategy
(/root/reference/tests/conftest.py:13-37 injects the repo root and gates
performance tests behind ``--run-performance``).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

# Must happen before any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest


def pytest_addoption(parser: pytest.Parser) -> None:
    parser.addoption(
        "--run-performance",
        action="store_true",
        default=False,
        help="run tests marked as performance budgets",
    )


def pytest_collection_modifyitems(config: pytest.Config, items) -> None:
    if config.getoption("--run-performance"):
        return
    skip_perf = pytest.mark.skip(reason="needs --run-performance option")
    for item in items:
        if "performance" in item.keywords:
            item.add_marker(skip_perf)


@pytest.fixture()
def rng():
    import numpy as np

    return np.random.default_rng(1234)
