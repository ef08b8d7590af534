"""Sandbox path validation tests (parity with reference tests/test_path_sanitizer.py)."""
from __future__ import annotations

import os

import pytest

from yamimageprocessor_tpu.core import path_sanitizer as ps


@pytest.fixture(autouse=True)
def sandbox(tmp_path):
    root = tmp_path / "sandbox"
    root.mkdir()
    ps.configure_allowed_roots([root])
    yield root
    ps.configure_allowed_roots([os.getcwd()])


def test_accepts_paths_inside_root(sandbox):
    target = sandbox / "images" / "a.png"
    resolved = ps.sanitize_user_path(target)
    assert resolved == target.resolve()


def test_rejects_escape(sandbox, tmp_path):
    outside = tmp_path / "outside.png"
    with pytest.raises(ps.PathValidationError):
        ps.sanitize_user_path(outside)


def test_rejects_dotdot_escape(sandbox):
    with pytest.raises(ps.PathValidationError):
        ps.sanitize_user_path(sandbox / ".." / "evil.png")


def test_rejects_symlink(sandbox, tmp_path):
    outside = tmp_path / "real"
    outside.mkdir()
    link = sandbox / "link"
    link.symlink_to(outside)
    with pytest.raises(ps.PathValidationError):
        ps.sanitize_user_path(link / "f.png")


def test_must_exist(sandbox):
    with pytest.raises(ps.PathValidationError):
        ps.sanitize_user_path(sandbox / "missing.png", must_exist=True)
    existing = sandbox / "there.png"
    existing.write_bytes(b"x")
    assert ps.sanitize_user_path(existing, must_exist=True) == existing.resolve()


def test_file_directory_gates(sandbox):
    d = sandbox / "dir"
    d.mkdir()
    f = sandbox / "f.txt"
    f.write_text("hi")
    with pytest.raises(ps.PathValidationError):
        ps.sanitize_user_path(d, allow_directory=False)
    with pytest.raises(ps.PathValidationError):
        ps.sanitize_user_path(f, allow_file=False)


def test_redaction_and_root_index(sandbox):
    inside = sandbox / "sub" / "img.png"
    assert ps.redact_path_for_metadata(inside) == str(
        os.path.join(ps.ROOT_PLACEHOLDER, "sub", "img.png")
    )
    assert ps.root_index_for_path(inside) == 0
    assert ps.root_index_for_path("/nowhere/else") is None
    assert ps.redact_path_for_metadata("/nowhere/else/secret.png") == "secret.png"


def test_symlinked_allowed_root_rejected(tmp_path):
    """The symlink test must run on the UNRESOLVED root (r3 review: it ran
    after resolve(), which dereferences the link, so it never fired)."""

    import pytest as _pytest

    from yamimageprocessor_tpu.core.path_sanitizer import (
        PathValidationError,
        configure_allowed_roots,
    )

    real = tmp_path / "real"
    real.mkdir()
    link = tmp_path / "link"
    link.symlink_to(real)
    with _pytest.raises(PathValidationError):
        configure_allowed_roots([link])
    configure_allowed_roots([real])  # restore a sane state for other tests
