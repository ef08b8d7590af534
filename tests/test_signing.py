"""Module signing: real RSA keys/signatures against the from-scratch DER
parser (models reference tests/test_app_core_plugin_signatures.py)."""
from __future__ import annotations

import subprocess
from pathlib import Path

import pytest

from yamimageprocessor_tpu.core import signing


@pytest.fixture(scope="module")
def keypair(tmp_path_factory):
    base = tmp_path_factory.mktemp("keys")
    priv = base / "key.pem"
    pub = base / "key.pub.pem"
    subprocess.run(
        ["openssl", "genrsa", "-out", str(priv), "2048"],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["openssl", "rsa", "-in", str(priv), "-pubout", "-out", str(pub)],
        check=True,
        capture_output=True,
    )
    return priv, pub


def _sign(priv: Path, data: bytes, out: Path) -> None:
    proc = subprocess.run(
        ["openssl", "dgst", "-sha256", "-sign", str(priv), "-out", str(out)],
        input=data,
        check=True,
        capture_output=True,
    )


def test_verify_valid_signature(keypair, tmp_path):
    priv, pub = keypair
    store = tmp_path / "trust"
    store.mkdir()
    (store / "dev.pem").write_bytes(pub.read_bytes())

    module = tmp_path / "module.py"
    module.write_text("def register_module(core):\n    pass\n")
    sig = signing.signature_path_for(module)
    _sign(priv, module.read_bytes(), sig)

    verifier = signing.ModuleSignatureVerifier(trust_store=store)
    assert verifier.key_count == 1
    verifier.verify_file(module)  # does not raise


def test_reject_tampered_module(keypair, tmp_path):
    priv, pub = keypair
    store = tmp_path / "trust"
    store.mkdir()
    (store / "dev.pem").write_bytes(pub.read_bytes())

    module = tmp_path / "module.py"
    module.write_text("original = 1\n")
    sig = signing.signature_path_for(module)
    _sign(priv, module.read_bytes(), sig)
    module.write_text("tampered = 2\n")

    verifier = signing.ModuleSignatureVerifier(trust_store=store)
    with pytest.raises(signing.InvalidSignatureError):
        verifier.verify_file(module)


def test_missing_signature(keypair, tmp_path):
    _, pub = keypair
    store = tmp_path / "trust"
    store.mkdir()
    (store / "dev.pem").write_bytes(pub.read_bytes())
    module = tmp_path / "unsigned.py"
    module.write_text("x = 1\n")
    verifier = signing.ModuleSignatureVerifier(trust_store=store)
    with pytest.raises(signing.MissingSignatureError):
        verifier.verify_file(module)


def test_certificate_trust_store(keypair, tmp_path):
    priv, _ = keypair
    cert = tmp_path / "cert.pem"
    subprocess.run(
        [
            "openssl",
            "req",
            "-new",
            "-x509",
            "-key",
            str(priv),
            "-out",
            str(cert),
            "-days",
            "1",
            "-subj",
            "/CN=yam-test",
        ],
        check=True,
        capture_output=True,
    )
    store = tmp_path / "trust"
    store.mkdir()
    (store / "dev.crt").write_bytes(cert.read_bytes())

    module = tmp_path / "module.py"
    module.write_text("cert_signed = True\n")
    _sign(priv, module.read_bytes(), signing.signature_path_for(module))

    verifier = signing.ModuleSignatureVerifier(trust_store=store)
    verifier.verify_file(module)


def test_empty_trust_store(tmp_path):
    store = tmp_path / "empty"
    store.mkdir()
    with pytest.raises(signing.TrustStoreError):
        signing.ModuleSignatureVerifier(trust_store=store)


def test_missing_trust_store(tmp_path):
    with pytest.raises(signing.TrustStoreError):
        signing.ModuleSignatureVerifier(trust_store=tmp_path / "nope")
