"""Plugin discovery: loose-file loading under the dynamic namespace with
the signature gate (models reference tests/test_module_loader.py and
test_app_core_plugin_signatures.py)."""
from __future__ import annotations

import subprocess
import textwrap
from pathlib import Path

import pytest

from yamimageprocessor_tpu.core.module_loader import ModuleLoader, ModuleRegistry
from yamimageprocessor_tpu.core.signing import (
    ModuleSignatureVerifier,
    signature_path_for,
)


PLUGIN_SOURCE = textwrap.dedent(
    '''
    from yamimageprocessor_tpu.plugins.module_base import (
        ModuleBase, ModuleMetadata, ModuleStage)

    class DemoModule(ModuleBase):
        op_identifier = "preprocessing.gamma"

        def _build_metadata(self):
            return ModuleMetadata(
                identifier="DemoGamma",
                title="Demo Gamma",
                stage=ModuleStage.PREPROCESSING,
            )

    def register_module(app_core):
        app_core.register_module(DemoModule)
    '''
)


class _FakeCore:
    def __init__(self):
        self.registered = []

    def register_module(self, cls):
        self.registered.append(cls if isinstance(cls, type) else type(cls))


@pytest.fixture(scope="module")
def keypair(tmp_path_factory):
    base = tmp_path_factory.mktemp("loaderkeys")
    priv, pub = base / "k.pem", base / "k.pub.pem"
    subprocess.run(["openssl", "genrsa", "-out", str(priv), "2048"],
                   check=True, capture_output=True)
    subprocess.run(["openssl", "rsa", "-in", str(priv), "-pubout", "-out", str(pub)],
                   check=True, capture_output=True)
    return priv, pub


def _write_plugin(directory: Path, name: str = "demo_plugin") -> Path:
    path = directory / f"{name}.py"
    path.write_text(PLUGIN_SOURCE)
    return path


def test_discover_unsigned_without_gate(tmp_path):
    _write_plugin(tmp_path)
    core = _FakeCore()
    loaded = ModuleLoader().discover_path(tmp_path, core)
    assert len(loaded) == 1
    assert loaded[0].endswith("demo_plugin")
    assert core.registered and core.registered[0].__name__ == "DemoModule"


def test_require_signatures_rejects_unsigned(tmp_path, keypair):
    _, pub = keypair
    store = tmp_path / "trust"
    store.mkdir()
    (store / "k.pem").write_bytes(pub.read_bytes())
    _write_plugin(tmp_path)
    verifier = ModuleSignatureVerifier(trust_store=store)
    core = _FakeCore()
    loaded = ModuleLoader(verifier, require_signatures=True).discover_path(
        tmp_path, core
    )
    assert loaded == []
    assert core.registered == []


def test_signed_plugin_loads(tmp_path, keypair):
    priv, pub = keypair
    store = tmp_path / "trust"
    store.mkdir()
    (store / "k.pem").write_bytes(pub.read_bytes())
    plugin = _write_plugin(tmp_path, "signed_plugin")
    subprocess.run(
        ["openssl", "dgst", "-sha256", "-sign", str(priv),
         "-out", str(signature_path_for(plugin)), str(plugin)],
        check=True, capture_output=True,
    )
    verifier = ModuleSignatureVerifier(trust_store=store)
    core = _FakeCore()
    loaded = ModuleLoader(verifier, require_signatures=True).discover_path(
        tmp_path, core
    )
    assert len(loaded) == 1
    assert core.registered[0].__name__ == "DemoModule"


def test_invalid_signature_always_rejected(tmp_path, keypair):
    priv, pub = keypair
    store = tmp_path / "trust"
    store.mkdir()
    (store / "k.pem").write_bytes(pub.read_bytes())
    plugin = _write_plugin(tmp_path, "tampered_plugin")
    subprocess.run(
        ["openssl", "dgst", "-sha256", "-sign", str(priv),
         "-out", str(signature_path_for(plugin)), str(plugin)],
        check=True, capture_output=True,
    )
    plugin.write_text(PLUGIN_SOURCE + "\nEVIL = True\n")
    verifier = ModuleSignatureVerifier(trust_store=store)
    core = _FakeCore()
    # even without require_signatures, an INVALID signature is fatal
    loaded = ModuleLoader(verifier, require_signatures=False).discover_path(
        tmp_path, core
    )
    assert loaded == []


def test_registry_stage_buckets():
    from yamimageprocessor_tpu.modules.preprocessing import GrayscaleModule
    from yamimageprocessor_tpu.ops.schema import Stage

    registry = ModuleRegistry()
    registry.register(GrayscaleModule())
    registry.register(GrayscaleModule())  # duplicate identifier ignored
    assert len(registry.modules(Stage.PREPROCESSING)) == 1
    assert registry.get("Grayscale") is not None
    assert not registry.is_enabled("Grayscale")
    registry.set_enabled("Grayscale", True)
    assert [m.metadata.identifier for m in registry.iter_enabled()] == ["Grayscale"]
