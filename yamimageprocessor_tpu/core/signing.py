"""Detached module-signature verification (RSA PKCS#1 v1.5 / SHA-256).

Capability parity with the reference verifier (``core/signing.py:16-310``):
a dependency-free PEM/DER parser that extracts RSA public keys from
``PUBLIC KEY`` (SubjectPublicKeyInfo), ``RSA PUBLIC KEY`` (PKCS#1) and
``CERTIFICATE`` (X.509) blocks in a trust-store directory, plus textbook
RSA signature verification: ``sig^e mod n`` must equal the
EMSA-PKCS1-v1_5 encoding of the SHA-256 digest.  Workflow documented in
the reference's ``docs/PLUGIN_SIGNING.md``.
"""
from __future__ import annotations

import base64
import hashlib
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterable, Iterator, List, Optional, Tuple

PublicKey = Tuple[int, int]  # (modulus n, exponent e)


class SignatureVerificationError(RuntimeError):
    """Base class for signature verification failures."""


class TrustStoreError(SignatureVerificationError):
    """Trust store missing or unusable."""


class MissingSignatureError(SignatureVerificationError):
    """No signature found for a module."""


class InvalidSignatureError(SignatureVerificationError):
    """The signature does not match any trusted key."""


# DigestInfo prefix for SHA-256 (RFC 8017 §9.2 notes)
_SHA256_DIGEST_INFO = bytes.fromhex("3031300d060960864801650304020105000420")

_PEM_RE = re.compile(
    rb"-----BEGIN ([A-Z0-9 ]+)-----(.*?)-----END \1-----", re.DOTALL
)

_OID_RSA_ENCRYPTION = (1, 2, 840, 113549, 1, 1, 1)


class DerError(ValueError):
    """Malformed DER structure."""


class DerReader:
    """Minimal DER TLV cursor."""

    def __init__(self, data: bytes) -> None:
        self._data = memoryview(bytes(data))
        self._pos = 0

    def eof(self) -> bool:
        return self._pos >= len(self._data)

    def peek_tag(self) -> int:
        if self.eof():
            raise DerError("unexpected end of DER data")
        return self._data[self._pos]

    def _take(self, count: int) -> memoryview:
        if self._pos + count > len(self._data):
            raise DerError("truncated DER data")
        chunk = self._data[self._pos : self._pos + count]
        self._pos += count
        return chunk

    def read_tlv(self) -> Tuple[int, bytes]:
        tag = self._take(1)[0]
        first = self._take(1)[0]
        if first < 0x80:
            length = first
        else:
            n_bytes = first & 0x7F
            if n_bytes == 0 or n_bytes > 4:
                raise DerError("unsupported DER length encoding")
            length = int.from_bytes(self._take(n_bytes), "big")
        return tag, bytes(self._take(length))

    def skip(self) -> None:
        self.read_tlv()

    def read_sequence(self) -> "DerReader":
        tag, body = self.read_tlv()
        if tag != 0x30:
            raise DerError(f"expected SEQUENCE, found tag 0x{tag:02x}")
        return DerReader(body)

    def read_integer(self) -> int:
        tag, body = self.read_tlv()
        if tag != 0x02:
            raise DerError(f"expected INTEGER, found tag 0x{tag:02x}")
        return int.from_bytes(body, "big")

    def read_bit_string(self) -> bytes:
        tag, body = self.read_tlv()
        if tag != 0x03:
            raise DerError(f"expected BIT STRING, found tag 0x{tag:02x}")
        if not body or body[0] != 0:
            raise DerError("unsupported BIT STRING padding")
        return body[1:]

    def read_oid(self) -> Tuple[int, ...]:
        tag, body = self.read_tlv()
        if tag != 0x06:
            raise DerError(f"expected OBJECT IDENTIFIER, found tag 0x{tag:02x}")
        if not body:
            raise DerError("empty OID")
        components: List[int] = [body[0] // 40, body[0] % 40]
        value = 0
        for byte in body[1:]:
            value = (value << 7) | (byte & 0x7F)
            if not byte & 0x80:
                components.append(value)
                value = 0
        return tuple(components)


def iter_pem_blocks(pem_data: bytes) -> Iterator[Tuple[str, bytes]]:
    for match in _PEM_RE.finditer(pem_data):
        label = match.group(1).decode("ascii")
        body = b"".join(match.group(2).split())
        try:
            yield label, base64.b64decode(body, validate=True)
        except Exception as exc:
            raise TrustStoreError(f"invalid PEM payload in {label} block") from exc


def parse_pkcs1_public_key(der: bytes) -> PublicKey:
    seq = DerReader(der).read_sequence()
    n = seq.read_integer()
    e = seq.read_integer()
    return (n, e)


def parse_subject_public_key_info(der: bytes) -> Optional[PublicKey]:
    spki = DerReader(der).read_sequence()
    algorithm = spki.read_sequence()
    if algorithm.read_oid() != _OID_RSA_ENCRYPTION:
        return None
    key_bits = spki.read_bit_string()
    return parse_pkcs1_public_key(key_bits)


def parse_certificate_public_key(der: bytes) -> Optional[PublicKey]:
    cert = DerReader(der).read_sequence()
    tbs = cert.read_sequence()
    if tbs.peek_tag() == 0xA0:  # explicit [0] version
        tbs.skip()
    tbs.read_integer()  # serial
    tbs.skip()  # signature algorithm
    tbs.skip()  # issuer
    tbs.skip()  # validity
    tbs.skip()  # subject
    # subjectPublicKeyInfo
    tag, body = tbs.read_tlv()
    if tag != 0x30:
        raise DerError("malformed certificate: SPKI not found")
    spki_der = b"\x30" + _encode_length(len(body)) + body
    return parse_subject_public_key_info(spki_der)


def _encode_length(length: int) -> bytes:
    if length < 0x80:
        return bytes([length])
    encoded = length.to_bytes((length.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(encoded)]) + encoded


def load_public_key(block_type: str, der: bytes) -> Optional[PublicKey]:
    if block_type == "PUBLIC KEY":
        return parse_subject_public_key_info(der)
    if block_type == "RSA PUBLIC KEY":
        return parse_pkcs1_public_key(der)
    if block_type == "CERTIFICATE":
        return parse_certificate_public_key(der)
    return None


def verify_rsa_sha256(key: PublicKey, data: bytes, signature: bytes) -> bool:
    """EMSA-PKCS1-v1_5 verification of a SHA-256 signature."""

    n, e = key
    k = (n.bit_length() + 7) // 8
    if len(signature) != k:
        return False
    s = int.from_bytes(signature, "big")
    if s >= n:
        return False
    em = pow(s, e, n).to_bytes(k, "big")
    digest = hashlib.sha256(data).digest()
    expected = _SHA256_DIGEST_INFO + digest
    padding_len = k - 3 - len(expected)
    if padding_len < 8:
        return False
    reference = b"\x00\x01" + b"\xff" * padding_len + b"\x00" + expected
    return em == reference


@dataclass
class ModuleSignatureVerifier:
    """Verifies detached signatures against a directory of trusted keys."""

    trust_store: Path
    require_signature: bool = True
    _keys: List[PublicKey] = field(default_factory=list, init=False, repr=False)

    def __post_init__(self) -> None:
        self._load_trust_store()

    def _load_trust_store(self) -> None:
        store = Path(self.trust_store)
        if not store.exists():
            raise TrustStoreError(f"Trust store does not exist: {store}")
        candidates: Iterable[Path]
        if store.is_file():
            candidates = [store]
        else:
            candidates = sorted(
                p
                for p in store.iterdir()
                if p.suffix.lower() in {".pem", ".crt", ".cer", ".pub"}
            )
        for path in candidates:
            try:
                payload = path.read_bytes()
            except OSError as exc:
                raise TrustStoreError(f"Unreadable trust-store entry: {path}") from exc
            for label, der in iter_pem_blocks(payload):
                try:
                    key = load_public_key(label, der)
                except DerError as exc:
                    raise TrustStoreError(
                        f"Malformed key material in {path}: {exc}"
                    ) from exc
                if key is not None:
                    self._keys.append(key)
        if not self._keys:
            raise TrustStoreError(f"No usable RSA keys in trust store {store}")

    @property
    def key_count(self) -> int:
        return len(self._keys)

    def verify(self, data: bytes, signature: bytes) -> None:
        """Raise unless ``signature`` matches ``data`` under a trusted key."""

        for key in self._keys:
            if verify_rsa_sha256(key, data, signature):
                return
        raise InvalidSignatureError("Signature does not match any trusted key")

    def verify_file(self, module_path: Path, extension: str = ".sig") -> None:
        module_path = Path(module_path)
        sig_path = signature_path_for(module_path, extension)
        if not sig_path.exists():
            raise MissingSignatureError(f"No signature found for {module_path}")
        self.verify(module_path.read_bytes(), sig_path.read_bytes())


def signature_path_for(module_path: Path, extension: str = ".sig") -> Path:
    """Sidecar signature path (``core/signing.py:302-310``)."""

    module_path = Path(module_path)
    return module_path.with_name(module_path.name + extension)


__all__ = [
    "SignatureVerificationError",
    "TrustStoreError",
    "MissingSignatureError",
    "InvalidSignatureError",
    "ModuleSignatureVerifier",
    "signature_path_for",
    "verify_rsa_sha256",
    "iter_pem_blocks",
    "load_public_key",
]
