"""Column encryption — port of the reference's encrypted-chunk filter
(gridded_etl_tools/utils/encryption.py:31-134: XChaCha20-Poly1305 over Zarr
chunks, SHA3-256 key registry; wired in at utils/metadata.py:711-717).

Spark mapping: the Zarr "encrypt every chunk with an AEAD, stash the nonce
with the ciphertext" pattern becomes "encrypt a column into nonce‖ciphertext
binary via Arrow-batched pandas UDFs". The key registry ports directly: keys
are registered under their SHA3-256 hash and looked up by hash at decrypt
time (encryption.py:59-99), so data carries only the key *hash*.

Cipher note: the reference uses XChaCha20 (24-byte nonce, PyCryptodome's
draft-irtf-cfrg-xchacha construction, blob = nonce‖tag‖ciphertext with AAD
b"dClimate-Zarr"). Two codecs are provided: the default IETF
ChaCha20-Poly1305 (12-byte nonce, nonce‖ct‖tag) and a CODEC-EXACT
XChaCha20 parity mode (``xencrypt_bytes``/``xdecrypt_bytes``, or
``codec="xchacha20"`` on the column ops) built from a pure-Python
HChaCha20 subkey derivation (validated against the draft's published test
vectors) in front of the same IETF primitive — a blob produced by the
reference's EncryptionFilter decrypts here and vice versa. The import is
gated so environments without `cryptography` get a clear error only when
the codec is actually used.

Compression (F14, metadata.py:803-818) needs no code: it is the parquet
writer codec option (GridStore passes ``compression=``).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - environment probe
    from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305

    _HAVE_CRYPTO = True
except ImportError:  # pragma: no cover
    _HAVE_CRYPTO = False

NONCE_BYTES = 12
_REGISTRY: dict[str, bytes] = {}


class EncryptionError(RuntimeError):
    pass


def key_hash(key: bytes) -> str:
    """SHA3-256 hex digest — the registry id (encryption.py:46-56)."""
    return hashlib.sha3_256(key).hexdigest()


def generate_key() -> bytes:
    return os.urandom(32)


def register_key(key: bytes) -> str:
    """Register a 32-byte key; returns its hash id (encryption.py:59-78)."""
    if len(key) != 32:
        raise EncryptionError(f"key must be 32 bytes, got {len(key)}")
    kh = key_hash(key)
    _REGISTRY[kh] = key
    return kh


def get_key(kh: str) -> bytes:
    try:
        return _REGISTRY[kh]
    except KeyError:
        raise EncryptionError(
            f"no key registered under hash {kh[:16]}…; call register_key first"
        ) from None


def encrypt_bytes(plaintext: bytes, key: bytes) -> bytes:
    if not _HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("column encryption requires the 'cryptography' package")
    nonce = os.urandom(NONCE_BYTES)
    return nonce + ChaCha20Poly1305(key).encrypt(nonce, plaintext, None)


def decrypt_bytes(blob: bytes, key: bytes) -> bytes:
    if not _HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("column encryption requires the 'cryptography' package")
    from cryptography.exceptions import InvalidTag

    if len(blob) < NONCE_BYTES:  # truncated foreign bytes: contract error,
        # not the AEAD library's raw "Nonce must be 12 bytes" ValueError
        raise EncryptionError(f"ciphertext shorter than the {NONCE_BYTES}-byte nonce")
    nonce, ct = blob[:NONCE_BYTES], blob[NONCE_BYTES:]
    try:
        return ChaCha20Poly1305(key).decrypt(nonce, ct, None)
    except InvalidTag as e:
        raise EncryptionError("decryption failed: wrong key or corrupted data") from e


# ---------------------------------------------------------------------------
# XChaCha20-Poly1305 parity codec (reference encryption.py:112-134 format)
# ---------------------------------------------------------------------------

XNONCE_BYTES = 24
#: AAD the reference's EncryptionFilter mixes into every chunk
#: (encryption.py:100 ``header``); required for cross-decryption.
REFERENCE_AAD = b"dClimate-Zarr"


def _hchacha20(key: bytes, nonce16: bytes) -> bytes:
    """HChaCha20 subkey derivation (draft-irtf-cfrg-xchacha §2.2): a
    ChaCha20 state seeded with (constants, key, 16-byte nonce), 10 double
    rounds, output words 0-3 and 12-15 WITHOUT the feed-forward addition.
    Pure Python — ~16 µs per call, one call per blob, dwarfed by the AEAD
    itself. Validated against the draft's §2.2.1 test vector."""
    import struct as _s

    st = (
        list(_s.unpack("<4I", b"expand 32-byte k"))
        + list(_s.unpack("<8I", key))
        + list(_s.unpack("<4I", nonce16))
    )

    def qr(a: int, b: int, c: int, d: int) -> None:
        st[a] = (st[a] + st[b]) & 0xFFFFFFFF
        st[d] ^= st[a]
        st[d] = ((st[d] << 16) | (st[d] >> 16)) & 0xFFFFFFFF
        st[c] = (st[c] + st[d]) & 0xFFFFFFFF
        st[b] ^= st[c]
        st[b] = ((st[b] << 12) | (st[b] >> 20)) & 0xFFFFFFFF
        st[a] = (st[a] + st[b]) & 0xFFFFFFFF
        st[d] ^= st[a]
        st[d] = ((st[d] << 8) | (st[d] >> 24)) & 0xFFFFFFFF
        st[c] = (st[c] + st[d]) & 0xFFFFFFFF
        st[b] ^= st[c]
        st[b] = ((st[b] << 7) | (st[b] >> 25)) & 0xFFFFFFFF

    for _ in range(10):
        qr(0, 4, 8, 12)
        qr(1, 5, 9, 13)
        qr(2, 6, 10, 14)
        qr(3, 7, 11, 15)
        qr(0, 5, 10, 15)
        qr(1, 6, 11, 12)
        qr(2, 7, 8, 13)
        qr(3, 4, 9, 14)
    return _s.pack("<8I", *(st[i] for i in (0, 1, 2, 3, 12, 13, 14, 15)))


def _xchacha_parts(key: bytes, nonce24: bytes) -> tuple[bytes, bytes]:
    """(subkey, 12-byte IETF nonce) per the draft: HChaCha20 over the first
    16 nonce bytes; IETF nonce = 4 zero bytes ‖ last 8 nonce bytes."""
    return _hchacha20(key, nonce24[:16]), b"\x00\x00\x00\x00" + nonce24[16:24]


def xencrypt_bytes(plaintext: bytes, key: bytes, aad: bytes = REFERENCE_AAD) -> bytes:
    """XChaCha20-Poly1305 in the REFERENCE's exact blob layout:
    nonce(24) ‖ tag(16) ‖ ciphertext (encryption.py:112-119) — a chunk
    written here decrypts in the reference's numcodecs filter and vice
    versa."""
    if not _HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("column encryption requires the 'cryptography' package")
    nonce = os.urandom(XNONCE_BYTES)
    subkey, ietf_nonce = _xchacha_parts(key, nonce)
    ct_tag = ChaCha20Poly1305(subkey).encrypt(ietf_nonce, plaintext, aad)
    return nonce + ct_tag[-16:] + ct_tag[:-16]


def xdecrypt_bytes(blob: bytes, key: bytes, aad: bytes = REFERENCE_AAD) -> bytes:
    """Decrypt the reference layout nonce(24) ‖ tag(16) ‖ ciphertext
    (encryption.py:121-134)."""
    if not _HAVE_CRYPTO:  # pragma: no cover
        raise NotImplementedError("column encryption requires the 'cryptography' package")
    from cryptography.exceptions import InvalidTag

    if len(blob) < 40:  # nonce+tag floor: contract error on truncation
        raise EncryptionError("ciphertext shorter than the 24+16-byte header")
    nonce, tag, ct = blob[:24], blob[24:40], blob[40:]
    subkey, ietf_nonce = _xchacha_parts(key, nonce)
    try:
        return ChaCha20Poly1305(subkey).decrypt(ietf_nonce, ct + tag, aad)
    except InvalidTag as e:
        raise EncryptionError("decryption failed: wrong key or corrupted data") from e


def encrypt_column(
    df: DataFrame, col: str, kh: str, out_col: str | None = None, codec: str = "chacha20"
) -> DataFrame:
    """Encrypt a binary/string column under the registered key ``kh``.
    Arrow-batched; the key hash (never the key) should be stored as a table
    property for parity with the reference's serialized codec metadata
    (encryption.py:101-134). ``codec="chacha20"`` (default) writes IETF
    nonce(12)‖ct‖tag; ``codec="xchacha20"`` writes the reference's exact
    nonce(24)‖tag‖ct layout with its AAD — readable by the reference's
    numcodecs EncryptionFilter."""
    key = get_key(kh)
    out = out_col or col
    enc = {"chacha20": encrypt_bytes, "xchacha20": xencrypt_bytes}[codec]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [
                None
                if v is None
                else enc(v if isinstance(v, bytes) else str(v).encode(), key)
                for v in pdf[col]
            ]
            pdf = pdf.copy()
            pdf[out] = vals
            yield pdf

    fields = [
        f"{f.name} {f.dataType.simpleString()}" if f.name != out else f"{out} binary"
        for f in df.schema.fields
    ]
    if out not in df.columns:
        fields.append(f"{out} binary")
    return df.mapInPandas(kernel, schema=", ".join(fields))


def decrypt_column(
    df: DataFrame,
    col: str,
    kh: str,
    out_col: str | None = None,
    as_string: bool = False,
    codec: str = "chacha20",
) -> DataFrame:
    key = get_key(kh)
    out = out_col or col
    dec = {"chacha20": decrypt_bytes, "xchacha20": xdecrypt_bytes}[codec]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [None if v is None else dec(bytes(v), key) for v in pdf[col]]
            if as_string:
                vals = [None if v is None else v.decode() for v in vals]
            pdf = pdf.copy()
            pdf[out] = vals
            yield pdf

    typ = "string" if as_string else "binary"
    fields = [
        f"{f.name} {f.dataType.simpleString()}" if f.name != out else f"{out} {typ}"
        for f in df.schema.fields
    ]
    if out not in df.columns:
        fields.append(f"{out} {typ}")
    return df.mapInPandas(kernel, schema=", ".join(fields))
