"""Column encryption — port of the reference's encrypted-chunk filter
(gridded_etl_tools/utils/encryption.py:31-134: XChaCha20-Poly1305 over Zarr
chunks, SHA3-256 key registry; wired in at utils/metadata.py:711-717).

Spark mapping: the Zarr "encrypt every chunk with an AEAD, stash the nonce
with the ciphertext" pattern becomes "encrypt a column into nonce‖ciphertext
binary via Arrow-batched pandas UDFs". The key registry ports directly: keys
are registered under their SHA3-256 hash and looked up by hash at decrypt
time (encryption.py:59-99), so data carries only the key *hash*.

Cipher note: the reference uses XChaCha20 (24-byte nonce) via numcodecs;
the `cryptography` library exposes IETF ChaCha20-Poly1305 (12-byte nonce),
which is the same AEAD family — random 12-byte nonces are safe at the
per-row volumes here. The import is gated so environments without
`cryptography` get a clear error only when the codec is actually used.

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

    nonce, ct = blob[:NONCE_BYTES], blob[NONCE_BYTES:]
    try:
        return ChaCha20Poly1305(key).decrypt(nonce, ct, None)
    except InvalidTag as e:
        raise EncryptionError("decryption failed: wrong key or corrupted data") from e


def encrypt_column(df: DataFrame, col: str, kh: str, out_col: str | None = None) -> DataFrame:
    """Encrypt a binary/string column to nonce‖ciphertext under the
    registered key ``kh``. Arrow-batched; the key hash (never the key)
    should be stored as a table property for parity with the reference's
    serialized codec metadata (encryption.py:101-134)."""
    key = get_key(kh)
    out = out_col or col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [
                None
                if v is None
                else encrypt_bytes(v if isinstance(v, bytes) else str(v).encode(), key)
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
    df: DataFrame, col: str, kh: str, out_col: str | None = None, as_string: bool = False
) -> DataFrame:
    key = get_key(kh)
    out = out_col or col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [None if v is None else decrypt_bytes(bytes(v), key) for v in pdf[col]]
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
