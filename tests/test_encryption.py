"""Encryption codec tests — parity with the reference's encrypted-Zarr
round-trip and wrong-key failure (tests/system/test_chirps_encryption.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.sources import encryption as enc


def test_key_registry_roundtrip():
    key = enc.generate_key()
    kh = enc.register_key(key)
    assert len(kh) == 64
    assert enc.get_key(kh) == key


def test_register_key_wrong_length():
    with pytest.raises(enc.EncryptionError, match="32 bytes"):
        enc.register_key(b"short")


def test_get_key_unregistered():
    with pytest.raises(enc.EncryptionError, match="no key registered"):
        enc.get_key("f" * 64)


def test_bytes_roundtrip_and_wrong_key():
    k1, k2 = enc.generate_key(), enc.generate_key()
    blob = enc.encrypt_bytes(b"precip chunk data", k1)
    assert blob[enc.NONCE_BYTES:] != b"precip chunk data"
    assert enc.decrypt_bytes(blob, k1) == b"precip chunk data"
    with pytest.raises(enc.EncryptionError, match="wrong key or corrupted"):
        enc.decrypt_bytes(blob, k2)


def test_column_roundtrip(spark):
    kh = enc.register_key(enc.generate_key())
    df = spark.createDataFrame(
        [(1, "sensitive a"), (2, "sensitive b"), (3, None)], "id long, payload string"
    )
    encrypted = enc.encrypt_column(df, "payload", kh)
    assert dict(encrypted.dtypes)["payload"] == "binary"
    # ciphertexts differ even for re-encryption of same value (fresh nonce)
    twice = enc.encrypt_column(df, "payload", kh).collect()
    once = encrypted.collect()
    assert once[0]["payload"] != twice[0]["payload"]

    back = enc.decrypt_column(encrypted, "payload", kh, as_string=True)
    got = {r["id"]: r["payload"] for r in back.collect()}
    assert got == {1: "sensitive a", 2: "sensitive b", 3: None}


def test_column_wrong_key_fails(spark):
    kh1 = enc.register_key(enc.generate_key())
    kh2 = enc.register_key(enc.generate_key())
    df = spark.createDataFrame([(1, "x")], "id long, payload string")
    encrypted = enc.encrypt_column(df, "payload", kh1)
    with pytest.raises(Exception, match="wrong key|corrupted"):
        enc.decrypt_column(encrypted, "payload", kh2, as_string=True).collect()


def test_store_compression_option(tmp_path, spark, desc, initial_df):
    """F14: codec choice reaches the files (zstd vs uncompressed sizes)."""
    from dataclasses import replace

    from zarr_climate_etl_ipfs_spark.sources.store import GridStore

    s1 = GridStore(tmp_path / "a", desc, spark, compression="zstd")
    s1.write_initial(initial_df)
    s2 = GridStore(
        tmp_path / "b", replace(desc, dataset_name="fake_obs_unc"), spark,
        compression="uncompressed",
    )
    s2.write_initial(initial_df)
    size = lambda p: sum(f.stat().st_size for f in p.rglob("*.parquet"))  # noqa: E731
    assert size(s1.data_path) < size(s2.data_path)
    assert s1.dataset().count() == s2.dataset().count() == 138 * 16
