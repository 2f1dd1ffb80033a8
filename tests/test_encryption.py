"""Encryption at rest (mysql-test/mytile/t/encryption.test;
ha_mytile.cc:75 encryption_key option, 788-795 AES_256_GCM config):
create-with-key → write → read round-trip, wrong-key/no-key open fails,
fragments on disk are sealed (no parquet magic), key never persisted."""

from __future__ import annotations

import glob
import json
import os

import pytest

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable, open_uri
from tiledb_mariadb_spark.operators.encryption import (
    decrypt_bytes,
    encrypt_bytes,
    key_fingerprint,
    normalize_key,
)

KEY = "testtesttesttesttesttesttesttest"  # the reference test's 32-byte key
WRONG = "wrongwrongwrongwrongwrongwrong32"


def test_key_must_be_32_bytes():
    with pytest.raises(ValueError, match="32 bytes"):
        normalize_key("short")
    assert len(normalize_key(KEY)) == 32


def test_roundtrip_and_wrong_key_bytes():
    blob = encrypt_bytes(KEY, b"payload")
    assert decrypt_bytes(KEY, blob) == b"payload"
    assert b"payload" not in blob
    with pytest.raises(ValueError, match="wrong encryption key"):
        decrypt_bytes(WRONG, blob)


def _mk_encrypted(spark, tmp_path):
    tt = TileTable.create(
        spark,
        str(tmp_path / "enc"),
        dimensions=[Dim("dim1", "int", lower=0, upper=100, tile_extent=10)],
        attributes=[Attr("attr1", "int")],
        encryption_key=KEY,
    )
    tt.write(spark.createDataFrame([(1, 0), (2, 10)], "dim1 int, attr1 int"))
    return tt


def test_encrypted_table_roundtrip(spark, tmp_path):
    tt = _mk_encrypted(spark, tmp_path)
    got = {r["dim1"]: r["attr1"] for r in tt.read().collect()}
    assert got == {1: 0, 2: 10}
    # fragments are sealed: no cleartext parquet files, no parquet magic
    frags = glob.glob(f"{tt.uri}/data/__tile_v=1/*")
    data_files = [f for f in frags if not f.endswith((".crc", "_SUCCESS"))]
    assert data_files and all(f.endswith(".parquet.aes") for f in data_files)
    with open(data_files[0], "rb") as f:
        head = f.read(4)
    assert head != b"PAR1"
    # key material is never persisted in the sidecar
    sidecar = json.load(open(os.path.join(tt.uri, "_tile_schema.json")))
    assert KEY not in json.dumps(sidecar)
    assert sidecar["metadata"]["encryption"] == "AES_256_GCM"
    assert sidecar["metadata"]["encryption_key_check"] == key_fingerprint(KEY)


def test_wrong_key_and_no_key_fail(spark, tmp_path):
    tt = _mk_encrypted(spark, tmp_path)
    with pytest.raises(ValueError, match="wrong encryption key"):
        TileTable(spark, tt.uri, encryption_key=WRONG).read()
    with pytest.raises(ValueError, match="pass encryption_key"):
        TileTable(spark, tt.uri).read()
    with pytest.raises(ValueError, match="pass encryption_key"):
        TileTable(spark, tt.uri).write(
            tt.spark.createDataFrame([(3, 30)], "dim1 int, attr1 int")
        )


def test_encrypted_multi_version_lww_and_open_uri(spark, tmp_path):
    tt = _mk_encrypted(spark, tmp_path)
    tt.write(spark.createDataFrame([(2, 99)], "dim1 int, attr1 int"))
    got = {r["dim1"]: r["attr1"] for r in tt.read().collect()}
    assert got == {1: 0, 2: 99}  # last-writer-wins across sealed versions
    got2 = {
        r["dim1"]: r["attr1"]
        for r in open_uri(spark, tt.uri, encryption_key=KEY).collect()
    }
    assert got2 == got
    assert tt.est_records() == 3  # sidecar-count UB path (footers sealed)


def test_encrypted_show_create_redacts(spark, tmp_path):
    tt = _mk_encrypted(spark, tmp_path)
    sc = tt.show_create()
    assert "encryption='AES_256_GCM'" in sc
    assert KEY not in sc
