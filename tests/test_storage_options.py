"""storage_options / remote-URI surface — the tiledb_config sysvar analog
(mytile/mytile-sysvars.cc:61-66) and the reference's accepted URI schemes
(ha_mytile.cc:1178-1182), unit-tested against the local filesystem and
the session Hadoop configuration (no object store in this container)."""

from __future__ import annotations

import json
import os

import pytest

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable, open_uri
from tiledb_mariadb_spark.sources.storage import (
    is_remote,
    parse_uri,
    persistable_options,
    to_hadoop_options,
)


def test_uri_parsing_and_scheme_detection():
    assert parse_uri("/tmp/x") == ("", "/tmp/x")
    assert parse_uri("file:///tmp/x") == ("", "/tmp/x")
    assert parse_uri("s3://bucket/arr") == ("s3", "s3://bucket/arr")
    for u in ("s3://b/a", "azure://c/a", "gcs://b/a", "tiledb://ns/a"):
        assert is_remote(u)
    assert not is_remote("/tmp/x") and not is_remote("file:///tmp/x")


def test_tiledb_config_key_translation():
    h = to_hadoop_options(
        {
            "vfs.s3.aws_access_key_id": "AK",
            "vfs.s3.aws_secret_access_key": "SK",
            "vfs.s3.region": "us-east-1",
            "vfs.s3.endpoint_override": "http://minio:9000",
            "vfs.s3.scheme": "https",
            "vfs.s3.use_virtual_addressing": "false",
            "fs.s3a.fast.upload": "true",
            "spark.hadoop.fs.s3a.paging.maximum": "100",
        }
    )
    assert h["fs.s3a.access.key"] == "AK"
    assert h["fs.s3a.secret.key"] == "SK"
    assert h["fs.s3a.endpoint.region"] == "us-east-1"
    assert h["fs.s3a.endpoint"] == "http://minio:9000"
    assert h["fs.s3a.connection.ssl.enabled"] == "true"
    assert h["fs.s3a.path.style.access"] == "true"  # inverted
    assert h["fs.s3a.fast.upload"] == "true"
    assert h["fs.s3a.paging.maximum"] == "100"
    with pytest.raises(ValueError, match="unknown storage option"):
        to_hadoop_options({"vfs.s3.not_a_real_key": "x"})


def test_secrets_never_persisted(spark, tmp_path):
    uri = str(tmp_path / "so_t")
    t = TileTable.create(
        spark,
        uri,
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        storage_options={
            "vfs.s3.region": "eu-west-1",
            "vfs.s3.aws_secret_access_key": "SHOULD_NOT_PERSIST",
            "vfs.s3.aws_session_token": "ALSO_NOT",
        },
        overwrite=True,
    )
    raw = json.load(open(os.path.join(uri, "_tile_schema.json")))
    persisted = raw["metadata"]["storage_options"]
    assert persisted == {"vfs.s3.region": "eu-west-1"}
    assert "SHOULD_NOT_PERSIST" not in json.dumps(raw)
    # applied map (runtime) DID include the secret
    assert t.storage_options["fs.s3a.secret.key"] == "SHOULD_NOT_PERSIST"


def test_options_reach_hadoop_conf_and_merge_on_reopen(spark, tmp_path):
    uri = str(tmp_path / "so_merge")
    TileTable.create(
        spark,
        uri,
        dimensions=[Dim("k", "int")],
        attributes=[Attr("v", "int")],
        storage_options={"vfs.s3.region": "ap-south-1"},
        overwrite=True,
    )
    t = TileTable(
        spark, uri,
        storage_options={"vfs.s3.aws_access_key_id": "RUNTIME_AK"},
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.endpoint.region") == "ap-south-1"  # persisted
    assert conf.get("fs.s3a.access.key") == "RUNTIME_AK"  # runtime
    t.write(spark.createDataFrame([(1, 10)], ["k", "v"]))
    assert t.read().count() == 1


def test_file_scheme_and_remote_rejection(spark, tmp_path):
    uri = str(tmp_path / "so_file")
    TileTable.create(
        spark, uri,
        dimensions=[Dim("k", "int")], attributes=[Attr("v", "int")],
        overwrite=True,
    ).write(spark.createDataFrame([(7, 70)], ["k", "v"]))
    # file:// URI resolves to the same table
    df = open_uri(spark, f"file://{uri}")
    assert df.collect()[0]["v"] == 70
    with pytest.raises(NotImplementedError, match="remote scheme s3://"):
        TileTable(spark, "s3://bucket/arr")
    assert persistable_options(None) == {}


def test_tiledb_rest_scheme_refuses_loudly():
    """tiledb:// (the REST/cloud scheme, ha_mytile.cc:1178-1182) names
    its own deployment gap — a REST client — distinctly from the
    object-store schemes (r8 verdict #6)."""
    import pytest

    from tiledb_mariadb_spark.sources.storage import require_local

    with pytest.raises(NotImplementedError, match="REST"):
        require_local("tiledb://ns/array")
    with pytest.raises(NotImplementedError, match="object-store"):
        require_local("s3://bucket/array")
    assert require_local("/tmp/x") == "/tmp/x"
    assert require_local("file:///tmp/x") == "/tmp/x"


def test_datasource_open_refuses_remote(spark):
    import pytest

    from tiledb_mariadb_spark.sources.spark_datasource import (
        TileDBNativeDataSource,
    )

    for uri, marker in (
        ("tiledb://ns/array", "REST"),
        ("s3://bucket/array", "object-store"),
    ):
        ds = TileDBNativeDataSource(options={"path": uri})
        with pytest.raises(NotImplementedError, match=marker):
            ds._uri()
