"""S3 scan path (SURVEY.md §2 A4): connector conf + path routing are unit
tested; the actual object-store read runs only when SPARK_GRAFT_S3_TEST
points at a reachable parquet URI (no S3 endpoint exists in this
container, mirroring the reference's disabled CREATE SECRET block,
src/duckdb-backend.ts:66-80)."""

import os

import pytest

from vscode_parquet_visualizer_spark.sources.registry import (
    configure_s3,
    normalize_path,
)


def test_normalize_path_s3_scheme():
    assert normalize_path("s3://bucket/key/file.parquet") == (
        "s3a://bucket/key/file.parquet"
    )
    assert normalize_path("/local/file.parquet") == "/local/file.parquet"


def test_configure_s3_sets_connector_conf(spark):
    configure_s3(
        spark,
        access_key="AK",
        secret_key="SK",
        region="us-east-2",
        endpoint="http://localhost:9000",
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AK"
    assert hconf.get("fs.s3a.secret.key") == "SK"
    assert hconf.get("fs.s3a.endpoint.region") == "us-east-2"
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert hconf.get("fs.s3a.impl") == "org.apache.hadoop.fs.s3a.S3AFileSystem"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_S3_TEST"),
    reason="set SPARK_GRAFT_S3_TEST=s3://bucket/file.parquet to run against "
    "a real object store (none in this container)",
)
def test_s3_read_end_to_end(spark):
    from vscode_parquet_visualizer_spark.sources import registry

    path = normalize_path(os.environ["SPARK_GRAFT_S3_TEST"])
    configure_s3(spark)
    df = registry.read(spark, path, "parquet")
    assert df.count() >= 0
