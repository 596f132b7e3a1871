"""S15 output-location tests: the s3 config contract and an end-to-end
write_contributions through a NON-local Hadoop scheme (viewfs:// mounted
onto a temp dir) asserting layout + geo metadata survive."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from ohsome_planet_spark.sources.output import (
    is_local_path,
    probe_output_location,
    resolve_output_location,
)


def test_is_local_path():
    assert is_local_path("/tmp/x")
    assert is_local_path("file:///tmp/x")
    assert is_local_path("C:/tmp/x")
    assert not is_local_path("s3a://bucket/x")
    assert not is_local_path("viewfs://cluster/x")


def test_resolve_s3_env_contract(spark, monkeypatch):
    """s3:// -> s3a:// rewrite + the reference's env names
    (S3OutputLocationProvider.java:23-27) land on fs.s3a.*."""
    monkeypatch.setenv("S3_ENDPOINT", "http://localhost:9000")
    monkeypatch.setenv("S3_KEY_ID", "testkey")
    monkeypatch.setenv("S3_SECRET", "testsecret")
    monkeypatch.setenv("S3_REGION", "eu-central-1")
    out = resolve_output_location(spark, "s3://mybucket/out/contribs")
    assert out == "s3a://mybucket/out/contribs"
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert conf.get("fs.s3a.access.key") == "testkey"
    assert conf.get("fs.s3a.secret.key") == "testsecret"
    assert conf.get("fs.s3a.endpoint.region") == "eu-central-1"
    assert conf.get("fs.s3a.path.style.access") == "true"


def test_resolve_local_passthrough(spark):
    assert resolve_output_location(spark, "/tmp/out") == "/tmp/out"


@pytest.fixture()
def viewfs_root(spark, tmp_path):
    """Mount viewfs://<unique>/out onto a local temp dir — a real non-file
    scheme resolving through the Hadoop FileSystem layer. The authority is
    unique per test because Hadoop caches FileSystem instances (and thus
    mount tables) per (scheme, authority)."""
    import uuid

    cluster = f"opstest{uuid.uuid4().hex[:8]}"
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    conf.set(
        f"fs.viewfs.mounttable.{cluster}.link./out", f"file://{tmp_path}/mnt"
    )
    os.makedirs(f"{tmp_path}/mnt", exist_ok=True)
    return tmp_path, f"viewfs://{cluster}/out"


def test_probe_output_location_roundtrip(spark, viewfs_root):
    _tmp, root = viewfs_root
    probe_output_location(spark, f"{root}/probe_area")
    # probe cleans up after itself
    leftovers = glob.glob(f"{_tmp}/mnt/probe_area/probe/*")
    assert leftovers == []


def test_write_contributions_nonlocal_scheme(spark, viewfs_root):
    """The full S15 seam: write_contributions to viewfs://, then verify
    partition layout AND per-file geo footer metadata survived the
    Hadoop-FS footer post-pass."""
    from ohsome_planet_spark.sources.geoparquet import (
        VALID_TO_SENTINEL,
        read_geo_metadata,
        write_contributions,
    )

    tmp, root = viewfs_root
    df = spark.createDataFrame(
        [
            (1, "node", "Point", "2020-01-01 00:00:00", VALID_TO_SENTINEL,
             {"xmin": 1.0, "ymin": 2.0, "xmax": 1.0, "ymax": 2.0}),
            (2, "node", "Point", "2020-01-01 00:00:00", "2021-01-01 00:00:00",
             {"xmin": 5.0, "ymin": 6.0, "xmax": 5.0, "ymax": 6.0}),
        ],
        "osm_id long, osm_type string, geometry_type string,"
        " valid_from_s string, valid_to_s string,"
        " bbox struct<xmin:double,ymin:double,xmax:double,ymax:double>",
    ).select(
        "osm_id", "osm_type", "geometry_type",
        F.col("valid_from_s").cast("timestamp").alias("valid_from"),
        F.col("valid_to_s").cast("timestamp").alias("valid_to"),
        "bbox",
    )
    out = f"{root}/contribs"
    write_contributions(df, out, bloom_filter_columns=("osm_id",))
    # layout: hive partitions by layer/osm_type, visible through the mount
    files = sorted(
        glob.glob(f"{tmp}/mnt/contribs/layer=*/osm_type=*/*.parquet")
    )
    assert files, "no parquet files written through viewfs"
    layers = {f.split("layer=")[1].split("/")[0] for f in files}
    assert layers == {"latest", "history"}
    # .crc sidecars through a checksummed scheme are rewritten on
    # copy-back (NOT stale) — proven below: the spark.read round-trip
    # would fail on a checksum mismatch if the footer rewrite had left
    # the sidecar out of sync
    # per-file geo metadata attached THROUGH the non-local scheme
    for f in files:
        geo = read_geo_metadata(f)
        assert geo is not None
        col = geo["columns"][geo["primary_column"]]
        assert col["bbox"] is not None
    # the dataset reads back through the scheme as well
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert {r.layer for r in back.select("layer").collect()} == {
        "latest", "history",
    }
