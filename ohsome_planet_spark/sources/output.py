"""Output-location handling (S15): local paths and object stores.

The reference resolves ``s3://bucket/path`` outputs through a MinIO
client configured from the ``S3_ENDPOINT`` / ``S3_KEY_ID`` / ``S3_SECRET``
/ ``S3_REGION`` environment (``S3OutputLocationProvider.java:23-56``) and
probes read/write permission before running. The Spark-idiomatic analogue
delegates the transport to Hadoop ``s3a://`` — the committer, retries and
multipart upload come for free — so this module's job is the same
*configuration* surface: map the reference's env contract onto the
``fs.s3a.*`` Hadoop settings and normalize the scheme.

Any Hadoop-resolvable scheme works (``s3a://``, ``viewfs://``, ``hdfs://``,
…): the GeoParquet footer post-pass routes through the Hadoop FileSystem
API when the output is not local (see ``geoparquet._attach_geo_metadata``).
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

# same env names as the reference (S3OutputLocationProvider.java:23-27)
S3_ENDPOINT = "S3_ENDPOINT"
S3_KEY_ID = "S3_KEY_ID"
S3_SECRET = "S3_SECRET"
S3_REGION = "S3_REGION"


def is_local_path(path: str) -> bool:
    scheme = urlparse(path).scheme
    # single letters are Windows drive letters, not schemes
    return scheme in ("", "file") or len(scheme) == 1


def resolve_output_location(spark, path: str) -> str:
    """Normalize an output path and apply object-store credentials.

    ``s3://bucket/p`` → ``s3a://bucket/p`` with the reference's S3 env
    contract mapped onto the Hadoop conf: endpoint (MinIO-style custom
    endpoints imply path-style access), key id, secret, region. Settings
    are only written when the env var is present, so an already-configured
    cluster (IAM roles, core-site.xml) is left untouched. Local paths and
    other schemes pass through unchanged."""
    if path.startswith("s3://"):
        path = "s3a://" + path[len("s3://"):]
    if path.startswith("s3a://"):
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        endpoint = os.environ.get(S3_ENDPOINT)
        if endpoint:
            conf.set("fs.s3a.endpoint", endpoint)
            # custom endpoints (MinIO) address buckets by path, not vhost
            conf.set("fs.s3a.path.style.access", "true")
        key = os.environ.get(S3_KEY_ID)
        if key:
            conf.set("fs.s3a.access.key", key)
        secret = os.environ.get(S3_SECRET)
        if secret:
            conf.set("fs.s3a.secret.key", secret)
        region = os.environ.get(S3_REGION)
        if region:
            conf.set("fs.s3a.endpoint.region", region)
    return path


def probe_output_location(spark, path: str) -> None:
    """The reference's read/write permission probe
    (``S3OutputLocationProvider.checkReadWritePermissions``): write a probe
    object under the output prefix, read it back, delete it. Raises
    ``IOError`` if the round-trip fails — before any real work runs."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path + "/probe/probe.txt")
    fs = jpath.getFileSystem(conf)
    data = b"ohsome-planet"
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    stream = fs.open(jpath)
    try:
        # py4j passes arrays by value — read() the probe byte-by-byte
        got = bytearray()
        while len(got) < len(data):
            b = stream.read()
            if b < 0:
                break
            got.append(b)
    finally:
        stream.close()
    fs.delete(jpath, False)
    if bytes(got) != data:
        raise IOError(
            f"probe read-back mismatch at {path}: {bytes(got)!r}"
        )
