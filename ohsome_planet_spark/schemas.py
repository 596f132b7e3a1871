"""Spark schemas for the OSM entity-history inputs and the contributions
output.

Mirrors the reference's data model:

- input entities: sealed interface ``OSMEntity`` with node/way/relation
  records (``osm-types/src/main/java/org/heigit/ohsome/osm/OSMEntity.java:39-109``);
- output: the 29-column ``Contrib`` Avro record
  (``ohsome-contributions/src/main/avro/contrib.avsc:1-387``,
  ``docs/data_description.md:5-55``).

The ``valid_to`` sentinel for latest/deleted rows is 2222-01-01T00:00:00Z
(``ContributionsAvroConverter.java:22``).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import types as T

# valid_to sentinel for open-ended (latest / deleted) contributions.
VALID_TO_SENTINEL = _dt.datetime(2222, 1, 1, 0, 0, 0)
VALID_TO_SENTINEL_STR = "2222-01-01 00:00:00"

OSM_NODE, OSM_WAY, OSM_RELATION = "node", "way", "relation"

_COMMON_ENTITY_FIELDS = [
    T.StructField("osm_id", T.LongType(), False),
    T.StructField("version", T.IntegerType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("changeset", T.LongType(), True),
    # bigint: matches ENTITY_ROW_SCHEMA (sources/pbf.py) — uid > int32
    # occurs on real wire input, and mixed-width parquet histories fail
    # the vectorized reader with PARQUET_COLUMN_DATA_TYPE_MISMATCH
    T.StructField("user_id", T.LongType(), True),
    T.StructField("user_name", T.StringType(), True),
    T.StructField("visible", T.BooleanType(), False),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
]

NODE_SCHEMA = T.StructType(
    _COMMON_ENTITY_FIELDS
    + [
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
    ]
)

WAY_SCHEMA = T.StructType(
    _COMMON_ENTITY_FIELDS
    + [
        T.StructField("refs", T.ArrayType(T.LongType()), True),
    ]
)

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("role", T.StringType(), True),
    ]
)

RELATION_SCHEMA = T.StructType(
    _COMMON_ENTITY_FIELDS
    + [
        T.StructField("members", T.ArrayType(MEMBER_SCHEMA), True),
    ]
)

CHANGESET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("closed_at", T.TimestampType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("hashtags", T.ArrayType(T.StringType()), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("user_name", T.StringType(), True),
        T.StructField("open", T.BooleanType(), True),
        T.StructField("min_lon", T.DoubleType(), True),
        T.StructField("min_lat", T.DoubleType(), True),
        T.StructField("max_lon", T.DoubleType(), True),
        T.StructField("max_lat", T.DoubleType(), True),
    ]
)

# --- output -----------------------------------------------------------------

USER_STRUCT = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)

CHANGESET_STRUCT = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("closed_at", T.TimestampType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("hashtags", T.ArrayType(T.StringType()), True),
        T.StructField("editor", T.StringType(), True),
    ]
)

BBOX_STRUCT = T.StructType(
    [
        T.StructField("xmin", T.DoubleType(), True),
        T.StructField("ymin", T.DoubleType(), True),
        T.StructField("xmax", T.DoubleType(), True),
        T.StructField("ymax", T.DoubleType(), True),
    ]
)

CENTROID_STRUCT = T.StructType(
    [
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
    ]
)

XZCODE_STRUCT = T.StructType(
    [
        T.StructField("level", T.IntegerType(), True),
        T.StructField("code", T.LongType(), True),
    ]
)

CONTRIB_MEMBER_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("id", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("geometry_type", T.StringType(), True),
        T.StructField("geometry", T.BinaryType(), True),
    ]
)

CONTRIB_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType(), False),
        T.StructField("valid_from", T.TimestampType(), False),
        T.StructField("valid_to", T.TimestampType(), False),
        T.StructField("osm_type", T.StringType(), False),
        T.StructField("osm_id", T.LongType(), False),
        T.StructField("osm_version", T.IntegerType(), False),
        T.StructField("osm_minor_version", T.IntegerType(), False),
        T.StructField("osm_edits", T.IntegerType(), False),
        T.StructField("osm_last_edit", T.TimestampType(), True),
        T.StructField("user", USER_STRUCT, True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("tags_before", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("changeset", CHANGESET_STRUCT, True),
        T.StructField("bbox", BBOX_STRUCT, True),
        T.StructField("centroid", CENTROID_STRUCT, True),
        T.StructField("xzcode", XZCODE_STRUCT, True),
        T.StructField("geometry_type", T.StringType(), True),
        T.StructField("geometry", T.BinaryType(), True),
        T.StructField("area", T.DoubleType(), True),
        T.StructField("area_delta", T.DoubleType(), True),
        T.StructField("length", T.DoubleType(), True),
        T.StructField("length_delta", T.DoubleType(), True),
        T.StructField("contrib_type", T.StringType(), True),
        T.StructField("refs_count", T.IntegerType(), True),
        T.StructField("refs", T.ArrayType(T.LongType()), True),
        T.StructField("members_count", T.IntegerType(), True),
        T.StructField("members", T.ArrayType(CONTRIB_MEMBER_STRUCT), True),
        T.StructField("countries", T.ArrayType(T.StringType()), True),
        T.StructField("build_time", T.LongType(), True),
    ]
)

STATUS_LATEST = "latest"
STATUS_HISTORY = "history"
STATUS_DELETED = "deleted"
STATUS_INVALID = "invalid"

CONTRIB_CREATION = "CREATION"
CONTRIB_DELETION = "DELETION"
CONTRIB_TAG = "TAG"
CONTRIB_GEOMETRY = "GEOMETRY"
CONTRIB_TAG_GEOMETRY = "TAG_GEOMETRY"
