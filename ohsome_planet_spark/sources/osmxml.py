"""OSM XML sources (SURVEY.md S9-S11): full `.osm` documents, osmChange
(`.osc` / `.osc.gz`) diffs, and changeset dump parsing.

The reference uses StAX parsers (``osm-xml/.../OscParser.java:27-317``,
``OSMXmlEntityReader.java``, ``ChangesetXmlReader.java``); here the parse is
``xml.etree`` inside ``mapInPandas`` — diffs are tiny (one minute of planet
edits ≈ a few MB), so the Spark side is one narrow stage per file with no
shuffle. Changeset dumps (`.osm.bz2`, multi-stream) split on bz2 block
boundaries for parallel decompression like the reference's PBZ2Reader.
"""

from __future__ import annotations

import bz2
import gzip
import os
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .pbf import ENTITY_ROW_SCHEMA

_GZ_MAGIC = b"\x1f\x8b"


def _read_maybe_compressed(path: str) -> bytes:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == _GZ_MAGIC:
        return gzip.decompress(data)
    if data[:3] == b"BZh":
        return bz2.decompress(data)
    return data


def _entity_from_elem(elem: ET.Element, visible: bool) -> dict:
    tags = {t.get("k"): t.get("v") for t in elem.findall("tag")}
    base = {
        "osm_type": elem.tag,
        "osm_id": int(elem.get("id")),
        "version": int(elem.get("version", "1")),
        "ts": pd.Timestamp(elem.get("timestamp")).tz_localize(None)
        if elem.get("timestamp")
        else pd.Timestamp(0),
        "changeset": int(elem.get("changeset", "0")),
        "user_id": int(elem.get("uid", "0")),
        "user_name": elem.get("user", ""),
        # explicit visible attribute wins over the osc operation default
        "visible": elem.get("visible", str(visible).lower()) == "true",
        "tags": tags,
        "lon": float(elem.get("lon")) if elem.get("lon") else None,
        "lat": float(elem.get("lat")) if elem.get("lat") else None,
        "refs": None,
        "members": None,
    }
    if elem.tag == "way":
        base["refs"] = [int(nd.get("ref")) for nd in elem.findall("nd")]
    elif elem.tag == "relation":
        base["members"] = [
            {"type": m.get("type"), "id": int(m.get("ref")), "role": m.get("role", "")}
            for m in elem.findall("member")
        ]
    return base


def parse_osc_bytes(data: bytes) -> list[dict]:
    """osmChange XML → entity dicts; <delete> sets visible=false
    (``OscParser.java``: create/modify → visible, delete → invisible)."""
    root = ET.fromstring(data)
    out = []
    for op in root:
        if op.tag not in ("create", "modify", "delete"):
            continue
        visible = op.tag != "delete"
        for elem in op:
            if elem.tag in ("node", "way", "relation"):
                out.append(_entity_from_elem(elem, visible))
    return out


def encode_osc(rows: list[dict]) -> bytes:
    """Entity dicts → osmChange XML bytes — the inverse of
    :func:`parse_osc_bytes` (fixture/round-trip writer: visible rows go
    under ``<modify>``, invisible under ``<delete>``, mirroring
    ``OscParser.java``'s operation semantics)."""
    root = ET.Element("osmChange", version="0.6")
    modify = ET.SubElement(root, "modify")
    delete = ET.SubElement(root, "delete")
    for r in rows:
        visible = bool(r.get("visible", True))
        elem = ET.SubElement(modify if visible else delete, r["osm_type"])
        elem.set("id", str(r["osm_id"]))
        elem.set("version", str(r["version"]))
        elem.set("timestamp", r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ"))
        elem.set("changeset", str(r["changeset"]))
        elem.set("uid", str(r["user_id"]))
        elem.set("user", r.get("user_name") or "")
        elem.set("visible", "true" if visible else "false")
        if r["osm_type"] == "node" and r.get("lon") is not None:
            # repr: shortest round-trip float text (coordinates survive
            # encode -> parse bit-exactly)
            elem.set("lon", repr(float(r["lon"])))
            elem.set("lat", repr(float(r["lat"])))
        for k, v in (r.get("tags") or {}).items():
            ET.SubElement(elem, "tag", k=k, v=v)
        for ref in r.get("refs") or []:
            ET.SubElement(elem, "nd", ref=str(ref))
        for m in r.get("members") or []:
            ET.SubElement(
                elem, "member",
                type=m["type"], ref=str(m["id"]), role=m.get("role") or "",
            )
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def parse_osm_bytes(data: bytes) -> list[dict]:
    """Full .osm document → entity dicts."""
    root = ET.fromstring(data)
    return [
        _entity_from_elem(elem, True)
        for elem in root
        if elem.tag in ("node", "way", "relation")
    ]


_COLUMNS = [
    "osm_type",
    "osm_id",
    "version",
    "ts",
    "changeset",
    "user_id",
    "user_name",
    "visible",
    "tags",
    "lon",
    "lat",
    "refs",
    "members",
]


def read_osc(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """One or many .osc(.gz) files → entity DataFrame (S10)."""
    from ..session import ship_package

    ship_package(spark)
    paths = [paths] if isinstance(paths, str) else list(paths)
    index = spark.createDataFrame([(p,) for p in paths], "path string")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                rows.extend(parse_osc_bytes(_read_maybe_compressed(p)))
            yield pd.DataFrame(rows, columns=_COLUMNS)

    return index.repartition(max(1, len(paths))).mapInPandas(parse, ENTITY_ROW_SCHEMA)


def read_osm_xml(spark: SparkSession, path: str) -> DataFrame:
    """Full .osm XML document → entity DataFrame (S11, test harness)."""
    from ..session import ship_package

    ship_package(spark)
    rows = parse_osm_bytes(_read_maybe_compressed(path))
    pdf = pd.DataFrame(rows, columns=_COLUMNS)
    return spark.createDataFrame(pdf).selectExpr(
        *[f"cast({c} as {t}) as {c}" for c, t in _schema_pairs()]
    )


def _schema_pairs():
    pairs = []
    for part in ENTITY_ROW_SCHEMA.split(","):
        name, typ = part.strip().split(" ", 1)
        pairs.append((name, typ))
    return pairs


# --- changeset dumps (S9) ----------------------------------------------------

CHANGESET_ROW_SCHEMA = (
    "id bigint, created_at timestamp, closed_at timestamp,"
    " tags map<string,string>, user_id bigint, user_name string, open boolean,"
    " min_lon double, min_lat double, max_lon double, max_lat double,"
    " num_changes int, comments_count int"
)

_BZ2_STREAM_MAGIC = b"BZh91AY&SY"


def split_bz2_streams(data: bytes) -> list[bytes]:
    """Split a multi-stream bz2 file on the stream magic so streams
    decompress in parallel (``PBZ2Reader.java:24-150``)."""
    offsets = []
    start = 0
    while True:
        idx = data.find(_BZ2_STREAM_MAGIC, start)
        if idx < 0:
            break
        offsets.append(idx)
        start = idx + 1
    if not offsets:
        return []
    offsets.append(len(data))
    return [data[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)]


def parse_changesets_bytes(data: bytes) -> list[dict]:
    """<changeset> elements → rows (``ChangesetXmlReader.java``)."""
    root = ET.fromstring(data)
    out = []
    for cs in root.iter("changeset"):
        out.append(
            {
                "id": int(cs.get("id")),
                "created_at": pd.Timestamp(cs.get("created_at")).tz_localize(None)
                if cs.get("created_at")
                else None,
                "closed_at": pd.Timestamp(cs.get("closed_at")).tz_localize(None)
                if cs.get("closed_at")
                else None,
                "tags": {t.get("k"): t.get("v") for t in cs.findall("tag")},
                "user_id": int(cs.get("uid", "0")),
                "user_name": cs.get("user", ""),
                "open": cs.get("open", "false") == "true",
                "min_lon": float(cs.get("min_lon")) if cs.get("min_lon") else None,
                "min_lat": float(cs.get("min_lat")) if cs.get("min_lat") else None,
                "max_lon": float(cs.get("max_lon")) if cs.get("max_lon") else None,
                "max_lat": float(cs.get("max_lat")) if cs.get("max_lat") else None,
                # ChangesetXmlReader.java:65-66
                "num_changes": int(cs.get("num_changes", "0")),
                "comments_count": int(cs.get("comments_count", "0")),
            }
        )
    return out


def read_changesets(spark: SparkSession, path: str) -> DataFrame:
    """Changeset dump (.osm or multi-stream .osm.bz2) → DataFrame with
    derived hashtags/editor applied at ingest (A10/A11)."""
    from pyspark.sql import functions as F

    from ..functions.hashtags import editor_expr, hashtags_from_tags_expr
    from ..session import ship_package

    ship_package(spark)
    with open(path, "rb") as f:
        head = f.read(3)
    if head == b"BZh" and os.path.getsize(path) > 64 * 1024 * 1024:
        # large multi-stream dump: ship stream ranges to workers
        with open(path, "rb") as f:
            data = f.read()
        streams = split_bz2_streams(data)
        index = spark.createDataFrame(
            [(i,) for i in range(len(streams))], "stream_idx int"
        )
        bstreams = spark.sparkContext.broadcast(streams)

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for i in pdf["stream_idx"]:
                    rows.extend(parse_changesets_bytes(bz2.decompress(bstreams.value[i])))
                yield pd.DataFrame(rows)

        df = index.mapInPandas(parse, CHANGESET_ROW_SCHEMA)
    else:
        rows = parse_changesets_bytes(_read_maybe_compressed(path))
        pdf = pd.DataFrame(rows)
        df = spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame([], CHANGESET_ROW_SCHEMA)

    return df.withColumn("hashtags", hashtags_from_tags_expr(F.col("tags"))).withColumn(
        "editor", editor_expr(F.col("tags"))
    )
