"""JSONL (newline-delimited JSON) source/sink — the interchange format
training corpora actually ship in (one JSON object per line, usually
gzip-compressed). Both directions are fully native:

- write: ``to_json(struct(*))`` → ``text`` sink with gzip codec — stays
  JVM-side, one pass, any column set;
- read: ``spark.read.json`` with an explicit schema (never schema
  inference at 100 TB — a second full scan) and ``mode=FAILFAST`` by
  default so corrupt lines surface instead of becoming silent nulls;
  ``permissive=True`` switches to quarantining bad lines into
  ``_corrupt_record`` (the dirty-crawl setting).

Round-trip fidelity notes (documented, tested): JSON has no int/long
distinction (both round-trip via the explicit schema), map keys stay
strings, binary columns are not JSON-representable (reject them with a
clear error instead of silently base64-ing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructType


def write_jsonl(
    df: DataFrame,
    path: str,
    gzip: bool = True,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as JSONL (optionally gzip-member-per-file)."""
    for f in df.schema.fields:
        if isinstance(f.dataType, BinaryType):
            raise ValueError(
                f"column {f.name!r} is binary — JSON cannot carry raw bytes; "
                "hex/base64-encode it explicitly first"
            )
    out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    if n_files:
        out = out.repartition(n_files)
    writer = out.write.mode("overwrite")
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.text(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    permissive: bool = False,
) -> DataFrame:
    """Read JSONL written by :func:`write_jsonl` (or any NDJSON corpus).
    ``schema`` is required — inference costs a full extra scan at 100 TB.

    With ``permissive=True`` the result carries one EXTRA column,
    ``_corrupt_record string``, holding the raw line for rows that failed
    to parse (all data columns null on those rows). Spark only populates
    the corrupt-record column when it is present in the explicit schema,
    so it is appended here — without it corrupt lines would silently
    become all-null rows instead of being quarantined.
    """
    if permissive:
        st = (
            StructType.fromDDL(schema) if isinstance(schema, str) else schema
        )
        if "_corrupt_record" not in st.fieldNames():
            # copy — StructType.add mutates in place, and the caller's
            # schema object must not grow a column behind their back
            st = StructType(list(st.fields)).add("_corrupt_record", "string")
        reader = (
            spark.read.schema(st)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
        )
    else:
        reader = spark.read.schema(schema).option("mode", "FAILFAST")
    return reader.json(path)
