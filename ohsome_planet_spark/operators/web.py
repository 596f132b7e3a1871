"""Web-ingestion operators: WARC record walking and HTML main-text
extraction over binary/string columns — the Common Crawl front half of a
training-data pipeline (WARC → HTTP body → HTML → text), feeding the
quality/dedup/packing operators downstream.

Both kernels are single Arrow-batched ``mapInPandas`` passes: archive
bytes never shuffle, broadcast, or reach the driver (the same seam
contract as ``operators/multimodal.py``). At 100 TB the unit of
parallelism is the WARC member — independently decodable per record —
so files shard by byte range; here each row carries one archive."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_RECORD_SCHEMA = (
    "rec_idx int, warc_type string, target_uri string, content_type string,"
    " content_length bigint, payload binary"
)


def warc_records(df: DataFrame, warc_col: str = "warc") -> DataFrame:
    """Explode WARC archive bytes into one row per record (all original
    columns are kept; archives that fail to parse yield zero rows rather
    than killing the job — crawl data is dirty by construction)."""

    base_cols = [c for c in df.columns if c != warc_col]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.warc import WarcFormatError, parse_warc

        rec_cols = ("rec_idx", "warc_type", "target_uri", "content_type",
                    "content_length", "payload")
        for pdf in batches:
            acc: dict[str, list] = {c: [] for c in base_cols}
            acc.update({c: [] for c in rec_cols})
            for _, r in pdf.iterrows():
                try:
                    recs = parse_warc(bytes(r[warc_col]))
                except (WarcFormatError, ValueError, TypeError, EOFError):
                    continue
                for i, rec in enumerate(recs):
                    for c in base_cols:
                        acc[c].append(r[c])
                    acc["rec_idx"].append(i)
                    acc["warc_type"].append(rec["warc_type"])
                    acc["target_uri"].append(rec["target_uri"])
                    acc["content_type"].append(rec["content_type"])
                    acc["content_length"].append(rec["content_length"])
                    acc["payload"].append(rec["payload"])
            out = pd.DataFrame({c: acc[c] for c in base_cols + list(rec_cols)})
            out["rec_idx"] = pd.array(acc["rec_idx"], dtype="Int32")
            out["content_length"] = pd.array(
                acc["content_length"], dtype="Int64"
            )
            yield out

    base_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name != warc_col
    )
    return df.mapInPandas(walk, base_schema + ", " + WARC_RECORD_SCHEMA)


def extract_main_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted_text",
    http: bool = False,
) -> DataFrame:
    """HTML → main text under the ``functions/html.py`` contract; input
    may be a string column or binary UTF-8. ``http=True`` strips an HTTP
    response envelope first (the WARC ``response`` payload shape).
    Unparseable/None rows null out."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.html import html_to_text
        from ..sources.warc import http_response_body

        for pdf in batches:
            texts = []
            for payload in pdf[html_col]:
                if payload is None:
                    texts.append(None)
                    continue
                try:
                    if http:
                        payload = http_response_body(bytes(payload))
                    s = (
                        bytes(payload).decode("utf-8", "replace")
                        if not isinstance(payload, str)
                        else payload
                    )
                    texts.append(html_to_text(s))
                except (ValueError, TypeError, AssertionError):
                    texts.append(None)
            out = pdf.copy()
            out[out_col] = texts
            yield out

    schema = df.schema.simpleString()[7:-1] + f",{out_col} string"
    return df.mapInPandas(extract, schema)
