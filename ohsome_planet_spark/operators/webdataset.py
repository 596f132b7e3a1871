"""WebDataset shard operators: tar member walk + per-shard sample
grouping (``sources/tar.py``), the loader side of the multimodal
training-data loop.

Both kernels are single Arrow-batched ``mapInPandas`` passes (the seam
contract of ``operators/web.py``/``multimodal.py``): shard bytes never
shuffle, broadcast, or reach the driver. Sample grouping is per-shard
and in-stream — the WebDataset contract makes sample boundaries a
local property of one tar, so the 100 TB plan needs no shuffle at all
between shard bytes and assembled samples."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TAR_MEMBER_SCHEMA = (
    "member_idx int, name string, size bigint, mtime bigint,"
    " typeflag string, payload binary"
)

WDS_SAMPLE_SCHEMA = (
    "sample_idx int, key string, n_parts int, exts array<string>,"
    " parts map<string,binary>"
)


def tar_members(df: DataFrame, tar_col: str = "shard") -> DataFrame:
    """Explode tar shard bytes into one row per member (checksums
    verified; gzip envelopes unwrapped). Unparseable shards yield zero
    rows rather than killing the job — the same dirty-input contract as
    :func:`operators.web.warc_records`."""
    base_cols = [c for c in df.columns if c != tar_col]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.tar import TarFormatError, parse_tar

        rec_cols = ("member_idx", "name", "size", "mtime", "typeflag",
                    "payload")
        for pdf in batches:
            acc: dict[str, list] = {c: [] for c in base_cols}
            acc.update({c: [] for c in rec_cols})
            for _, r in pdf.iterrows():
                try:
                    ms = parse_tar(bytes(r[tar_col]))
                except (TarFormatError, ValueError, TypeError):
                    continue
                for i, m in enumerate(ms):
                    for c in base_cols:
                        acc[c].append(r[c])
                    acc["member_idx"].append(i)
                    for k in ("name", "size", "mtime", "typeflag",
                              "payload"):
                        acc[k].append(m[k])
            out = pd.DataFrame(
                {c: acc[c] for c in base_cols + list(rec_cols)}
            )
            out["member_idx"] = pd.array(acc["member_idx"], dtype="Int32")
            for k in ("size", "mtime"):
                out[k] = pd.array(acc[k], dtype="Int64")
            yield out

    base_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name != tar_col
    )
    schema = (base_schema + ", " if base_schema else "") + TAR_MEMBER_SCHEMA
    return df.mapInPandas(walk, schema)


def wds_samples(df: DataFrame, tar_col: str = "shard") -> DataFrame:
    """Assemble WebDataset samples: one row per sample with the
    ``key``, the sorted extension list and an ``ext → bytes`` map.
    Grouping is per shard over CONSECUTIVE members (the streaming
    contract) — no shuffle between shard bytes and samples."""
    base_cols = [c for c in df.columns if c != tar_col]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sources.tar import TarFormatError, group_wds_samples, parse_tar

        rec_cols = ("sample_idx", "key", "n_parts", "exts", "parts")
        for pdf in batches:
            acc: dict[str, list] = {c: [] for c in base_cols}
            acc.update({c: [] for c in rec_cols})
            for _, r in pdf.iterrows():
                try:
                    samples = group_wds_samples(parse_tar(bytes(r[tar_col])))
                except (TarFormatError, ValueError, TypeError):
                    continue
                for i, s in enumerate(samples):
                    for c in base_cols:
                        acc[c].append(r[c])
                    acc["sample_idx"].append(i)
                    acc["key"].append(s["key"])
                    acc["n_parts"].append(len(s["parts"]))
                    acc["exts"].append(sorted(s["parts"]))
                    acc["parts"].append(dict(s["parts"]))
            out = pd.DataFrame(
                {
                    c: pd.Series(acc[c], dtype=object)
                    for c in base_cols + list(rec_cols)
                }
            )
            for k in ("sample_idx", "n_parts"):
                out[k] = pd.array(acc[k], dtype="Int32")
            yield out

    base_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name != tar_col
    )
    schema = (base_schema + ", " if base_schema else "") + WDS_SAMPLE_SCHEMA
    return df.mapInPandas(walk, schema)


def write_wds_shards(
    df: DataFrame,
    out_dir: str,
    ext_cols: dict[str, str],
    key_col: str = "key",
    samples_per_shard: int = 1000,
    gzip_envelope: bool = False,
) -> DataFrame:
    """Write WebDataset shards: each partition packs its rows into tars
    of ``samples_per_shard`` samples (``ext_cols`` maps member extension
    → source column; string columns are UTF-8 encoded, binary pass
    through) and writes ``shard-{partition:05d}-{n:05d}.tar[.gz]``
    executor-side. Returns the write REPORT frame (path, n_samples,
    n_bytes) — an action on it performs the write, mirroring how
    WebDataset shards are produced in practice: shard-local packing, no
    shuffle, no driver involvement. ``out_dir`` must be a filesystem
    every executor can reach (local dir here; a mounted/object-store
    path on a real cluster)."""
    import os

    exts = dict(ext_cols)
    cols = [key_col] + list(exts.values())

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from ..sources.tar import encode_tar

        pid = TaskContext.get().partitionId()
        os.makedirs(out_dir, exist_ok=True)
        buf: list[tuple[str, bytes]] = []
        counts = {"samples": 0}
        shard_no = {"n": 0}
        reports: list[tuple[str, int, int]] = []

        def flush(n_samples: int) -> None:
            if not buf:
                return
            suffix = ".tar.gz" if gzip_envelope else ".tar"
            path = os.path.join(
                out_dir, f"shard-{pid:05d}-{shard_no['n']:05d}{suffix}"
            )
            data = encode_tar(list(buf), gzip_envelope=gzip_envelope)
            with open(path, "wb") as fh:
                fh.write(data)
            reports.append((path, n_samples, len(data)))
            shard_no["n"] += 1
            buf.clear()

        for pdf in it:
            for _, r in pdf[cols].iterrows():
                key = str(r[key_col])
                for ext, col in exts.items():
                    v = r[col]
                    if v is None:
                        continue
                    payload = (
                        bytes(v)
                        if isinstance(v, (bytes, bytearray, memoryview))
                        else str(v).encode()
                    )
                    buf.append((f"{key}.{ext}", payload))
                counts["samples"] += 1
                if counts["samples"] % samples_per_shard == 0:
                    flush(samples_per_shard)
        if buf:
            flush(counts["samples"] % samples_per_shard)
        yield pd.DataFrame(
            {
                "path": [p for p, _n, _b in reports],
                "n_samples": pd.array(
                    [n for _p, n, _b in reports], dtype="Int64"
                ),
                "n_bytes": pd.array(
                    [b for _p, _n, b in reports], dtype="Int64"
                ),
            }
        )

    return df.select(cols).mapInPandas(
        pack, "path string, n_samples bigint, n_bytes bigint"
    )


ZIP_MEMBER_SCHEMA = (
    "member_idx int, name string, size bigint, compressed_size bigint,"
    " method int, crc32 bigint, payload binary"
)


def zip_members(df: DataFrame, zip_col: str = "archive") -> DataFrame:
    """Explode ZIP archive bytes into one row per member
    (``sources/zip.py``: central-directory walk, STORED/DEFLATE decode,
    CRC verified). Unparseable archives yield zero rows — the same
    dirty-input contract as :func:`tar_members`."""
    base_cols = [c for c in df.columns if c != zip_col]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..sources.zip import ZipFormatError, parse_zip

        rec_cols = ("member_idx", "name", "size", "compressed_size",
                    "method", "crc32", "payload")
        for pdf in batches:
            acc: dict[str, list] = {c: [] for c in base_cols}
            acc.update({c: [] for c in rec_cols})
            for _, r in pdf.iterrows():
                try:
                    ms = parse_zip(bytes(r[zip_col]))
                except (ZipFormatError, ValueError, TypeError,
                        struct.error, IndexError):
                    # struct.error is NOT a ValueError subclass: a
                    # truncated EOCD/central directory must hit the
                    # zero-rows dirty-input contract, not kill the task
                    # (ADVICE r12, medium)
                    continue
                for i, m in enumerate(ms):
                    for c in base_cols:
                        acc[c].append(r[c])
                    acc["member_idx"].append(i)
                    for k in ("name", "size", "compressed_size", "method",
                              "crc32", "payload"):
                        acc[k].append(m[k])
            out = pd.DataFrame(
                {
                    c: pd.Series(acc[c], dtype=object)
                    for c in base_cols + list(rec_cols)
                }
            )
            for k in ("member_idx", "method"):
                out[k] = pd.array(acc[k], dtype="Int32")
            for k in ("size", "compressed_size", "crc32"):
                out[k] = pd.array(acc[k], dtype="Int64")
            yield out

    base_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name != zip_col
    )
    schema = (base_schema + ", " if base_schema else "") + ZIP_MEMBER_SCHEMA
    return df.mapInPandas(walk, schema)
