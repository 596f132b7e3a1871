"""Slice 7: round-12 additions — H.264 Annex-B probe, AAC ADTS probe,
PDF text extraction. Star-imports the cumulative namespace chain so
these rows compose with every earlier helper; ``plans/queries.py``
re-exports the final namespace."""

from __future__ import annotations

from ._q06 import *  # noqa: F401,F403


_H264_ORACLE = """
WITH cfg AS (
  SELECT doc_id, doc_id AS d,
    [66, 77, 100][doc_id % 3 + 1] AS profile_idc,
    [10, 20, 30, 31, 40, 41, 50, 51][doc_id % 8 + 1] AS level_idc,
    doc_id % 120 + 1 AS w_mbs,
    doc_id % 68 + 1 AS h_map,
    CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS fmo,
    doc_id % 3 = 0 AS has_crop,
    doc_id % 2 AS cl, (doc_id // 2) % 2 AS cr,
    (doc_id // 3) % 3 AS ct, (doc_id // 5) % 2 AS cb,
    CAST(doc_id % 7 + 1 AS INT) AS n_frames,
    doc_id % 4 = 0 AS sei
  FROM documents
)
SELECT doc_id,
  CAST(profile_idc AS INT) AS profile_idc,
  CAST(level_idc AS INT) AS level_idc,
  CAST(w_mbs * 16 - CASE WHEN has_crop THEN 2 * (cl + cr) ELSE 0 END
    AS INT) AS width,
  CAST((2 - fmo) * h_map * 16
       - CASE WHEN has_crop THEN 2 * (2 - fmo) * (ct + cb) ELSE 0 END
    AS INT) AS height,
  fmo = 1 AS frame_mbs_only,
  d % 2 = 1 AS entropy_cabac,
  CAST(d % 16 AS INT) AS max_ref_frames,
  CAST(2 + CASE WHEN sei THEN 1 ELSE 0 END + n_frames AS INT) AS n_nals,
  n_frames AS n_slices,
  CAST(1 AS INT) AS n_idr,
  'I' || repeat('P', n_frames - 1) AS slice_types
FROM cfg ORDER BY doc_id
"""


@_register("multimodal_h264_probe", _H264_ORACLE)
def multimodal_h264_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL H.264/AVC elementary-stream probe through the multimodal
    seam: deterministic spec-conformant Annex-B streams (Baseline /
    Main / High SPS incl. the chroma-format branch, frame cropping,
    field coding, CAVLC and CABAC PPS, zero-heavy SEI forcing
    emulation-prevention bytes on the wire, 3- and 4-byte start codes,
    IDR + P slices) are parsed back by
    :func:`operators.multimodal.probe_h264` — exp-Golomb decode,
    §7.4.2.1.1 crop-unit display dimensions, per-slice type walk. The
    oracle replays the parameter arithmetic; a wrong ue(v) decode, EPB
    strip or crop-unit factor breaks dims or slice counts. Reference
    parity: ohsome-planet ships no video codec; this row serves the
    training-data lane's metadata pass."""
    from ..operators.multimodal import probe_h264

    docs = fan_out(_t(spark, sf_dir, "documents")).select("doc_id")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.h264 import encode_annexb_stream

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    encode_annexb_stream(
                        profile_idc=(66, 77, 100)[d % 3],
                        level_idc=(10, 20, 30, 31, 40, 41, 50, 51)[d % 8],
                        pic_width_in_mbs=d % 120 + 1,
                        pic_height_in_map_units=d % 68 + 1,
                        frame_mbs_only=0 if d % 5 == 0 else 1,
                        crop=(
                            (d % 2, (d // 2) % 2, (d // 3) % 3, (d // 5) % 2)
                            if d % 3 == 0
                            else None
                        ),
                        n_frames=d % 7 + 1,
                        entropy_cabac=d % 2,
                        pic_order_cnt_type=0 if d % 2 == 0 else 2,
                        max_num_ref_frames=d % 16,
                        with_sei=d % 4 == 0,
                        long_start_codes=d % 2 == 1,
                    )
                )
            out = pdf.copy()
            out["media"] = payloads
            yield out

    media = docs.mapInPandas(encode, "doc_id bigint, media binary")
    return (
        probe_h264(media)
        .select(
            "doc_id",
            "profile_idc",
            "level_idc",
            "width",
            "height",
            "frame_mbs_only",
            "entropy_cabac",
            "max_ref_frames",
            "n_nals",
            "n_slices",
            "n_idr",
            "slice_types",
        )
        .orderBy("doc_id")
    )


__all__ = [n for n in dict(globals()) if not n.startswith("__")]
