"""Multimodal column operators for training-data pipelines.

Images/audio/video travel as opaque ``binary`` columns with typed metadata
structs; every kernel is a single Arrow-batched map pass (media bytes
never shuffle, broadcast, or reach the driver). The decode surface is
REAL where stdlib/numpy reach, stubbed only for perceptual codecs that
need external libraries:

- :func:`decode_media`        — PNG / GIF / JPEG (baseline + progressive)
                                / baseline TIFF pixel decode
                                (``functions/png.py`` / ``gif.py`` /
                                ``jpeg.py`` / ``tiff.py``);
- :func:`resize_media`        — exact-integer nearest-neighbor downscale
                                over the decoded pixels;
- :func:`decode_audio`        — WAV PCM, G.711 µ-law/A-law, IMA ADPCM and
                                FLAC (``functions/wav.py`` / ``flac.py``);
- :func:`audio_features`      — integer-exact energy/zero-crossings/peak;
- :func:`probe_video`         — ISO-BMFF and RIFF/AVI container metadata;
- :func:`probe_h264`          — Annex-B NAL walk + exp-Golomb SPS/PPS/
                                slice-header parse (``functions/h264.py``);
- :func:`sample_video_frames` — every-Nth MJPEG frame decode (sampling
                                BEFORE decode);
- :func:`with_media_meta` / :func:`decode_stub` / :func:`resize_plan` /
  :func:`frame_sample_plan`   — the metadata pass plus the documented
                                deterministic-fake seam for formats with
                                no native decoder (mp3/aac/h264/...).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60_expr

MEDIA_SCHEMA = (
    "media_id bigint, media binary, kind string, n_bytes int,"
    " fake_width int, fake_height int"
)


def _decode_media_real(payload: bytes) -> tuple[int, int, int, int | None]:
    """The real decode seam: (width, height, channels, pixel_sum).

    PNG is decoded for real — stdlib inflate + per-row un-filter
    (``functions/png.py``); ``pixel_sum`` covers every decoded byte, so a
    wrong filter reversal anywhere in the image changes the result.
    JPEG — baseline sequential (SOF0/SOF1) AND progressive (SOF2, spectral
    selection + successive approximation) — is also decoded for real
    (``functions/jpeg.py::decode_jpeg``: huffman entropy decode, dequant,
    type-III DCT, chroma upsampling, YCbCr→RGB), so ``pixel_sum`` covers
    the dominant training-data image format in both its wire forms.
    Arithmetic/lossless JPEG (and metadata-only streams) fall back to the
    real SOFn header walk (genuine dims, null pixel_sum). GIF (87a/89a,
    LZW + interlace, ``functions/gif.py``) and baseline TIFF (strips,
    PackBits/LZW with early change + predictor, gray/RGB/palette/
    WhiteIsZero, both byte orders, ``functions/tiff.py``) decode for real
    too. Other containers raise NotImplementedError and callers fall back
    to the stub."""
    from ..functions.gif import GIF_MAGICS, decode_gif
    from ..functions.jpeg import (
        JPEG_SOI,
        JpegFormatError,
        decode_jpeg,
        decode_jpeg_header,
    )
    from ..functions.png import PNG_SIGNATURE, decode_png
    from ..functions.tiff import TIFF_MAGICS, decode_tiff

    payload = bytes(payload)
    if payload[:8] == PNG_SIGNATURE:
        width, height, channels, rows = decode_png(payload)
        return width, height, channels, sum(sum(r) for r in rows)
    if payload[:6] in GIF_MAGICS:
        width, height, channels, rows = decode_gif(payload)
        return width, height, channels, sum(sum(r) for r in rows)
    if payload[:4] in TIFF_MAGICS:
        width, height, channels, rows = decode_tiff(payload)
        return width, height, channels, sum(sum(r) for r in rows)
    if payload[:2] == JPEG_SOI:
        try:
            width, height, channels, rows = decode_jpeg(payload)
            return width, height, channels, sum(sum(r) for r in rows)
        except JpegFormatError:
            # non-huffman frame (arithmetic, lossless, 12-bit) or no scan
            # data: dimensions still parse from the SOFn header
            width, height, channels = decode_jpeg_header(payload)
            return width, height, channels, None
    raise NotImplementedError(
        "no native pixel decoder for this container (PNG/GIF/JPEG/TIFF "
        "decode "
        "natively; audio goes through decode_audio, video through "
        "probe_video/sample_video_frames); other formats need an external "
        "library not present in this environment — decode_stub provides "
        "the deterministic fake"
    )


def magic_kind_expr(media: Column) -> Column:
    """Container sniffing from magic bytes — native expressions only."""
    head = F.hex(F.substring(media, 1, 4))
    return (
        F.when(head.startswith("89504E47"), F.lit("png"))
        .when(head.startswith("FFD8"), F.lit("jpeg"))
        .when(head.startswith("47494638"), F.lit("gif"))
        .when(
            head.startswith("49492A00") | head.startswith("4D4D002A"),
            F.lit("tiff"),
        )
        .when(
            head.startswith("52494646")
            & (F.hex(F.substring(media, 9, 4)) == F.lit("57415645")),  # WAVE
            F.lit("wav"),
        )
        .when(head.startswith("52494646"), F.lit("riff"))
        .when(
            F.hex(F.substring(media, 5, 4)) == F.lit("66747970"),  # ftyp
            F.lit("mp4"),
        )
        .when(
            head.startswith("494433")  # ID3v2 prefix
            | head.startswith("FFF")  # MPEG sync, MPEG1/2
            | head.startswith("FFE"),  # MPEG sync, MPEG2.5
            F.lit("mp3"),
        )
        .otherwise(F.lit("unknown"))
    )


def with_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Typed metadata columns, all JVM-side (no decode)."""
    m = F.col(media_col)
    return df.withColumn("n_bytes", F.length(m).cast("int")).withColumn(
        "kind", magic_kind_expr(m)
    )


def fake_dims_expr(media: Column) -> tuple[Column, Column]:
    """Deterministic fake dimensions from the content hash — stands in for
    the decoded header until a real decoder is wired into
    ``_decode_media_real``. Exactly reproducible in SQL (md5-based)."""
    h = hash60_expr(F.hex(media))
    # pure modular arithmetic: int64-exact in Spark, DuckDB and Python
    # (integer division of a 60-bit hash through doubles loses precision)
    return (
        (F.pmod(h, F.lit(1920)) + 1).cast("int"),
        (F.pmod(h, F.lit(1080)) + 1).cast("int"),
    )


def decode_stub(df: DataFrame, media_col: str = "media") -> DataFrame:
    """``mapInPandas`` decode plumbing: batches of binary payloads in, rows
    with dimension metadata out. The per-item kernel is the deterministic
    fake; the Arrow batch shape and schema are what a real decoder uses."""

    cols = df.columns

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            widths, heights = [], []
            for payload in pdf[media_col]:
                if payload is None:
                    widths.append(None)
                    heights.append(None)
                    continue
                # real decoders plug in at _decode_media_real(payload)
                # uppercase hex matches fake_dims_expr / F.hex exactly
                h = int(
                    hashlib.md5(bytes(payload).hex().upper().encode()).hexdigest()[:15], 16
                )
                widths.append(h % 1920 + 1)
                heights.append(h % 1080 + 1)
            out = pdf.copy()
            out["fake_width"] = pd.array(widths, dtype="Int32")
            out["fake_height"] = pd.array(heights, dtype="Int32")
            yield out

    schema = df.schema.simpleString()[7:-1] + ",fake_width int,fake_height int"
    return df.mapInPandas(decode, schema)


def decode_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL decode via ``mapInPandas``: per-batch kernel calling
    :func:`_decode_media_real` (PNG: full pixel decode). Non-decodable or
    unsupported payloads yield null dims instead of failing the task —
    at 100 TB a corrupt image must not kill the job. Same Arrow batch
    shape as :func:`decode_stub`; columns ``width/height/channels/
    pixel_sum`` appended."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        for pdf in batches:
            widths, heights, channels, sums = [], [], [], []
            for payload in pdf[media_col]:
                try:
                    w, h, c, s = _decode_media_real(payload)
                except (
                    NotImplementedError,
                    ValueError,
                    TypeError,
                    # corrupt IDAT deflate stream / malformed chunk layout
                    # escape decode_png as these, not ValueError
                    zlib.error,
                    struct.error,
                    IndexError,
                ):
                    w = h = c = s = None
                widths.append(w)
                heights.append(h)
                channels.append(c)
                sums.append(s)
            out = pdf.copy()
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["channels"] = pd.array(channels, dtype="Int32")
            out["pixel_sum"] = pd.array(sums, dtype="Int64")
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",width int,height int,channels int,pixel_sum bigint"
    )
    return df.mapInPandas(decode, schema)


def decode_audio(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL audio decode via ``mapInPandas``: PCM RIFF/WAVE *and* FLAC
    payloads (magic-sniffed) → ``channels/sample_rate/bits/n_frames/
    sample_sum`` (the audio analog of ``decode_media``'s pixel_sum — both
    codecs are lossless, so the sum is exact; FLAC streams additionally
    verify per-frame CRC-8/CRC-16 and the stream MD5). Perceptual codecs
    (mp3/aac/opus) need external libraries and null out like corrupt
    payloads do."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..functions.flac import FLAC_MAGIC, decode_flac_summary
        from ..functions.wav import decode_wav

        for pdf in batches:
            cols = {k: [] for k in
                    ("channels", "sample_rate", "bits", "n_frames", "sample_sum")}
            for payload in pdf[media_col]:
                try:
                    if bytes(payload[:4]) == FLAC_MAGIC:
                        ch, rate, bits, frames, total = decode_flac_summary(payload)
                    else:
                        ch, rate, bits, frames, total = decode_wav(payload)
                except (ValueError, TypeError, struct.error, IndexError):
                    ch = rate = bits = frames = total = None
                cols["channels"].append(ch)
                cols["sample_rate"].append(rate)
                cols["bits"].append(bits)
                cols["n_frames"].append(frames)
                cols["sample_sum"].append(total)
            out = pdf.copy()
            for k in ("channels", "sample_rate", "bits", "n_frames"):
                out[k] = pd.array(cols[k], dtype="Int32")
            out["sample_sum"] = pd.array(cols["sample_sum"], dtype="Int64")
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",channels int,sample_rate int,bits int,n_frames int,sample_sum bigint"
    )
    return df.mapInPandas(decode, schema)


def audio_features(
    df: DataFrame, frame_len: int = 400, media_col: str = "media"
) -> DataFrame:
    """REAL audio feature extraction over decoded PCM (WAV or FLAC,
    magic-sniffed): per fixed-length analysis frame — energy (sum of
    squared samples, exact int64), zero-crossing count (sign changes,
    strictly negative→nonnegative and vice versa) and peak |amplitude| —
    then stream-level aggregates, all integer arithmetic so the result is
    bit-deterministic and oracle-replayable. Channels average into a mono
    lane first (floor division, the usual integer downmix). Emits
    ``n_analysis_frames/energy_total/zero_crossings/peak_abs``;
    undecodable payloads null out. One Arrow-batched pass."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        from ..functions.flac import FLAC_MAGIC, decode_flac
        from ..functions.wav import decode_wav_frames

        for pdf in batches:
            cols = {k: [] for k in
                    ("n_analysis_frames", "energy_total", "zero_crossings",
                     "peak_abs")}
            for payload in pdf[media_col]:
                try:
                    if bytes(payload[:4]) == FLAC_MAGIC:
                        _ch, _r, _b, frames = decode_flac(payload)
                    else:
                        _ch, _r, _b, frames = decode_wav_frames(payload)
                except (ValueError, TypeError, struct.error, IndexError):
                    for k in cols:
                        cols[k].append(None)
                    continue
                if frames:
                    a = np.asarray(frames, dtype=np.int64)
                    mono = a.sum(axis=1) // a.shape[1]
                else:
                    mono = np.zeros(0, dtype=np.int64)
                n_frames = -(-len(mono) // frame_len) if len(mono) else 0
                energy = int((mono * mono).sum())
                neg = mono < 0
                zc = int((neg[1:] != neg[:-1]).sum()) if len(mono) > 1 else 0
                peak = int(np.abs(mono).max()) if len(mono) else 0
                cols["n_analysis_frames"].append(n_frames)
                cols["energy_total"].append(energy)
                cols["zero_crossings"].append(zc)
                cols["peak_abs"].append(peak)
            out = pdf.copy()
            for k in ("n_analysis_frames", "zero_crossings"):
                out[k] = pd.array(cols[k], dtype="Int32")
            for k in ("energy_total", "peak_abs"):
                out[k] = pd.array(cols[k], dtype="Int64")
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",n_analysis_frames int,energy_total bigint,zero_crossings int,"
        "peak_abs bigint"
    )
    return df.mapInPandas(feats, schema)


def probe_audio_stream(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL MPEG-audio (MP3) probe via ``mapInPandas``: frame-by-frame
    sync walk (``functions/mp3.py``) — version/layer/bitrate tables,
    ID3v2 skip, first-frame Xing/Info VBR header — emitting
    ``sample_rate/channels/n_frames/duration_us/bitrate_kbps/is_vbr``.
    The audio sibling of :func:`probe_video`: the metadata pass that runs
    before any decode spend; undecodable payloads null out."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..functions.mp3 import Mp3FormatError, probe_mp3

        cols = ("sample_rate", "channels", "n_frames", "duration_us",
                "bitrate_kbps", "is_vbr")
        for pdf in batches:
            acc = {k: [] for k in cols}
            for payload in pdf[media_col]:
                try:
                    r = probe_mp3(bytes(payload))
                except (Mp3FormatError, ValueError, TypeError, struct.error,
                        IndexError):
                    r = None
                for k in cols:
                    acc[k].append(r[k] if r is not None else None)
            out = pdf.copy()
            for k in ("sample_rate", "channels", "n_frames", "bitrate_kbps"):
                out[k] = pd.array(acc[k], dtype="Int32")
            out["duration_us"] = pd.array(acc["duration_us"], dtype="Int64")
            out["is_vbr"] = pd.array(acc["is_vbr"], dtype="boolean")
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",sample_rate int,channels int,n_frames int,duration_us bigint,"
        "bitrate_kbps int,is_vbr boolean"
    )
    return df.mapInPandas(probe, schema)


def probe_adts_stream(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL AAC ADTS transport probe via ``mapInPandas``: per-frame
    56-bit header walk (``functions/aac.py``) — profile/object type,
    sampling-frequency and channel-configuration tables, CRC skip,
    multi-raw-data-block duration arithmetic. The AAC filterbank stays
    behind the documented external-codec stub; undecodable payloads
    null out like every other media seam."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.aac import AdtsFormatError, probe_adts

        cols = ("profile", "profile_name", "sample_rate", "channels",
                "n_frames", "n_samples", "duration_us", "bitrate_kbps",
                "crc_frames")
        for pdf in batches:
            acc = {k: [] for k in cols}
            for payload in pdf[media_col]:
                try:
                    r = probe_adts(bytes(payload))
                except (AdtsFormatError, ValueError, TypeError, IndexError):
                    r = None
                for k in cols:
                    acc[k].append(r[k] if r is not None else None)
            out = pdf.copy()
            for k in ("profile", "sample_rate", "channels", "n_frames",
                      "n_samples", "bitrate_kbps", "crc_frames"):
                out[k] = pd.array(acc[k], dtype="Int32")
            out["duration_us"] = pd.array(acc["duration_us"], dtype="Int64")
            out["profile_name"] = acc["profile_name"]
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",profile int,profile_name string,sample_rate int,channels int,"
        "n_frames int,n_samples int,duration_us bigint,bitrate_kbps int,"
        "crc_frames int"
    )
    return df.mapInPandas(probe, schema)


def probe_ogg_stream(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL Ogg container probe via ``mapInPandas``
    (``functions/ogg.py``): CRC-verified page walk, lacing-table packet
    assembly incl. page-spanning packets, OpusHead / Vorbis ID header
    decode, granule-position duration arithmetic. SILK/CELT/MDCT audio
    decode stays behind the documented external-codec stub; undecodable
    payloads null out."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.ogg import OggFormatError, probe_ogg

        cols = ("codec", "channels", "sample_rate", "pre_skip", "n_pages",
                "n_packets", "duration_us", "serial")
        for pdf in batches:
            acc = {k: [] for k in cols}
            for payload in pdf[media_col]:
                try:
                    r = probe_ogg(bytes(payload))
                except (OggFormatError, ValueError, TypeError, IndexError):
                    r = None
                for k in cols:
                    acc[k].append(r[k] if r is not None else None)
            out = pdf.copy()
            for k in ("channels", "sample_rate", "pre_skip", "n_pages",
                      "n_packets"):
                out[k] = pd.array(acc[k], dtype="Int32")
            for k in ("duration_us", "serial"):
                out[k] = pd.array(acc[k], dtype="Int64")
            out["codec"] = acc["codec"]
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",codec string,channels int,sample_rate int,pre_skip int,"
        "n_pages int,n_packets int,duration_us bigint,serial bigint"
    )
    return df.mapInPandas(probe, schema)


def probe_webm_stream(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL EBML/Matroska/WebM probe via ``mapInPandas``
    (``functions/ebml.py``): varint walk (non-minimal sizes, unknown-size
    segments), Info/Tracks/Cluster decode, SimpleBlock counting.
    VP8/VP9/AV1/Opus frame decode stays behind the documented
    external-codec stub; undecodable payloads null out."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.ebml import EbmlFormatError, probe_webm

        cols = ("doctype", "video_codec", "width", "height", "audio_codec",
                "sample_rate", "channels", "timescale_ns", "duration_ms",
                "n_tracks", "n_clusters", "n_blocks")
        for pdf in batches:
            acc = {k: [] for k in cols}
            for payload in pdf[media_col]:
                try:
                    r = probe_webm(bytes(payload))
                except (EbmlFormatError, ValueError, TypeError, IndexError):
                    r = None
                for k in cols:
                    acc[k].append(r[k] if r is not None else None)
            out = pdf.copy()
            for k in ("width", "height", "sample_rate", "channels",
                      "n_tracks", "n_clusters", "n_blocks"):
                out[k] = pd.array(acc[k], dtype="Int32")
            for k in ("timescale_ns", "duration_ms"):
                out[k] = pd.array(acc[k], dtype="Int64")
            for k in ("doctype", "video_codec", "audio_codec"):
                out[k] = acc[k]
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",doctype string,video_codec string,width int,height int,"
        "audio_codec string,sample_rate int,channels int,"
        "timescale_ns bigint,duration_ms bigint,n_tracks int,"
        "n_clusters int,n_blocks int"
    )
    return df.mapInPandas(probe, schema)


def subtitle_cues(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Explode SRT/WebVTT caption payloads into one row per cue
    (``functions/subtitles.py``): magic-sniffed format, millisecond
    timings, markup-stripped text. Unparseable payloads yield zero rows
    (crawl captions are dirty by construction)."""
    base_cols = [c for c in df.columns if c != media_col]

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.subtitles import SubtitleFormatError, parse_subtitles

        rec_cols = ("fmt", "cue_idx", "start_ms", "end_ms", "cue_text")
        for pdf in batches:
            acc: dict[str, list] = {c: [] for c in base_cols}
            acc.update({c: [] for c in rec_cols})
            for _, r in pdf.iterrows():
                try:
                    fmt, cues = parse_subtitles(r[media_col])
                except (SubtitleFormatError, ValueError, TypeError):
                    continue
                for i, cue in enumerate(cues):
                    for c in base_cols:
                        acc[c].append(r[c])
                    acc["fmt"].append(fmt)
                    acc["cue_idx"].append(i)
                    acc["start_ms"].append(cue["start_ms"])
                    acc["end_ms"].append(cue["end_ms"])
                    acc["cue_text"].append(cue["text"])
            out = pd.DataFrame(
                {
                    c: pd.Series(acc[c], dtype=object)
                    for c in base_cols + list(rec_cols)
                }
            )
            out["cue_idx"] = pd.array(acc["cue_idx"], dtype="Int32")
            for k in ("start_ms", "end_ms"):
                out[k] = pd.array(acc[k], dtype="Int64")
            yield out

    base_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name != media_col
    )
    return df.mapInPandas(
        walk,
        base_schema
        + ", fmt string, cue_idx int, start_ms bigint, end_ms bigint,"
        " cue_text string",
    )


def audio_tags(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL ID3v2 tag extraction via ``mapInPandas``
    (``functions/id3.py``): v2.2/2.3/2.4 frame walk, syncsafe sizes,
    unsynchronization reversal, all four text encodings — the
    attribution/caption metadata pass for audio corpora. Untagged or
    corrupt payloads null out."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.id3 import Id3FormatError, parse_id3v2

        cols = ("version", "n_frames", "title", "artist", "album", "year",
                "track", "genre", "comment")
        for pdf in batches:
            acc = {k: [] for k in cols}
            for payload in pdf[media_col]:
                try:
                    r = parse_id3v2(bytes(payload))
                except (Id3FormatError, ValueError, TypeError, IndexError):
                    r = None
                for k in cols:
                    acc[k].append(r[k] if r is not None else None)
            out = pdf.copy()
            for k in ("version", "n_frames"):
                out[k] = pd.array(acc[k], dtype="Int32")
            for k in ("title", "artist", "album", "year", "track", "genre",
                      "comment"):
                out[k] = acc[k]
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",version int,n_frames int,title string,artist string,"
        "album string,year string,track string,genre string,comment string"
    )
    return df.mapInPandas(probe, schema)


def probe_ts_stream(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL MPEG transport-stream probe via ``mapInPandas``
    (``functions/mpegts.py``): 188-byte packet walk, continuity
    checking, CRC-verified PAT/PMT, PCR duration, per-PID PES counts —
    the HLS-segment metadata pass. Elementary codec payloads stay
    behind the dedicated probes/stubs; undecodable payloads null out."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..functions.mpegts import TsFormatError, probe_ts

        cols = ("n_packets", "n_null", "program_number", "pmt_pid",
                "pcr_pid", "video_pid", "audio_pid", "video_codec",
                "audio_codec", "n_video_pes", "n_audio_pes", "duration_ms",
                "cc_errors")
        for pdf in batches:
            acc = {k: [] for k in cols}
            for payload in pdf[media_col]:
                try:
                    r = probe_ts(bytes(payload))
                    codec = {pid: name for pid, _t, name in r["streams"]}
                    r = dict(r)
                    r["video_codec"] = codec.get(r["video_pid"])
                    r["audio_codec"] = codec.get(r["audio_pid"])
                except (TsFormatError, ValueError, TypeError, IndexError,
                        struct.error):
                    r = None
                for k in cols:
                    acc[k].append(r[k] if r is not None else None)
            out = pdf.copy()
            for k in ("n_packets", "n_null", "program_number", "pmt_pid",
                      "pcr_pid", "video_pid", "audio_pid", "n_video_pes",
                      "n_audio_pes", "cc_errors"):
                out[k] = pd.array(acc[k], dtype="Int32")
            out["duration_ms"] = pd.array(acc["duration_ms"], dtype="Int64")
            for k in ("video_codec", "audio_codec"):
                out[k] = acc[k]
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",n_packets int,n_null int,program_number int,pmt_pid int,"
        "pcr_pid int,video_pid int,audio_pid int,video_codec string,"
        "audio_codec string,n_video_pes int,n_audio_pes int,"
        "duration_ms bigint,cc_errors int"
    )
    return df.mapInPandas(probe, schema)


def probe_video(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL video container probe via ``mapInPandas``: ISO-BMFF (MP4/MOV)
    box walk or RIFF/AVI chunk walk (magic-sniffed) →
    ``width/height/duration_ms`` — the metadata pass a training pipeline
    runs on every video before spending decode cycles. Frame pixel decode
    is real for MJPEG-in-AVI (:func:`sample_video_frames`); other codecs
    stay behind the external-codec stub."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..functions.avi import AVI_MAGIC_PREFIX, probe_avi
        from ..functions.isobmff import probe_mp4

        for pdf in batches:
            widths, heights, durations = [], [], []
            for payload in pdf[media_col]:
                try:
                    if bytes(payload[:4]) == AVI_MAGIC_PREFIX:
                        w, h, _n, ms = probe_avi(payload)
                    else:
                        w, h, duration, timescale = probe_mp4(payload)
                        ms = (duration * 1000) // timescale if timescale else None
                except (ValueError, TypeError, struct.error, IndexError):
                    w = h = ms = None
                widths.append(w)
                heights.append(h)
                durations.append(ms)
            out = pdf.copy()
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            out["duration_ms"] = pd.array(durations, dtype="Int64")
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",width int,height int,duration_ms bigint"
    )
    return df.mapInPandas(probe, schema)


def probe_h264(df: DataFrame, media_col: str = "media") -> DataFrame:
    """REAL H.264/AVC elementary-stream probe via ``mapInPandas``:
    Annex-B start-code walk, emulation-prevention strip, exp-Golomb
    SPS/PPS decode (display dimensions from the macroblock grid +
    frame-cropping arithmetic, ITU-T H.264 §7.4.2.1.1) and the
    slice-header prefix (IDR/I/P/B classification, frame_num) — the
    metadata/keyframe pass a video pipeline runs before spending
    external-codec decode cycles. Macroblock reconstruction stays
    behind the documented perceptual-codec stub."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.h264 import parse_annexb

        for pdf in batches:
            cols: dict[str, list] = {
                k: []
                for k in (
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
            }
            for payload in pdf[media_col]:
                try:
                    r = parse_annexb(payload)
                    sps, pps = r["sps"], r["pps"]
                    cols["profile_idc"].append(sps["profile_idc"] if sps else None)
                    cols["level_idc"].append(sps["level_idc"] if sps else None)
                    cols["width"].append(sps["width"] if sps else None)
                    cols["height"].append(sps["height"] if sps else None)
                    cols["frame_mbs_only"].append(
                        bool(sps["frame_mbs_only_flag"]) if sps else None
                    )
                    cols["entropy_cabac"].append(
                        bool(pps["entropy_coding_mode"]) if pps else None
                    )
                    cols["max_ref_frames"].append(
                        sps["max_num_ref_frames"] if sps else None
                    )
                    cols["n_nals"].append(r["n_nals"])
                    cols["n_slices"].append(r["n_slices"])
                    cols["n_idr"].append(r["n_idr"])
                    cols["slice_types"].append("".join(r["slice_types"]))
                except (ValueError, IndexError, TypeError):
                    for k in cols:
                        cols[k].append(None)
            out = pdf.copy()
            for k in (
                "profile_idc",
                "level_idc",
                "width",
                "height",
                "max_ref_frames",
                "n_nals",
                "n_slices",
                "n_idr",
            ):
                out[k] = pd.array(cols[k], dtype="Int32")
            for k in ("frame_mbs_only", "entropy_cabac"):
                out[k] = pd.array(cols[k], dtype="boolean")
            out["slice_types"] = cols["slice_types"]
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",profile_idc int,level_idc int,width int,height int,"
        "frame_mbs_only boolean,entropy_cabac boolean,max_ref_frames int,"
        "n_nals int,n_slices int,n_idr int,slice_types string"
    )
    return df.mapInPandas(probe, schema)


def _decode_media_rows(payload: bytes) -> tuple[int, int, int, list]:
    """(width, height, channels, pixel rows) for the formats whose pixel
    decode is real (PNG / GIF / baseline+progressive JPEG / baseline
    TIFF); raises on
    anything else — the same seam contract as ``_decode_media_real``."""
    from ..functions.gif import GIF_MAGICS, decode_gif
    from ..functions.jpeg import JPEG_SOI, decode_jpeg
    from ..functions.png import PNG_SIGNATURE, decode_png
    from ..functions.tiff import TIFF_MAGICS, decode_tiff

    payload = bytes(payload)
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:6] in GIF_MAGICS:
        return decode_gif(payload)
    if payload[:2] == JPEG_SOI:
        return decode_jpeg(payload)
    if payload[:4] in TIFF_MAGICS:
        return decode_tiff(payload)
    raise NotImplementedError("no native pixel decoder for this container")


def resize_media(
    df: DataFrame,
    max_side: int = 512,
    media_col: str = "media",
    max_side_col: str | None = None,
) -> DataFrame:
    """REAL image resize through the multimodal seam: decode (PNG/GIF/
    JPEG/TIFF), then nearest-neighbor downscale to fit ``max_side`` (never
    upscale) with the floor source mapping ``sx = (x_t * w) // tw`` —
    exact integer arithmetic, so the kernel is bit-deterministic and
    oracle-replayable. Emits genuine ``width/height/target_width/
    target_height/resized_pixel_sum``; undecodable payloads null out.

    ``max_side_col`` switches to a per-row budget column (mixed-policy
    collections). Scale shape: one Arrow-batched pass, numpy fancy
    indexing per image; media bytes never leave the executors."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            cols = {k: [] for k in
                    ("width", "height", "target_width", "target_height",
                     "resized_pixel_sum")}
            budgets = (
                pdf[max_side_col] if max_side_col is not None
                else [max_side] * len(pdf)
            )
            for payload, ms in zip(pdf[media_col], budgets):
                try:
                    w, h, ch, rows = _decode_media_rows(payload)
                except (NotImplementedError, ValueError, TypeError):
                    for k in cols:
                        cols[k].append(None)
                    continue
                scale = min(1.0, float(ms) / float(max(w, h)))
                tw = int(math.ceil(w * scale))
                th = int(math.ceil(h * scale))
                img = np.frombuffer(b"".join(bytes(r) for r in rows),
                                    dtype=np.uint8).reshape(h, w * ch)
                sy = (np.arange(th, dtype=np.int64) * h) // th
                sx = (np.arange(tw, dtype=np.int64) * w) // tw
                # gather whole source pixels (all channels per column)
                colsel = (sx[:, None] * ch + np.arange(ch)[None, :]).ravel()
                resized = img[sy][:, colsel]
                cols["width"].append(w)
                cols["height"].append(h)
                cols["target_width"].append(tw)
                cols["target_height"].append(th)
                cols["resized_pixel_sum"].append(int(resized.sum(dtype=np.int64)))
            out = pdf.copy()
            for k in ("width", "height", "target_width", "target_height"):
                out[k] = pd.array(cols[k], dtype="Int32")
            out["resized_pixel_sum"] = pd.array(
                cols["resized_pixel_sum"], dtype="Int64"
            )
            yield out

    schema = (
        df.schema.simpleString()[7:-1]
        + ",width int,height int,target_width int,target_height int,"
        "resized_pixel_sum bigint"
    )
    return df.mapInPandas(resize, schema)


def resize_plan(
    df: DataFrame, max_side: int = 512, media_col: str = "media"
) -> DataFrame:
    """Resize plumbing: target dimensions computed natively from the decoded
    (fake) dims; the pixel kernel itself is the stub seam
    (:func:`resize_media` is the real-kernel counterpart for the formats
    with native pixel decoders)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("fake_width"), F.col("fake_height")),
    )
    return df.withColumn(
        "target_width", F.ceil(F.col("fake_width") * scale).cast("int")
    ).withColumn("target_height", F.ceil(F.col("fake_height") * scale).cast("int"))


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
    media_col: str = "media",
) -> DataFrame:
    """REAL video frame sampling for MJPEG-in-AVI payloads: parse the RIFF
    container (:func:`..functions.avi.parse_avi`), keep frame indices
    ``0, every_n, 2*every_n, …`` up to ``max_frames``, decode each sampled
    JPEG frame with the full huffman+IDCT pipeline, and emit ONE ROW PER
    SAMPLED FRAME with ``frame_idx/n_frames/width/height/pixel_sum``.

    Scale shape: sampling happens before decode, so a 1-in-30 policy pays
    1/30th of the decode cost; rows fan out inside the Arrow batch (no
    explode shuffle); media bytes never leave the executors. Non-AVI or
    non-JPEG payloads yield zero rows (probe them instead)."""

    passthrough = list(df.columns)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ..functions.avi import AviFormatError, parse_avi
        from ..functions.jpeg import JpegFormatError, decode_jpeg

        for pdf in batches:
            rows = []
            for _, rec in pdf.iterrows():
                try:
                    info = parse_avi(rec[media_col])
                except (AviFormatError, TypeError, struct.error):
                    continue
                frames = info["frames"]
                for i in range(0, len(frames), every_n):
                    if i // every_n >= max_frames:
                        break
                    try:
                        w, h, _c, prows = decode_jpeg(bytes(frames[i]))
                    except (JpegFormatError, ValueError):
                        continue
                    base = {c: rec[c] for c in passthrough}
                    base.update(
                        frame_idx=i, n_frames=len(frames), width=w, height=h,
                        pixel_sum=int(sum(sum(r) for r in prows)),
                    )
                    rows.append(base)
            cols = passthrough + [
                "frame_idx", "n_frames", "width", "height", "pixel_sum"
            ]
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        df.schema.simpleString()[7:-1]
        + ",frame_idx int,n_frames int,width int,height int,pixel_sum bigint"
    )
    return df.mapInPandas(sample, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: fake frame count from content length,
    deterministic sampled indices exploded into one row per frame — the
    exact shape a real ffmpeg-backed sampler produces."""
    n_frames = (F.length("media") % 900 + 30).cast("int")
    idx = F.slice(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)), 1, max_frames)
    return df.withColumn("n_frames", n_frames).withColumn(
        "frame_idx", F.explode(idx)
    )
