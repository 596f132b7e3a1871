"""End-to-end training-data curation pipeline: the documents-side analog
of the bulk ``contributions`` run.

One composed DataFrame plan — no per-stage actions: every gate becomes a
boolean column (``pass_quality``, ``is_exact_dup``, ``is_repetitive``,
``contaminated``) plus the deterministic ``split``, so a single
aggregation yields the whole funnel report and a single filtered write
produces the curated dataset. At 100 TB that is one scan + one window
shuffle (dedup) + one shingle join (decontamination, only when a holdout
is supplied), instead of N re-scans for N stage counts.

Stages (each individually toggleable):

1. quality gate   — C4-style: quality score floor, token band, punctuation
                    ceiling, language-ID != 'und' (`functions/text.py`).
2. exact dedup    — first doc per 60-bit content hash wins (hash-window).
3. repetition gate— Gopher §A1.1 duplicate-token fraction ceiling.
4. decontamination— drop docs sharing >``contamination_max`` of their
                    5-gram shingles with a holdout corpus (inverted-index
                    join; the holdout's distinct-shingle side is usually
                    small enough for AQE to broadcast).
5. split          — deterministic 80/10/10 train/val/test hash bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import (
    dup_token_fraction_expr,
    hash60_expr,
    lang_guess_expr,
    ngrams_expr,
    punct_ratio_expr,
    quality_score_expr,
    token_count_expr,
)

FUNNEL_FLAGS = ("pass_quality", "is_exact_dup", "is_repetitive", "contaminated")


def flag_documents(
    docs: DataFrame,
    holdout: DataFrame | None = None,
    *,
    min_quality: float = 0.4,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    max_punct: float = 0.25,
    max_dup_token_frac: float = 0.7,
    contamination_max: float = 0.8,
) -> DataFrame:
    """Annotate ``docs`` with the funnel flags + split; drops nothing.

    ``keep`` is the conjunction the curated write filters on. Keeping the
    flags instead of filtering eagerly means one output can serve both the
    curated dataset and the rejected-docs audit (WHERE NOT keep).
    """
    t = F.col("text")
    flagged = docs.withColumns(
        {
            "_h": hash60_expr(t),
            "pass_quality": (
                (quality_score_expr(t) >= min_quality)
                & token_count_expr(t).between(min_tokens, max_tokens)
                & (punct_ratio_expr(t) < max_punct)
                & (lang_guess_expr(t) != "und")
            ),
            "is_repetitive": dup_token_fraction_expr(t) > max_dup_token_frac,
        }
    )
    wdup = W.partitionBy("_h").orderBy("doc_id")
    flagged = flagged.withColumn(
        "is_exact_dup", F.row_number().over(wdup) > 1
    )

    if holdout is not None:
        sh = flagged.select(
            "doc_id",
            F.explode(F.array_distinct(ngrams_expr(t, 5))).alias("shingle"),
        )
        hold_sh = holdout.select(
            F.explode(
                F.array_distinct(ngrams_expr(F.col("text"), 5))
            ).alias("shingle")
        ).distinct()
        overlap = (
            sh.join(hold_sh, "shingle")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("_n_overlap"))
        )
        totals = sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("_n_shingles")
        )
        contam = totals.join(overlap, "doc_id", "left").select(
            "doc_id",
            (
                F.coalesce(F.col("_n_overlap"), F.lit(0))
                / F.col("_n_shingles")
                > contamination_max
            ).alias("contaminated"),
        )
        flagged = flagged.join(contam, "doc_id", "left").withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    else:
        flagged = flagged.withColumn("contaminated", F.lit(False))

    bucket = F.pmod(
        hash60_expr(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))),
        F.lit(100),
    )
    return flagged.withColumns(
        {
            "split": F.when(bucket < 80, F.lit("train"))
            .when(bucket < 90, F.lit("val"))
            .otherwise(F.lit("test")),
            "keep": F.col("pass_quality")
            & ~F.col("is_exact_dup")
            & ~F.col("is_repetitive")
            & ~F.col("contaminated"),
        }
    ).drop("_h")


def funnel_report(flagged: DataFrame) -> dict:
    """One aggregation pass over the flag columns → stage counts."""
    row = flagged.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((~F.col("pass_quality")).cast("long")).alias("fail_quality"),
        F.sum(F.col("is_exact_dup").cast("long")).alias("exact_dups"),
        F.sum(F.col("is_repetitive").cast("long")).alias("repetitive"),
        F.sum(F.col("contaminated").cast("long")).alias("contaminated"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        *[
            F.sum(
                (F.col("keep") & (F.col("split") == s)).cast("long")
            ).alias(f"kept_{s}")
            for s in ("train", "val", "test")
        ],
    ).first()
    return {k: int(v) for k, v in row.asDict().items()}


def curate(
    docs: DataFrame,
    out_dir: str,
    holdout: DataFrame | None = None,
    exact_substr_n: int | None = None,
    **thresholds,
) -> dict:
    """Run the funnel and write the curated dataset partitioned by split.

    ``exact_substr_n`` prepends the ExactSubstr REWRITE stage (Lee et al.
    2022, ``operators/dedup.py::exact_substr_rewrite``): cross-corpus
    duplicated n-gram spans are cut OUT OF THE ORIGINAL TEXT before the
    quality/dedup gates, so boilerplate both disappears from the output
    and stops shielding near-identical documents from the exact-dup
    hash. Documents with no duplicated span pass through byte-for-byte —
    casing and punctuation survive, so the downstream punct_ratio
    quality gate still sees real punctuation (ADVICE round 10: the old
    normalized-space rewrite silently zeroed punct_ratio for every doc).

    Returns the funnel report. The write sorts within partitions by
    doc_id so the parquet row groups stay range-queryable by id."""
    if exact_substr_n:
        from .dedup import exact_substr_rewrite

        rewritten = exact_substr_rewrite(
            docs, "doc_id", "text", n=exact_substr_n
        ).select(
            F.col("doc").alias("doc_id"),
            F.col("text").alias("_new_text"),
        )
        docs = (
            docs.join(rewritten, "doc_id")
            .withColumn("text", F.col("_new_text"))
            .drop("_new_text")
        )
    flagged = flag_documents(docs, holdout, **thresholds)
    # flags are recomputed by the two actions below (report + write) —
    # cheaper than persisting the whole corpus for a one-pass-each pair
    report = funnel_report(flagged)
    (
        flagged.filter("keep")
        .drop("keep", *FUNNEL_FLAGS)
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(out_dir)
    )
    return report


def train_logreg(
    feats: DataFrame,
    n_features: int,
    iters: int = 3,
    lr: float = 0.5,
) -> tuple[list[float], float]:
    """Distributed, REPRODUCIBLE logistic-regression training — the
    canonical Spark ML gradient loop (map-side-combinable gradient
    aggregation, scalar driver update per round), made order-independent
    the same way as the k-means trainer (`similarity.py::kmeans_iterate`):
    each row's per-feature gradient contribution is quantized to int64
    (round(g·1e9)) BEFORE the sum, so the aggregated gradient is exact
    integer arithmetic — identical under any partitioning, and replayable
    bit-for-bit by a SQL oracle. Weight updates are pure rational double
    math on those exact sums.

    ``feats`` must carry columns x0..x{n-1} (double) and y (double 0/1).
    Returns (weights, train_accuracy). Per round the driver sees
    ``n_features`` integers — nothing corpus-sized; at 100 TB the only
    wide work is one combinable agg per iteration over the feature frame.
    """
    n = feats.count()
    w = [0.0] * n_features

    def z_expr(weights):
        z = F.lit(weights[0]) * F.col("x0")
        for j in range(1, n_features):
            z = z + F.lit(weights[j]) * F.col(f"x{j}")
        return z

    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z_expr(w)))
        e = p - F.col("y")
        row = feats.agg(
            *[
                F.sum(F.round(e * F.col(f"x{j}") * 1e9).cast("bigint")).alias(
                    f"g{j}"
                )
                for j in range(n_features)
            ]
        ).collect()[0]
        w = [w[j] - lr * (row[f"g{j}"] / 1e9) / n for j in range(n_features)]

    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z_expr(w)))
    acc = feats.agg(
        F.avg(
            ((p >= 0.5) == (F.col("y") >= 0.5)).cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]
    return w, acc


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    min_kept_lines: int = 3,
    doc_drop_markers: tuple[str, ...] = ("lorem ipsum", "{"),
    line_drop_markers: tuple[str, ...] = ("javascript",),
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2): rewrite
    each document keeping only lines that (a) end in terminal punctuation
    (``. ! ? "``) when ``require_terminal_punct``, (b) have at least
    ``min_words_per_line`` whitespace words, and (c) contain none of the
    ``line_drop_markers`` (case-insensitive); then drop whole documents
    that contain any ``doc_drop_markers`` or retain fewer than
    ``min_kept_lines`` lines. This is the line-granular rewrite sibling of
    ``exact_substr_dedup``'s span-granular one — together they cover C4's
    two text-mutating stages (its third, span dedup, IS exact_substr).

    Output: (doc, n_lines, n_kept_lines, kept_text, keep_doc) — one row
    per input document, ``kept_text`` the newline-joined surviving lines.

    Scale: a pure narrow map — split/filter/join on native Column
    expressions, zero shuffles, zero UDFs; at 100 TB this pipelines inside
    the scan stage with full whole-stage codegen.
    """
    lines = F.split(F.col(text_col), "\n")

    def _line_pred(l):  # noqa: E741
        p = (
            F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != ""))
            >= min_words_per_line
        )
        if require_terminal_punct:
            p = p & F.trim(l).rlike(r'[.!?"]$')
        for m in line_drop_markers:
            p = p & ~F.contains(F.lower(l), F.lit(m))
        return p

    kept = F.filter(lines, _line_pred)
    low = F.lower(F.col(text_col))
    doc_ok = F.lit(True)
    for m in doc_drop_markers:
        doc_ok = doc_ok & ~F.contains(low, F.lit(m))
    doc_ok = doc_ok & (F.size(kept) >= min_kept_lines)
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        F.concat_ws("\n", kept).alias("kept_text"),
        doc_ok.alias("keep_doc"),
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str,
    forms: tuple[str, ...] = ("NFC", "NFKC"),
) -> DataFrame:
    """Unicode normalization over a text column — the canonicalization
    pass a multilingual training pipeline runs before tokenization and
    dedup (decomposed sequences, compatibility characters, and visually
    identical codepoints otherwise defeat exact and near-dup hashing).

    One Arrow-batched ``mapInPandas`` pass (CPython ``unicodedata``, the
    UCD reference implementation); emits one ``<form>_text`` column per
    requested form. Scale shape: narrow map, no shuffle; at 100 TB this
    pipelines inside the scan like every other row-local rewrite.
    """
    lower = [f.lower() for f in forms]

    def norm(batches):
        import unicodedata

        for pdf in batches:
            out = pdf.copy()
            for form, lf in zip(forms, lower):
                out[f"{lf}_text"] = [
                    unicodedata.normalize(form, t) if t is not None else None
                    for t in pdf[text_col]
                ]
            yield out

    schema = df.schema.simpleString()[7:-1] + "".join(
        f",{lf}_text string" for lf in lower
    )
    return df.mapInPandas(norm, schema)


def ccnet_lm_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    k: float = 0.5,
    train_pct: int = 80,
    bucket_mode: str = "rank",
) -> DataFrame:
    """CCNet's LM-perplexity filter (Wenzek et al. 2020 §4.3) — the
    companion of :func:`..dedup.line_dedup`'s paragraph dedup: score
    every document with a PER-LANGUAGE add-k-smoothed bigram LM
    (bigrams never cross paragraph boundaries — CCNet scores paragraph
    by paragraph), then split each language's corpus into equal
    head / middle / tail thirds by perplexity. "head" is the cleanest
    (most Wikipedia-like) third; CCNet-style curation keeps head+middle
    and drops tail.

    The LM trains on the deterministic hash-derived train split (same
    ``:split`` convention as ``bigram_logprob_scores``: hash60(doc)%100
    < ``train_pct``), standing in for CCNet's external Wikipedia LM —
    the arithmetic (add-k bigram NLL, length-weighted over paragraphs)
    is the paper's. Document score = Σ nll / Σ bigrams over all its
    paragraphs; ``log_ppl`` is that mean NLL (log of perplexity),
    ``ppl = exp(log_ppl)``. Docs that produce no bigrams (blank/short)
    or whose language has no trained LM go straight to ``tail``.

    ``bucket_mode``:

    - ``"rank"`` (gate/default): exact equal thirds via ``ntile(3)``
      over (lang, log_ppl, doc) — deterministic, SQL-replayable; the
      window sorts one skinny row per DOCUMENT (not per token), so even
      at 100 TB the sorted relation is ~1e10 short rows, but it is
      still a per-language global sort.
    - ``"cutoff"`` (scale path): per-language cutoff scores from
      ``percentile_approx`` on the doc-score table, BROADCAST back —
      no global sort anywhere, the production shape when exact
      equal-thirds membership doesn't matter (CCNet itself computes
      cutoffs on a sample).

    Output: (doc, lang, n_paragraphs, n_bigrams, log_ppl, ppl, bucket,
    keep).

    Scale shape: bigram construction is a native array transform inside
    the scan; LM count tables are map-side-combined aggs keyed by
    (lang, w1[, w2]); scoring is two equi-joins plus a broadcast of the
    per-language vocab row; the only corpus-sized exchange is the
    per-doc aggregation."""
    from ..functions.text import hash60_expr, tokens_expr

    split_bucket = F.pmod(
        hash60_expr(
            F.concat(F.col(id_col).cast("string"), F.lit(":split"))
        ),
        F.lit(100),
    )
    base = df.select(
        F.col(id_col).alias("doc"),
        F.col(lang_col).alias("lang"),
        F.col(text_col).alias("_text"),
        (split_bucket < train_pct).alias("_is_train"),
    )
    paras = base.select(
        "doc",
        "lang",
        "_is_train",
        F.posexplode(F.split("_text", "\n")).alias("pno", "para"),
    ).withColumn("toks", tokens_expr(F.col("para")))
    bg = paras.select(
        "doc",
        "lang",
        "_is_train",
        F.explode(
            # sequence(1, n-1) counts DOWN for n < 2 (INVALID_ARRAY_INDEX);
            # one-token / blank paragraphs emit no bigrams, matching the
            # oracle's empty range(1, len(toks))
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN"
                " transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                " ELSE array() END"
            )
        ).alias("b"),
    ).select("doc", "lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"), "_is_train")
    c2 = (
        bg.filter(F.col("_is_train"))
        .groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    c1 = c2.groupBy("lang", "w1").agg(F.sum("c2").alias("c1"))
    vocab = c2.groupBy("lang").agg(F.countDistinct("w2").alias("vocab"))
    nll = -F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("vocab"))
    )
    scored = (
        bg.join(c2, ["lang", "w1", "w2"], "left")
        .join(c1, ["lang", "w1"], "left")
        # inner join: a language absent from the train split has no LM —
        # its docs keep NULL scores and fall to 'tail' below
        .join(F.broadcast(vocab), "lang")
        .select("doc", nll.alias("nll"))
    )
    doc_scores = scored.groupBy("doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("nll").alias("_sum_nll"),
    )
    doc_paras = paras.groupBy("doc").agg(
        F.sum((F.trim("para") != "").cast("long"))
        .cast("bigint")
        .alias("n_paragraphs")
    )
    lp = F.round(F.col("_sum_nll") / F.col("n_bigrams"), 6)
    out = (
        base.select("doc", "lang")
        .join(doc_paras, "doc", "left")
        .join(doc_scores, "doc", "left")
        .select(
            "doc",
            "lang",
            F.coalesce("n_paragraphs", F.lit(0).cast("bigint")).alias(
                "n_paragraphs"
            ),
            F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias(
                "n_bigrams"
            ),
            lp.alias("log_ppl"),
            # exp of the ALREADY-6dp-rounded mean: a stable input gives a
            # bit-identical double in both engines, so 4dp output is safe
            F.round(F.exp(lp), 4).alias("ppl"),
        )
    )
    if bucket_mode == "rank":
        # NULL scores are excluded from the window (Spark sorts nulls
        # first ASC, DuckDB last — splitting them out keeps both engines'
        # ntile over the identical ordered relation) and assigned 'tail'
        w = W.partitionBy("lang").orderBy(F.col("log_ppl").asc(), F.col("doc").asc())
        tile = F.ntile(3).over(w)
        names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
        ranked = out.filter(F.col("log_ppl").isNotNull()).withColumn(
            "bucket", F.element_at(names, tile)
        )
        nulls = out.filter(F.col("log_ppl").isNull()).withColumn(
            "bucket", F.lit("tail")
        )
        out = ranked.unionByName(nulls)
    elif bucket_mode == "cutoff":
        cuts = (
            out.filter(F.col("log_ppl").isNotNull())
            .groupBy("lang")
            .agg(
                F.percentile_approx(
                    "log_ppl", [1.0 / 3, 2.0 / 3], 10000
                ).alias("_cut")
            )
        )
        out = (
            out.join(F.broadcast(cuts), "lang", "left")
            .withColumn(
                "bucket",
                F.when(F.col("log_ppl").isNull(), F.lit("tail"))
                .when(F.col("log_ppl") <= F.col("_cut")[0], F.lit("head"))
                .when(F.col("log_ppl") <= F.col("_cut")[1], F.lit("middle"))
                .otherwise(F.lit("tail")),
            )
            .drop("_cut")
        )
    else:
        raise ValueError(f"unknown bucket_mode: {bucket_mode!r}")
    return out.withColumn("keep", F.col("bucket") != F.lit("tail"))
