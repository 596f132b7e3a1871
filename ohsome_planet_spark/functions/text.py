"""Text-analysis function surface for training-data pipelines: tokenization,
quality scoring, language-ID heuristic, fingerprinting, and the
deterministic cross-engine hash primitive used by the dedup family.

Everything here is a native Spark Column expression (JVM-side, inside
whole-stage codegen) with an exactly-equivalent ANSI/DuckDB SQL form used by
the correctness oracles — the md5-based 60-bit hash is the bridge, since
both engines produce identical md5 hex for identical strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tokenization shared by every text operator: lowercase, split on non-word
# runs, drop empties. DuckDB twin:
#   list_filter(regexp_split_to_array(lower(t), '\W+'), x -> x <> '')
TOKEN_SPLIT_RE = r"\W+"


def tokens_expr(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def hash60_expr(s: Column) -> Column:
    """Deterministic 60-bit hash of a string: first 15 hex chars of md5.

    DuckDB twin: ``('0x' || substr(md5(s), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def hash60_sql(s: str) -> str:
    return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


# --- quality scoring ---------------------------------------------------------

STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with for on".split()
)


def punct_ratio_expr(text: Column) -> Column:
    """punctuation chars / total chars."""
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def mean_token_len_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score_expr(text: Column) -> Column:
    """Heuristic document quality in [0,1]: long enough, some stopwords
    (signals natural language), not punctuation-soup, sane word lengths."""
    n_tok = token_count_expr(text).cast("double")
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    stop = stopword_ratio_expr(text)
    stop_score = F.least(stop * F.lit(4.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - punct_ratio_expr(text) * F.lit(4.0), F.lit(0.0))
    mtl = mean_token_len_expr(text)
    mtl_score = F.when((mtl >= 2.5) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        len_score * F.lit(0.4)
        + stop_score * F.lit(0.2)
        + punct_penalty * F.lit(0.2) * mtl_score
        + mtl_score * F.lit(0.2),
        6,
    )


# --- language-ID n-gram/stopword heuristic -----------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "que", "pas", "pour"),
    "es": ("el", "la", "los", "las", "es", "una", "que", "por", "con", "para"),
}


def lang_scores_expr(text: Column) -> dict[str, Column]:
    toks = tokens_expr(text)
    n = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))) / n
        for lang, markers in LANG_MARKERS.items()
    }


def lang_guess_expr(text: Column, min_ratio: float = 0.05) -> Column:
    """Pick the language whose marker-stopword ratio is highest (and above
    ``min_ratio``), else 'und' (undetermined; BCP-47 convention)."""
    scores = lang_scores_expr(text)
    pairs = F.array(
        *[F.struct(score.alias("score"), F.lit(lang).alias("lang")) for lang, score in scores.items()]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] >= min_ratio, best["lang"]).otherwise(F.lit("und"))


# --- fingerprinting -----------------------------------------------------------

FP_MOD = 2147483647  # 2^31 - 1; keeps the rolling product inside int64 both engines


def fingerprint_expr(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    per-token 60-bit hashes, mod 2^31-1.

    DuckDB twin:
      list_reduce(list_prepend(0::BIGINT, [hash60(t) % m for t in tokens]),
                  (a, b) -> (a * 31 + b) % m)
    """
    toks = tokens_expr(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * F.lit(31) + F.pmod(hash60_expr(t), F.lit(FP_MOD)))
        % F.lit(FP_MOD),
    )


# --- repetition metrics (Gopher-style quality rules) -------------------------
#
# Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) gate
# training documents on repetition: the fraction of duplicated tokens and
# the fraction of the document covered by its most frequent n-gram. The
# per-document parts below are pure array expressions (codegen, no
# shuffle); the corpus-level "top n-gram per document" is a distributed
# explode + two-phase count in the query layer.


def ngrams_expr(text: Column, n: int) -> Column:
    """Token n-grams as space-joined strings, order-preserving.

    DuckDB twin:
      list_transform(generate_series(1, greatest(len(toks)-(n-1), 0)),
                     i -> array_to_string(toks[i:i+(n-1)], ' '))
    (DuckDB list slices are 1-based and end-inclusive.)
    """
    toks = tokens_expr(text)
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of yielding an empty
    # array, so short documents need an explicit guard or slice() sees a
    # zero start and throws.
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_token_fraction_expr(text: Column) -> Column:
    """1 - distinct_tokens/total_tokens: the mass of repeated words.

    DuckDB twin:
      CASE WHEN len(toks) = 0 THEN 0.0
           ELSE 1.0 - len(list_distinct(toks)) / len(toks) END
    (the empty document is defined as unrepeated, not fully repeated).
    """
    toks = tokens_expr(text)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks)
    )


# --- PII scrubbing -----------------------------------------------------------
#
# Regexes are deliberately restricted to the syntax subset Java regex and
# DuckDB's RE2 interpret identically (char classes, bounded repeats, \b,
# \d) so the Spark plan and the SQL oracle redact byte-identically.

PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii_expr(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and NANP-style phone suffixes with
    typed placeholder tokens (applied in PII_PATTERNS order, so an IP
    inside an email is consumed by the email rule first)."""
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count_expr(text: Column, pattern: str) -> Column:
    """How many matches of one PII pattern a document contains.

    DuckDB twin: len(regexp_extract_all(text, pattern)).
    """
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
