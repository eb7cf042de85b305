"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

All column-level (``pyspark.sql.functions`` only — JVM-side, codegen'd,
no Python in the row loop). Each has an exact ANSI-SQL twin for the
DuckDB oracle; tokenization is shared by the dedup operators so shingles
and fingerprints agree across the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tokenizer contract (shared with the SQL oracle): lowercase, split on
#: runs of non-alphanumerics, drop empty tokens.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: Small English stopword core used for the quality ratio.
STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

#: Marker tokens per language for the n-gram/marker language-ID
#: heuristic. Scoring = count of marker-token occurrences; highest score
#: wins, ties break by language code order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "shi", "le", "wo", "bu"),
}


def tokens(col: Column | str) -> Column:
    """text → array of normalized tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def normalized_text(col: Column | str) -> Column:
    """Canonical form used for fingerprints/exact dedup: tokens re-joined
    with single spaces (case/punctuation/whitespace insensitive)."""
    return F.array_join(tokens(col), " ")


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text."""
    return F.md5(normalized_text(col))


def _count_token(toks: Column, word: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == F.lit(word)))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics."""
    toks = tokens(text_col)
    return df.select(
        "*",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t).cast("long")),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features: stopword ratio, non-alnum
    ratio, and a keep/drop flag (the C4-style length+stopword filter)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    raw_len = F.length(F.col(text_col))
    n_alnum_sp = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""))
    stop_ratio = F.round(
        F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0)), 6
    )
    punct_ratio = F.round(
        F.when(raw_len > 0, (raw_len - n_alnum_sp).cast("double") / raw_len).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return df.select(
        "*",
        n_tok.cast("long").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        ((n_tok >= 5) & (punct_ratio < F.lit(0.3))).alias("quality_keep"),
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID. Produces per-language scores and the
    argmax prediction (ties break by language code order)."""
    toks = tokens(text_col)
    out = df.withColumn("_toks", toks)
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        score = None
        for w in LANG_MARKERS[lang]:
            c = _count_token(F.col("_toks"), w)
            score = c if score is None else score + c
        out = out.withColumn(f"score_{lang}", score.cast("long"))
        score_cols.append(f"score_{lang}")
    # argmax with deterministic tie-break: first language (sorted order)
    # reaching the max score.
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = None
    for lang in sorted(LANG_MARKERS, reverse=True):
        cur = F.lit(lang)
        # reverse iteration: alphabetically-earlier languages overwrite
        # later ones → first language hitting the max wins.
        pred = cur if pred is None else F.when(F.col(f"score_{lang}") == best, cur).otherwise(pred)
    out = out.withColumn("predicted_lang", pred)
    return out.drop("_toks")


ROLLING_BASE = 131
ROLLING_PRIME = 2_147_483_647  # 2^31-1: keeps every Horner step < 2^39


def rolling_fingerprint(col: Column | str) -> Column:
    """Rabin-Karp polynomial rolling hash over the token stream:
    ``h = fold(tokens, (acc, t) -> (acc*B + md5_28(t)) mod p)`` — an
    order-sensitive fingerprint (anagram documents hash differently,
    unlike a bag-of-tokens digest). One sequential fold per document,
    JVM-side via ``F.aggregate``; 28-bit token hashes and B=131 keep
    every intermediate below 2^39, safe for engines that error on
    64-bit overflow. Empty documents hash to 0."""
    h = F.transform(
        tokens(col),
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long"),
    )
    return F.aggregate(
        h,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_PRIME,
    )
