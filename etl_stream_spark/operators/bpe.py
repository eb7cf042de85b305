"""On-engine BPE tokenizer training (byte-pair-encoding merge learning).

`bpe_pair_counts` (catalog) is ONE merge-selection step; this module
runs the full training loop at corpus scale and applies the learned
merges — the tokenizer-fitting stage of an LLM data pipeline, executed
on the engine instead of a single-node tokenizer trainer.

Loop structure (the k-means/connected-components pattern of this repo):
all data-side work is per-iteration DataFrame jobs over the *word
frequency table* (bounded by vocabulary size, NOT corpus size — raw
text is scanned exactly once up front); the driver collects exactly one
row per iteration (the argmax pair). At 100 TB the word table is a few
million rows; each iteration is a map-only pair-explode + one partial
aggregation on it.

Determinism: the argmax pair is tie-broken (count desc, left, right);
the greedy leftmost-first merge application is a sequential fold inside
``F.aggregate`` — no Python in the loop body, no randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_stream_spark.operators.text_analysis import tokens

SYMS_COL = "_syms"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table with initial per-character symbols.

    One scan of the raw text; everything downstream runs on this table.
    """
    words = docs.select(F.explode(tokens(text_col)).alias("w"))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")), lambda i: F.col("w").substr(i, F.lit(1))
    )
    return wf.withColumn(SYMS_COL, chars)


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts."""
    syms = F.col(SYMS_COL)
    pairs = F.zip_with(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        wf.select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("n").alias("pair_count"))
    )


def merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost-first replacement of the adjacent pair
    ``(left, right)`` with the fused symbol — a sequential fold, so
    overlapping occurrences resolve exactly like reference BPE
    ("aaa" + merge(a,a) → ["aa", "a"])."""
    fused = left + right
    has_pair = F.exists(
        F.zip_with(
            F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            lambda a, b: (a == F.lit(left)) & (b == F.lit(right)),
        ),
        lambda x: x,
    )
    folded = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(has_pair, folded).otherwise(syms)


def train_bpe(
    wf: DataFrame, n_merges: int, min_pair_count: int = 2
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    Returns (merge table rows ``(step, left, right, pair_count)``, the
    final symbolized word table). Each iteration: one pair-count
    aggregation, a single-row argmax collect, one map-only re-fold;
    the word table is ``localCheckpoint``-ed per step so the plan stays
    flat across iterations.
    """
    cur = wf.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("pair_count"), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["pair_count"])
        merges.append((step, left, right, cnt))
        cur = cur.withColumn(SYMS_COL, merge_pair(F.col(SYMS_COL), left, right))
        cur = cur.localCheckpoint(eager=True)
    return merges, cur


def encode_stats(
    docs: DataFrame, vocab: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token statistics under the trained tokenizer.

    Joins each document's words against the symbolized vocabulary
    (words unseen at training time fall back to character count) and
    sums BPE token counts — the compression the tokenizer achieves,
    per document. The vocab side is bounded (vocabulary-sized) and
    broadcast; the document side is never shuffled.
    """
    per_word = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    )
    costs = vocab.select(
        "w", F.size(F.col(SYMS_COL)).cast("long").alias("_bpe_len")
    )
    joined = per_word.join(F.broadcast(costs), "w", "left").withColumn(
        "_cost", F.coalesce(F.col("_bpe_len"), F.length("w").cast("long"))
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("w")).cast("long").alias("n_chars"),
        F.sum("_cost").cast("long").alias("n_bpe_tokens"),
    )
    # 6-dp ratio rounded in EXACT integer space (repo determinism rule:
    # a rational of two counts can land exactly on a .5 at the 6th
    # decimal, where double ROUND's tie behavior diverges between
    # engines); both sums are positive so no sign branch is needed.
    # ppm bound: the grouping key is ONE document, so 2·n_bpe_tokens·1e6
    # wraps BIGINT only past a ~4.6e12-character single document —
    # unreachable at any envelope (per-digit/per-source global counts
    # are the sites that need the decimal(38,0) numerator instead)
    q = F.expr("(2 * n_bpe_tokens * 1000000 + n_chars) div (2 * n_chars)")
    return agg.select(
        id_col,
        "n_words",
        "n_chars",
        "n_bpe_tokens",
        (q.cast("double") / F.lit(1e6)).alias("tokens_per_char"),
    )
