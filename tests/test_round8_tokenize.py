"""Round-8 tokenize-once optimizations: the restructured operators must
be VALUE-identical to the forms they replaced — the speedups (one isin
filter per language instead of per-marker scans, bound token columns,
in-row pair generation instead of the pairing self-join) all rest on
algebraic equivalences that these tests pin row-for-row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    from etl_stream_spark.session import load_table

    return load_table(spark, SF_SMOKE, "documents")


class TestTokenizeOnceEquivalence:
    def test_language_scores_equal_per_marker_sums(self, spark, docs):
        """One isin filter per language ≡ the sum of per-marker counts
        (markers are distinct strings, so a token matches at most one) —
        the algebraic fact the 25→5-scan rewrite rests on."""
        from etl_stream_spark.operators import text_analysis as ta

        langs = sorted(ta.LANG_MARKERS)
        lid = ta.with_language_id(docs).select(
            "doc_id", *[f"score_{l}" for l in langs]
        )
        brute = docs.withColumn("_t", ta.tokens("text"))
        for lang in langs:
            score = None
            for w in ta.LANG_MARKERS[lang]:
                c = ta._count_token(F.col("_t"), w)
                score = c if score is None else score + c
            brute = brute.withColumn(f"b_{lang}", score.cast("long"))
        joined = lid.join(brute.select("doc_id", *[f"b_{l}" for l in langs]), "doc_id")
        mismatched = joined.filter(
            " or ".join(f"score_{l} <> b_{l}" for l in langs)
        ).count()
        assert mismatched == 0

    def test_toks_col_reuse_paths_identical(self, spark, docs):
        """Each helper's toks_col fast path must return exactly the
        default path's frame (the funnel rides all three at once)."""
        from etl_stream_spark.operators import text_analysis as ta

        bound = docs.withColumn("_toks", ta.tokens("text"))

        q_cols = ["doc_id", "n_tokens", "stopword_ratio", "punct_ratio", "quality_keep"]
        assert _rows(ta.with_quality_score(docs).select(*q_cols)) == _rows(
            ta.with_quality_score(bound, toks_col="_toks").select(*q_cols)
        )

        l_cols = ["doc_id", "predicted_lang"] + [
            f"score_{l}" for l in sorted(ta.LANG_MARKERS)
        ]
        assert _rows(ta.with_language_id(docs).select(*l_cols)) == _rows(
            ta.with_language_id(bound, toks_col="_toks").select(*l_cols)
        )

        r_cols = [
            "doc_id",
            "n_tokens",
            "top_bigram_frac",
            "top_trigram_frac",
            "max_token_run",
            "repetition_keep",
        ]
        assert _rows(ta.with_repetition_stats(docs).select(*r_cols)) == _rows(
            ta.with_repetition_stats(bound, toks_col="_toks").select(*r_cols)
        )

    def test_toks_col_survives_the_helper_chain(self, spark, docs):
        """The funnel chains all three helpers on one bound column; no
        helper may drop or clobber a caller-owned toks_col."""
        from etl_stream_spark.operators import text_analysis as ta

        chained = ta.with_repetition_stats(
            ta.with_quality_score(
                ta.with_language_id(
                    docs.withColumn("_toks", ta.tokens("text")), toks_col="_toks"
                ),
                toks_col="_toks",
            ).drop("n_tokens"),
            toks_col="_toks",
        )
        assert "_toks" in chained.columns
        # and the chain's flags equal the independently computed ones
        solo = ta.with_repetition_stats(docs).select("doc_id", "repetition_keep")
        assert _rows(chained.select("doc_id", "repetition_keep")) == _rows(solo)


class TestInRowPairGeneration:
    def test_pair_multiset_equals_self_join(self, spark):
        """part_copurchase_triangles' in-row C(k,2) expansion must equal
        the two-sided self-join's pair multiset — including single-item
        groups (no pairs) and pre-distinct duplicate rows."""
        rows = [
            (1, 10), (1, 20), (1, 30), (1, 30),  # dup (order,part) row
            (2, 20), (2, 10),                     # unsorted input order
            (3, 5),                               # singleton: no pairs
            (4, 7), (4, 7),                       # dup-only: no pairs
        ]
        li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long").distinct()

        x, y = li.alias("x"), li.alias("y")
        join_pairs = x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        ).select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))

        parts = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("_ps")
        )
        inrow_pairs = parts.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ps, (x, i) -> "
                    "transform(slice(_ps, i + 2, size(_ps)), "
                    "y -> struct(x as a, y as b))))"
                )
            ).alias("_p")
        ).select("_p.a", "_p.b")

        assert _rows(join_pairs) == _rows(inrow_pairs)
        assert _rows(inrow_pairs) == [(10, 20), (10, 20), (10, 30), (20, 30)]

    def test_triangle_stats_checkpoint_preserves_census(self, spark):
        """The lazily checkpointed edge frame must not change the census
        (a known 4-clique: 4 nodes, 6 edges, 12 wedges, 4 triangles)."""
        from etl_stream_spark.operators.graph import triangle_stats

        edges = spark.createDataFrame(
            [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
            "a long, b long",
        )
        row = triangle_stats(edges).collect()[0]
        assert (
            row["n_nodes"],
            row["n_edges"],
            row["n_wedges"],
            row["n_triangles"],
        ) == (4, 6, 12, 4)
        assert row["global_clustering"] == 1.0
