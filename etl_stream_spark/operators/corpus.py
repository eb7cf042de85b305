"""Corpus-level training-data operators: deterministic sampling,
group-aware dataset splits, stopword normalization, cross-document
passage duplication, vocabulary statistics, length histograms.

These extend the reference's data-processing surface toward what a
large-scale LLM training-data pipeline needs (the reference itself stops
at CDC replication — SURVEY §0). Everything is expressed with built-in
``pyspark.sql.functions`` (JVM-side, codegen'd): sampling and splits are
*hash-deterministic*, never ``rand()``, so results are reproducible
across runs, engines, and cluster sizes — the property that makes a
100 TB sample auditable.

Scale notes: hash-sampling and splitting are narrow (no shuffle);
vocabulary and passage stats are explode → partial-agg → shuffle-on-key,
the same shape Spark uses for word count at any scale; histograms
aggregate to a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_stream_spark.operators.text_analysis import STOPWORDS, tokens

#: md5-prefix bucketing: 28 bits keeps the integer below 2^63 on both
#: engines (DuckDB errors on BIGINT overflow where Spark would wrap).
_HASH_BITS_HEX = 7


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from the md5 of a value.

    The engine-portable contract (same value → same bucket in any
    engine): ``int(md5(cast(x as string))[:7], 16) % buckets``.
    """
    c = F.col(col) if isinstance(col, str) else col
    prefix = F.substring(F.md5(c.cast("string")), 1, _HASH_BITS_HEX)
    return F.conv(prefix, 16, 10).cast("long") % buckets


def bucket_sql(expr: str, buckets: int = 100) -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    return (
        f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {_HASH_BITS_HEX}))::BIGINT"
        f" % {buckets})"
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
) -> DataFrame:
    """Keep a per-stratum percentage of rows, chosen by key hash.

    ``rates`` maps stratum value → percentage (0-100). Deterministic and
    stable under re-partitioning: membership depends only on the key,
    so the same document is kept at every scale factor — unlike
    ``df.sample``, whose output depends on partition layout.
    """
    bucket = hash_bucket(key_col)
    rate = F.lit(default_rate)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)


def train_test_split(
    df: DataFrame,
    group_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Assign a ``split`` column (train/valid/test) by *group* hash.

    Group-aware: every row of a group (user, document cluster, session)
    lands in the same split — the leakage guard a model-training
    pipeline needs. Pure projection, no shuffle.
    """
    bucket = hash_bucket(group_col, 100)
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + valid_pct, "valid")
        .otherwise("test"),
    )


def remove_stopwords(
    df: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """Stopword-removal normalization: tokens minus the stopword set,
    re-joined; records how many tokens were dropped."""
    # bind tokens AND the filtered array once per row: both expressions
    # are referenced twice below, and HOF trees are not merged by
    # Spark's subexpression elimination
    df = df.withColumn("_sw_toks", tokens(text_col)).withColumn(
        "_sw_kept", F.filter(F.col("_sw_toks"), lambda t: ~t.isin(*stopwords))
    )
    kept = F.col("_sw_kept")
    return (
        df.withColumn("clean_text", F.array_join(kept, " "))
        .withColumn(
            "n_removed",
            (F.size(F.col("_sw_toks")) - F.size(kept)).cast("long"),
        )
        .drop("_sw_toks", "_sw_kept")
    )


def duplicated_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document exact passage duplication: word ``width``-grams
    occurring in ≥ ``min_docs`` distinct documents.

    The inverted-index shape of exact substring dedup: explode distinct
    n-grams per document (map side), count distinct documents per gram
    (one shuffle on the gram). At 100 TB the gram key is md5-hashable to
    a fixed-width join key; partial aggregation keeps the explode local.
    """
    from etl_stream_spark.operators.dedup import shingles
    from etl_stream_spark.plans.partitioning import ensure_parallelism

    grams = ensure_parallelism(df).select(
        F.col(id_col), F.explode(shingles(text_col, width)).alias("passage")
    )
    # shingles() is distinct within a document, so COUNT(*) equals
    # COUNT(DISTINCT doc): the plain count keeps map-side combine and
    # skips the two-phase distinct aggregation entirely.
    return (
        grams.groupBy("passage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def vocabulary(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary: term frequency + document frequency per token.

    Classic word-count: explode → partial agg → single shuffle on the
    token. ``doc_freq`` uses count-distinct over the doc id, which AQE
    plans as a two-stage aggregate at scale.
    """
    exploded = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    return exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct(id_col).alias("doc_freq"),
    )


def tf_idf(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per (document, token) TF-IDF: ``tf * ln(N / df)``.

    Two aggregations over the exploded token stream (per-doc term
    frequency, per-token document frequency) joined back on the token;
    the document count is a broadcast single row. All counts are exact
    integers; the only float math is the final ``ln`` + multiply, the
    identical expression on any engine.
    """
    # Deliberately NOT repartition("token")-then-aggregate (which would
    # collapse to one exchange): that exchanges RAW exploded tokens with
    # no map-side combine and Zipf-skews hot tokens onto one partition.
    # Three exchanges that each carry pre-aggregated rows beat one
    # exchange of the raw stream at corpus scale.
    exploded = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = exploded.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency derives from tf's (doc, token) rows — no second
    # explode pass, and this shuffle carries distinct pairs, not tokens
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(dfreq, "token")
        .join(F.broadcast(n_docs))
        .select(
            id_col,
            "token",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )


def length_histogram(
    df: DataFrame, length_col: str = "n_chars", bucket_width: int = 50
) -> DataFrame:
    """Document-length histogram with corpus share per bucket."""
    bucket = (
        F.floor(F.col(length_col) / bucket_width).cast("long") * bucket_width
    ).alias("bucket_lo")
    counts = df.groupBy(bucket).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("total"))
    return counts.join(F.broadcast(total)).select(
        "bucket_lo",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total").cast("double"), 6).alias(
            "share"
        ),
    )


#: Context-window chunking defaults: 32-token windows, stride 16
#: (50% overlap) — the sequence-packing prep step of an LLM pipeline.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 16


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into overlapping token windows.

    Narrow plan: tokenize once (let-bound), ``posexplode`` the 1-based
    window starts ``sequence(1, n_tokens, stride)``, slice per start —
    no shuffle, output rows ≈ rows × n_tokens/stride. Each chunk carries
    its ordinal, start offset, token count (the tail chunk may be
    short), and an md5 fingerprint of the joined tokens so downstream
    chunk-level dedup needs no text column. Empty documents produce no
    chunks.
    """
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks")).filter(
        F.size("_toks") > 0
    )
    exploded = toked.select(
        id_col,
        "_toks",
        F.posexplode(F.sequence(F.lit(1), F.size("_toks"), F.lit(stride))).alias(
            "chunk_index", "start"
        ),
    )
    chunk = F.slice(F.col("_toks"), F.col("start"), window)
    return exploded.select(
        id_col,
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("start").cast("long").alias("start_token"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


#: Sequence-packing defaults: pack chunks into 64-token bins inside 8
#: independent md5 shards.
PACK_TARGET = 64
PACK_SHARDS = 8


def pack_chunks(
    chunks: DataFrame,
    target: int = PACK_TARGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Offset-based sequence packing of token chunks into fixed bins.

    Scale-first formulation of greedy packing: chunks are sharded by a
    deterministic md5 bucket of ``doc_id`` and, *within a shard*, laid
    out in (doc_id, chunk_index) order; a chunk belongs to the bin
    where its running token offset starts (``floor(offset/target)``).
    A chunk that straddles a bin boundary stays in the bin it starts in
    (bins may overflow by < one chunk) — the price of making packing a
    per-shard window instead of sequential driver state. Shards are
    independent, so the window never needs a global sort: at 100 TB,
    raise ``shards`` and every partition packs in parallel.
    """
    from pyspark.sql import Window

    shard = hash_bucket(F.col("doc_id"), shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = chunks.withColumn("shard", shard).withColumn(
        "offset", F.sum("chunk_tokens").over(w) - F.col("chunk_tokens")
    )
    return (
        laid.withColumn("bin", F.floor(F.col("offset") / target).cast("long"))
        .groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("chunk_tokens").cast("long").alias("bin_tokens"),
        )
    )


def training_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Deterministic pseudo-random training order, without a global sort.

    Global position = (shard, pos_in_shard): the shard is an md5 bucket
    of the id (seed-independent, so shards stay stable across epochs)
    and within-shard order is a rank over ``md5(seed || id)`` — change
    the seed to get an uncorrelated new permutation. Each shard sorts
    independently (one window per partition group, never a single
    global ordering task); readers consume shards round-robin. Unlike
    ``orderBy(rand())``, re-running at any parallelism yields the same
    permutation — the reproducibility a training run needs.
    """
    from pyspark.sql import Window

    c = F.col(id_col)
    sort_key = F.md5(F.concat(F.lit(seed), F.lit(":"), c.cast("string")))
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        df.select(
            c,
            hash_bucket(c, shards).alias("shard"),
            sort_key.alias("sort_key"),
        )
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos_in_shard", "sort_key")
    )


def contamination_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 3,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Train→eval contamination audit: for every *eval* (valid/test)
    document, how many of its ``width``-token shingles also occur in any
    *train* document.

    The standard pre-training hygiene check (eval sets leaking into the
    training corpus). Scale shape: shingles are hashed to 60-bit
    integers *before* the exchange (the shuffle carries 8-byte longs,
    never gram strings), the train side is reduced to distinct hashes,
    and the overlap is an equi-join on the hash — work is
    O(total shingles), never a document cross join. Hash collisions are
    engine-portable (same md5-prefix contract as :func:`hash_bucket`),
    so both engines over/under-count identically.
    """
    from etl_stream_spark.operators.dedup import shingles

    split_df = train_test_split(df, id_col, train_pct, valid_pct)
    gh = F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10).cast("long")
    grams = split_df.select(
        F.col(id_col), "split", F.explode(shingles(text_col, width)).alias("sh")
    ).select(id_col, "split", gh.alias("gh"))
    train = grams.filter(F.col("split") == "train").select("gh").distinct()
    ev = grams.filter(F.col("split") != "train")
    totals = ev.groupBy(id_col, "split").agg(
        F.countDistinct("gh").alias("n_shingles")
    )
    hits = (
        ev.join(train, "gh")
        .groupBy(id_col)
        .agg(F.countDistinct("gh").alias("n_contaminated"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "split",
            "n_shingles",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            F.round(
                F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double")
                / F.col("n_shingles"),
                6,
            ).alias("contamination_rate"),
        )
    )


def source_report(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source curation audit — the domain-level report a web-scale
    pipeline runs before deciding which sources to keep, downweight, or
    drop (the RefinedWeb/C4 URL-level curation step, aggregated).

    Per source: document count, documents participating in corpus-wide
    exact duplication (md5 fingerprint shared with >= 2 docs anywhere,
    not just within the source), total token volume, and the share of
    documents passing the C4-style quality filter.

    Scale shape: fingerprint counting is one shuffle on the 32-hex
    digest with map-side partial aggregation; the dup flag joins back on
    the same key (AQE merges the exchanges); the final rollup shuffles
    |sources| rows. No collects, no UDFs.
    """
    from etl_stream_spark.operators.text_analysis import fingerprint, with_quality_score

    fp = df.select(F.col(source_col), fingerprint(text_col).alias("_fp"))
    dup_fps = (
        fp.groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("_fp")
    )
    scored = with_quality_score(df, text_col).select(
        F.col(source_col), fingerprint(text_col).alias("_fp"), "n_tokens", "quality_keep"
    )
    flagged = scored.join(
        dup_fps.withColumn("_is_dup", F.lit(True)), "_fp", "left"
    )
    return (
        flagged.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("_is_dup"), 1).otherwise(0)).cast("long").alias("n_dup_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(
                F.sum(F.when(F.col("quality_keep"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("keep_rate"),
        )
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 3,
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-wide boilerplate removal (the CCNet/RefinedWeb line-dedup
    shape): drop from every document the aligned ``width``-token
    segments that occur in ≥ ``min_docs`` distinct documents, and
    reassemble the survivors in original order.

    Where :func:`duplicated_passages` only REPORTS cross-document
    repetition, this op performs the removal — the transform that
    strips navigation chrome, license headers, and template text from
    a web corpus before training. Segments are non-overlapping (unlike
    the overlapping shingles of the dedup family), so removal is
    well-defined: a token belongs to exactly one segment.

    Scale shape: segment frequencies are one shuffle on the segment key
    with map-side combine (within-doc distinct first); the common-set
    membership test is a shuffle equi-join (left_anti) on the same key —
    never a broadcast, since the common set grows with the corpus.
    Reassembly is a per-document sort of its own kept positions.

    Returns (id_col, clean_text, n_segments, n_removed).
    """
    from etl_stream_spark.operators.dedup import _let

    def _segment(toks: Column) -> Column:
        # toks is let-bound: referencing it inside the per-segment
        # lambda would otherwise re-run the tokenizer once per segment
        # (O(n²/width) per row instead of O(n))
        n_segs = F.ceil(F.size(toks) / F.lit(width)).cast("int")
        return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
            )
        )

    # NOT checkpointed despite three plan consumers: the subtree is a
    # map-only scan+segment whose 3× recompute measured CHEAPER than
    # materializing the segmented corpus for column-pruned consumers
    # (count-style actions prune clean_text entirely: 0.28 s recompute
    # vs 0.52 s checkpointed at sf0.1; the full computation favored the
    # checkpoint only 1.6×, a wash at scale for map-only lineage)
    base = df.select(
        F.col(id_col), _let(tokens(text_col), _segment).alias("_segs")
    )
    ex = base.select(id_col, F.posexplode("_segs").alias("_pos", "_seg"))
    dfreq = (
        ex.select(id_col, "_seg")
        .distinct()
        .groupBy("_seg")
        .agg(F.count(F.lit(1)).alias("_n_docs"))
    )
    common = dfreq.filter(F.col("_n_docs") >= min_docs).select("_seg")
    kept = (
        ex.join(common, "_seg", "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_seg"))),
                    lambda x: x["_seg"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    return (
        base.select(id_col, F.size("_segs").cast("long").alias("n_segments"))
        .join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_segments",
            (F.col("n_segments") - F.coalesce(F.col("_n_kept"), F.lit(0))).cast(
                "long"
            ).alias("n_removed"),
        )
    )


def source_concentration(
    df: DataFrame,
    source_col: str = "source",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Lorenz curve + Gini coefficient of corpus weight by source.

    The concentration audit a data-governance review asks for before
    training: how unequal is the corpus across its sources, and which
    sources carry the cumulative mass?  Sources are ranked ASCENDING by
    total weight (ties broken by source name, so the curve is unique);
    the Gini is the closed discrete form over the sorted totals,

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x)),

    computed ENTIRELY in exact integer space (decimal(38,0) products —
    the rank-weighted sum at 100 TB exceeds BIGINT) with the final
    6-dp share/Gini rounding done half-up as an integer division
    (``(2*num*1e6 + den) div (2*den)``, both terms non-negative since
    the ascending sort makes the numerator >= 0) — no float arithmetic
    anywhere, so the report is bit-deterministic at any partitioning.

    Scale shape: one map-side-combinable aggregation on the source key;
    every window below it runs over the PER-SOURCE frame, whose size is
    the source-domain cardinality, not the corpus row count.

    Returns one row per source: (source, n_docs, total_weight,
    cum_weight, cum_share_ppm, gini_ppm) — gini_ppm constant across
    rows, parts-per-million.
    """
    g = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(weight_col).cast("long")).alias("total_weight"),
    )
    order = [F.col("total_weight").asc(), F.col("source").asc()]
    w_ord = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_full = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    staged = (
        g.withColumn("_i", F.row_number().over(Window.orderBy(*order)))
        .withColumn("cum_weight", F.sum("total_weight").over(w_ord))
        .withColumn("_n", F.count(F.lit(1)).over(w_full))
        .withColumn("_s", F.sum("total_weight").over(w_full))
        # the multiply itself is decimal (rank · weight can pass 2^63 at
        # corpus scale; the oracle multiplies in HUGEINT)
        .withColumn(
            "_iw", F.sum(d(F.col("_i")) * d(F.col("total_weight"))).over(w_full)
        )
    )
    staged = staged.withColumn(
        "_num", 2 * F.col("_iw") - d(F.col("_n") + 1) * d(F.col("_s"))
    ).withColumn("_den", d(F.col("_n")) * d(F.col("_s")))
    # half-up rounding as exact integral division (`div` on decimals
    # returns the exact integral quotient as BIGINT in Spark, `//` on
    # HUGEINT in DuckDB) — both numerators are >= 0 by construction
    share = F.expr(
        "cast((2 * cast(cum_weight as decimal(38,0)) * 1000000 + _s)"
        " div (2 * cast(_s as decimal(38,0))) as long)"
    )
    gini = F.expr("cast((2 * _num * 1000000 + _den) div (2 * _den) as long)")
    return staged.select(
        "source",
        "n_docs",
        "total_weight",
        "cum_weight",
        share.alias("cum_share_ppm"),
        gini.alias("gini_ppm"),
    )
