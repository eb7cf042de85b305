"""Deduplication operators for large text corpora.

Five strategies, all shuffle-disciplined for 100 TB corpora:

* **exact** — hash-groupBy on a canonical fingerprint. One shuffle on
  the 16-byte digest; group sizes are near-1 so no skew.
* **n-gram Jaccard** — exact set similarity over token shingles, blocked
  by a key (default: a shared MinHash band) so the pair space is an
  equi-join, never a cross join.
* **MinHash + LSH** — k min-hashes over 3-token shingles, banded;
  documents sharing a band bucket are candidate near-dups. Classic
  Broder sketch: P[minhash match] = Jaccard. Each shingle is md5-hashed
  ONCE; the k per-seed hashes are a universal-hash family
  ``(a_j * h + b_j) mod p`` over the digest prefix — integer ops instead
  of k digests per shingle, and the min-aggregation shuffles 8-byte
  longs instead of 32-char hex strings.
* **SimHash** — 60-bit sign-aggregated token-hash fingerprint; near-dups
  have small Hamming distance.
* **embedding cosine** — see ``similarity.py``; near-dup = cosine above
  threshold among LSH-bucketed candidates.

Every hash bottoms out in md5 of a string plus integer arithmetic, both
engine-independent, so the ANSI-SQL oracle reproduces results bit-exact.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_stream_spark.operators.text_analysis import fingerprint, tokens
from etl_stream_spark.plans.partitioning import ensure_parallelism

SHINGLE_WIDTH = 3


def _let(value: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``value`` once and
    bind it as a lambda variable inside ``body``.

    Implemented as ``element_at(transform(array(value), body), 1)``.
    Without this, any expression referenced repeatedly *inside* a
    higher-order-function lambda is re-evaluated per element — Spark's
    subexpression elimination does not reach into lambda bodies, so e.g.
    a tokenizer re-splits the whole document for every shingle position
    (measured ~10× slower on the passage operators).
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles(col: Column | str, width: int = SHINGLE_WIDTH) -> Column:
    """Distinct ``width``-token shingles of the normalized token stream.

    ``sequence(0, size-width)`` + ``transform`` stays JVM-side; documents
    shorter than ``width`` tokens contribute their full token-join as a
    single shingle so they still participate. The token array is
    let-bound so tokenization happens once per document, not once per
    shingle position.
    """

    def build(ts: Column) -> Column:
        n = F.size(ts)
        full = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - width),
                lambda i: F.array_join(F.slice(ts, i + 1, width), " "),
            )
        )
        return F.when(n >= width, full).otherwise(F.array(F.array_join(ts, " ")))

    return _let(tokens(col), build)


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group documents by canonical fingerprint: one row per distinct
    content with the representative (min id) and copy count."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("rep_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


#: Mersenne prime 2^31-1: universal-hash modulus. With 28-bit digest
#: prefixes and 28-bit coefficients the products stay < 2^59 — no 64-bit
#: overflow in any engine (DuckDB errors on BIGINT overflow, Spark ANSI
#: mode too, so staying in range is a correctness requirement).
MINHASH_PRIME = 2_147_483_647
_DIGEST_PREFIX_HEX = 7  # 28 bits of the md5 digest

#: Fixed odd 28-bit multipliers for the ROLLING shingle hash: a 3-token
#: shingle hashes as (h(t1)*W_A + h(t2)*W_B + h(t3)) mod p over per-token
#: md5-prefix hashes — the Rabin-Karp-style combination every rolling
#: fingerprint uses. Tokens are hashed ONCE each instead of building one
#: string + one md5 per shingle position (measured 2.3× faster at 10M
#: docs; the shingle-string build, not the hashing, dominated). Position
#: matters (W_A ≠ W_B), products stay < 2^57.6.
W_A = 268_435_399
W_B = 268_435_367


def minhash_params(j: int) -> tuple[int, int]:
    """Deterministic 28-bit universal-hash coefficients for seed ``j``
    (md5-derived so the SQL oracle regenerates them identically)."""
    a = int(hashlib.md5(f"mh_a{j}".encode()).hexdigest()[:_DIGEST_PREFIX_HEX], 16) | 1
    b = int(hashlib.md5(f"mh_b{j}".encode()).hexdigest()[:_DIGEST_PREFIX_HEX], 16)
    return a, b


def _md5_prefix_hash(col: Column) -> Column:
    """28-bit integer from the md5 hex prefix — the engine-portable
    base hash (DuckDB: ``('0x' || substr(md5(x), 1, 7))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, _DIGEST_PREFIX_HEX), 16, 10).cast("long")


def shingle_hashes(col: Column | str, width: int = SHINGLE_WIDTH) -> Column:
    """Integer hash per ``width``-token shingle via the ROLLING scheme:
    per-token md5-prefix hashes combined positionally
    (``(h_i*W_A + h_{i+1}*W_B + h_{i+2}) mod p`` for width 3). Documents
    shorter than ``width`` tokens hash their full joined text so they
    still participate (one md5 — rare, so cheap).

    This is the minhash base-hash family: tokens are digested ONCE each
    instead of materializing one shingle string + one md5 per position.
    Only width ≤ 3 positional multipliers are defined."""
    if width != 3:
        raise ValueError("rolling shingle hash is defined for width=3")

    def roll(hs: Column) -> Column:
        n = F.size(hs)
        full = F.transform(
            F.sequence(F.lit(0), n - width),
            lambda i: (
                F.element_at(hs, i + 1) * W_A
                + F.element_at(hs, i + 2) * W_B
                + F.element_at(hs, i + 3)
            )
            % MINHASH_PRIME,
        )
        return F.when(n >= width, full)

    def build(ts: Column) -> Column:
        fallback = F.array(_md5_prefix_hash(F.array_join(ts, " ")))
        return F.coalesce(_let(F.transform(ts, _md5_prefix_hash), roll), fallback)

    return _let(tokens(col), build)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
) -> DataFrame:
    """Per-document MinHash signature:
    ``mh_j = min((a_j*h + b_j) mod p)`` over the document's rolling
    shingle hashes (:func:`shingle_hashes`), k integer perturbations.

    ZERO-shuffle map: shingle hashes and their mins are computed INSIDE
    the row with higher-order functions — no shingle strings, no
    explode, no aggregation exchange. The earlier explode→groupBy form
    materialized one row per (doc, shingle) — ~10⁹ short-string
    InternalRows at 10M docs — and that row/string machinery, not the
    hashing, dominated (measured 229 s of a 274 s pipeline at 32 cores,
    plateauing past 16 cores; the rolling in-row form runs the same
    10M docs in ~99 s and scales with the scan). The hash transform is
    let-bound so digests are computed once, not once per seed.
    """
    sh = ensure_parallelism(df).select(
        F.col(id_col), shingle_hashes(text_col).alias("_hv")
    )

    def mins(hvs: Column) -> Column:
        cols = []
        for j in range(num_hashes):
            a, b = minhash_params(j)
            cols.append(
                F.array_min(
                    F.transform(hvs, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME))
                ).alias(f"mh_{j}")
            )
        return F.struct(*cols)

    return sh.select(F.col(id_col), _let(F.col("_hv"), mins).alias("_mh")).select(
        id_col, *[F.col(f"_mh.mh_{j}").alias(f"mh_{j}") for j in range(num_hashes)]
    )


def lsh_band_keys(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Signature → (id, band_id, band_key) rows. Documents sharing a
    ``band_key`` within a ``band_id`` are LSH candidates."""
    bands = []
    for b in range(num_hashes // band_size):
        cols = [F.col(f"mh_{j}") for j in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("|", *cols)).alias("band_key"))
        )
    return (
        sig.select(F.col(id_col), F.explode(F.array(*bands)).alias("band"))
        .select(id_col, "band.band_id", "band.band_key")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Candidate near-duplicate pairs: documents agreeing on at least one
    LSH band, with the matching-minhash fraction as the Jaccard estimate.

    The pair space is an equi-join on (band_id, band_key) — at scale the
    bucket sizes, not n², bound the work; a hot bucket (boilerplate docs)
    is handled by AQE skew-join splitting.
    """
    # Lazy localCheckpoint, not .cache(): the signatures frame has FOUR
    # plan consumers (band keys via both self-join sides + both
    # signature re-attach joins), so one materialization is right — but
    # a .cache() registers a CacheManager entry nothing ever unpersists
    # (r8 verdict backlog #8: accumulates across a long session), while
    # localCheckpoint blocks are released by the ContextCleaner once
    # the returned frame is garbage-collected. Same single compute, no
    # session-lifetime leak. The frame is narrow (id + num_hashes
    # longs) — nothing prunable is materialized (the r8
    # boilerplate-checkpoint caveat does not apply).
    sig = minhash_signatures(df, id_col, text_col, num_hashes).localCheckpoint(
        eager=False
    )
    bands = lsh_band_keys(sig, id_col, num_hashes, band_size)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), *[F.col(f"mh_{j}").alias(f"a_mh_{j}") for j in range(num_hashes)])
    sb = sig.select(F.col(id_col).alias("id_b"), *[F.col(f"mh_{j}").alias(f"b_mh_{j}") for j in range(num_hashes)])
    matches = sum(
        F.when(F.col(f"a_mh_{j}") == F.col(f"b_mh_{j}"), 1).otherwise(0) for j in range(num_hashes)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(matches.cast("double") / F.lit(num_hashes), 6).alias("est_jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = SHINGLE_WIDTH,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact Jaccard over ``width``-token shingle sets for document pairs
    sharing ``block_col`` (blocked equi-join, not a cross join)."""
    base = ensure_parallelism(df).select(
        F.col(id_col), F.col(block_col).alias("_block"), shingles(text_col, width).alias("_sh")
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.array_union(F.col("a._sh"), F.col("b._sh")))
    jac = F.round(inter.cast("double") / union, 6)
    return (
        a.join(
            b,
            (F.col("a._block") == F.col("b._block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """SimHash over tokens: per token take the top ``bits`` of
    md5(token); per bit position sum ±1 across all tokens (with
    multiplicity); the sign vector is the fingerprint. 60 bits = 15 hex
    digits so the value fits a signed 64-bit long in every engine.

    Shape: the whole signature folds per document in array land — token
    hashes once (let-bound), then one ``aggregate`` carrying the
    ``bits``-wide ±1 count vector, then a sign-weighted sum. Entirely
    narrow: zero shuffles, zero explodes (the previous formulation
    exploded tokens×bits rows through two keyed aggregations). Documents
    with no tokens produce no row (parity with the inverted-index form).
    """
    if bits % 4 != 0 or bits > 60:
        raise ValueError("bits must be a multiple of 4, at most 60")
    hex_digits = bits // 4
    pows = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])

    def build(hvs: Column) -> Column:
        counts = F.aggregate(
            hvs,
            F.array_repeat(F.lit(0).cast("long"), bits),
            lambda acc, hv: F.zip_with(
                acc,
                pows,
                lambda a, p: a
                + F.when(hv.bitwiseAND(p) != 0, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long"),
            ),
        )
        return F.aggregate(
            F.zip_with(
                counts,
                pows,
                lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )

    # bind the token array once: the non-empty filter and the hash
    # transform would otherwise each re-run the tokenizer
    bound = ensure_parallelism(df).withColumn("_sh_toks", tokens(text_col))
    hvs = F.transform(
        F.col("_sh_toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, hex_digits), 16, 10).cast("long"),
    )
    return (
        bound.filter(F.size(F.col("_sh_toks")) > 0)
        .select(F.col(id_col), _let(hvs, build).alias("simhash"))
    )


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def duplicate_clusters(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-duplicate *pairs* into duplicate *clusters*:
    connected components, each document labeled with the minimum id
    reachable through the pair graph (singletons label themselves).

    Iterative min-label propagation with pointer jumping: per round,
    every active vertex takes the min of its own label, its neighbors'
    labels, and its label's label (path halving) — convergence in
    O(log(diameter)) rounds rather than O(diameter).

    Scale discipline:

    * only vertices that appear in a pair propagate — in a dedup
      workload the overwhelming majority of documents are singletons
      and never enter the loop; they are unioned back at the end with
      ``cluster_id = id``;
    * labels are ``localCheckpoint``-ed each round so plan/lineage stay
      flat across iterations, and the intra-round ``stepped`` frame is
      checkpointed too: the pointer-jump self-join consumes it twice,
      and without the sever every round shuffled the edge-sized
      neighbor-min join+aggregate TWICE (7 Exchanges / 3 SortMergeJoin
      / 4 HashAggregate per round vs 2 / 1 / 0 plus one labels-sized
      materialization — measured, r8). Checkpoints are *lazy*, so the
      fixpoint aggregate is still the action that materializes the
      round (AQE splits it into a handful of stage-jobs either way;
      the ``stepped`` sever adds ~2 scheduling jobs per round and is
      a wash in local wall time, but at scale it halves the per-round
      shuffle bytes — the fork-recompute discipline);
    * the fixpoint test is the label sum (labels only ever decrease, so
      an unchanged sum ⇔ fixpoint) — a single-table aggregate, no join;
      summed as DECIMAL(38,0) so arbitrary id magnitudes cannot
      overflow. The only driver-side values are these per-round sums
      (the in-loop shuffles shrink with the active graph via AQE
      partition coalescing — the pair graph is usually orders of
      magnitude smaller than the corpus, and coalescing keeps the
      per-round task count proportional to it, not to the session's
      corpus-sized shuffle width).
    """
    e = pairs.select(F.col(pair_a).alias("src"), F.col(pair_b).alias("dst"))
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.localCheckpoint(eager=False)
    endpoints = edges.select(F.col("src").alias("id")).distinct()

    all_ids = vertices.select(F.col(id_col).alias("id"))
    labels = all_ids.join(endpoints, "id", "leftsemi").withColumn("comp", F.col("id"))
    labels = labels.localCheckpoint(eager=False)
    singletons = all_ids.join(endpoints, "id", "leftanti").withColumn("comp", F.col("id"))

    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
    for _ in range(max_iter):
        labels = _cc_round(edges, labels)
        new_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.union(singletons).select(
        F.col("id").alias(id_col), F.col("comp").alias("cluster_id")
    )


def _cc_round(
    edges: DataFrame, labels: DataFrame, sever_result: bool = True
) -> DataFrame:
    """One min-label-propagation round with path halving:
    ``comp' = min(comp, min_neighbor(comp), label(comp))``. ``edges``
    and ``labels`` must both be checkpoint-severed frames (the caller's
    contract); the result is lazily checkpointed, so the caller's
    fixpoint aggregate is the action that materializes the round.
    ``sever_result=False`` skips the trailing checkpoint so tests can
    inspect the round's actual plan (a severed result explains as a
    bare ExistingRDD scan)."""
    neighbor_min = (
        edges.join(labels, edges.dst == labels.id)
        .groupBy("src")
        .agg(F.min("comp").alias("nmin"))
    )
    stepped = (
        labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
        .select("id", F.least(F.col("comp"), F.col("nmin")).alias("comp"))
        # the pointer-jump self-join below consumes this frame TWICE;
        # without a sever each round's plan re-derives the
        # neighbor-min join+aggregate per side (7 Exchanges / 3 SMJ /
        # 4 HashAggregates per round vs 2 / 1 / 0 plus one
        # materialization of this labels-sized frame) — the
        # fork-recompute discipline, lazy so the round still costs
        # exactly one Spark job (the fixpoint aggregate). Plan shape
        # pinned by tests/test_operators.py::test_cc_round_plan_is_severed.
        .localCheckpoint(eager=False)
    )
    # pointer jump: comp := label(comp)
    parent = stepped.select(F.col("id").alias("pid"), F.col("comp").alias("pcomp"))
    jumped = stepped.join(parent, stepped.comp == parent.pid, "left").select(
        "id", F.least(F.col("comp"), F.col("pcomp")).alias("comp")
    )
    return jumped.localCheckpoint(eager=False) if sever_result else jumped


def lsh_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    width: int = SHINGLE_WIDTH,
) -> DataFrame:
    """The full two-stage near-dup pipeline: LSH candidate generation
    followed by exact shingle-Jaccard verification — candidates that
    survive the threshold, with both the estimate and the exact value.

    This is the production shape: the cheap probabilistic stage bounds
    the pair space (bucket equi-join, never n²), and the exact stage —
    whose cost is O(candidates), not O(pairs) — removes LSH false
    positives so downstream clustering never merges on a hash accident.
    Shingle sets ship only for candidate ids (a semi-joined fraction of
    the corpus at scale).
    """
    cand = minhash_lsh_pairs(df, id_col, text_col, num_hashes, band_size)
    sets_ = df.select(F.col(id_col), shingles(text_col, width).alias("_sh"))
    a = sets_.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sha"))
    b = sets_.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_shb"))
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    union = F.size(F.array_union(F.col("_sha"), F.col("_shb")))
    jac = F.round(inter.cast("double") / union, 6)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", "est_jaccard", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    width: int = SHINGLE_WIDTH,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering — the
    AllPairs/PPJoin family (Bayardo, Ma & Srikant, "Scaling up all
    pairs similarity search", WWW 2007; Xiao et al., PPJoin): every
    pair with shingle-set Jaccard ≥ ``threshold``, with NO false
    negatives, without the all-pairs product.

    The filter: order every set by one global total order (ascending
    document frequency, ties by value — rare shingles first) and keep
    each set's first ``|s| − ⌈τ·|s|⌉ + 1`` elements as its *prefix*.
    Two sets whose Jaccard reaches τ must share at least one prefix
    element, so the candidate space is the equi-join of prefixes — at
    scale a join keyed on RARE shingles (frequent shingles land in few
    prefixes), the opposite skew profile of a naive token join. An
    exact Jaccard verification pass (O(candidates)) removes the filter
    survivors below τ.

    Complement to :func:`minhash_lsh_pairs`: LSH trades recall for
    speed probabilistically; this join is deterministic-complete —
    the shape to reach for when a dedup SLA says "no missed pair above
    τ". Cost is the dfreq aggregation (one shuffle of distinct
    shingles) plus the prefix equi-join.
    """
    sets_ = df.select(F.col(id_col).alias("id"), shingles(text_col, width).alias("sh"))
    ex = sets_.select("id", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        ex.join(dfreq, "s")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "s"))).alias("ordered"))
    )
    size = F.size("ordered")
    plen = (size - F.ceil(F.lit(float(threshold)) * size) + 1).cast("int")
    prefixes = ranked.select(
        "id",
        F.explode(
            F.slice(F.transform("ordered", lambda x: x["s"]), F.lit(1), plen)
        ).alias("s"),
    )
    a = prefixes.select(F.col("id").alias("id_a"), "s")
    b = prefixes.select(F.col("id").alias("id_b"), "s")
    cand = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets_.select(F.col("id").alias("id_a"), F.col("sh").alias("_sha"))
    sb = sets_.select(F.col("id").alias("id_b"), F.col("sh").alias("_shb"))
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    union = F.size(F.array_union(F.col("_sha"), F.col("_shb")))
    jac = F.round(inter.cast("double") / union, 6)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def fuzzy_block_matches(
    records: DataFrame,
    probes: DataFrame,
    text_col: str = "name",
    block_len: int = 5,
    max_distance: int = 2,
) -> DataFrame:
    """Blocked fuzzy string matching: edit-distance entity resolution.

    The data-cleaning complement to the set-similarity joins above:
    Jaccard/MinHash treat text as token SETS and miss single-character
    typos inside a token; record linkage over dirty names (the classic
    "Customer#123 vs Custmer#123" case) needs **edit distance**. An
    all-pairs levenshtein is O(n·m·len²) — the standard production
    shape (Febrl/Magellan-style blocking) is: equi-join on a cheap
    BLOCK KEY that any true match must share, then verify only the
    candidates with the exact distance.

    Block key here: the first ``block_len`` characters. That makes the
    match deterministic-complete for any corruption at position >
    ``block_len`` (insertions/deletions/substitutions later in the
    string never change the block), which is the common dirty-data
    regime for prefixed entity names. Candidates per probe are bounded
    by its block's size, never the corpus.

    Scale shape: ``probes`` is a bounded query set (broadcast); the
    corpus side shuffles nothing — scan → hash-join on the block key →
    per-candidate ``levenshtein`` — so cost is linear in the corpus
    with a candidate-verification term of Σ matched-block sizes.

    Returns (probe_id, probe_text, match_id, match_text, distance) for
    candidates within ``max_distance``.
    """
    p = probes.select(
        F.col("probe_id"),
        F.col(text_col).alias("probe_text"),
        F.substring(text_col, 1, block_len).alias("_blk"),
    )
    r = records.select(
        F.col("match_id"),
        F.col(text_col).alias("match_text"),
        F.substring(text_col, 1, block_len).alias("_blk"),
    )
    dist = F.levenshtein("probe_text", "match_text")
    return (
        r.join(F.broadcast(p), "_blk")
        .select(
            "probe_id",
            "probe_text",
            "match_id",
            "match_text",
            dist.cast("long").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )


def lsh_plan(
    threshold: float,
    target_recall: float = 0.95,
    max_hashes: int = 256,
) -> tuple[int, int]:
    """Smallest (num_hashes, band_size) hitting ``target_recall`` for
    pairs at Jaccard >= ``threshold``.

    Standard banding S-curve (Leskovec/Rajaraman/Ullman, "Mining of
    Massive Datasets" §3.4 — public): with b bands of r rows the
    probability a pair at similarity s shares >= 1 band is
    1 - (1 - s^r)^b. For each candidate signature size this scans the
    (b, r) factorizations and keeps the cheapest plan whose recall AT
    the threshold meets the target — the sizing answer to "I need 95%
    of true near-dups at 0.8 Jaccard; how many minhashes do I pay
    for?" (cost scales signatures linearly and candidate volume with
    collision probability below the threshold, so fewer hashes and
    longer bands are both savings).
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if not 0.0 < target_recall < 1.0:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    for n in range(2, max_hashes + 1):
        best: tuple[int, int] | None = None
        for r in range(n, 0, -1):  # longest bands first: fewest candidates
            if n % r:
                continue
            b = n // r
            recall = 1.0 - (1.0 - threshold**r) ** b
            if recall >= target_recall:
                best = (n, r)
                break
        if best is not None:
            return best
    raise ValueError(
        f"no plan with <= {max_hashes} hashes reaches recall "
        f"{target_recall} at threshold {threshold}"
    )
