"""Similarity search over an embedding column (``array<float>``).

Two paths:

* **brute-force top-k** — the exactness baseline: broadcast the (small)
  query set against the corpus, cosine per pair, window top-k. The
  corpus side is never shuffled — the join is a broadcast nested loop
  over a *bounded* query set, so the plan scales linearly in corpus
  size and is embarrassingly parallel across partitions.
* **LSH-bucketed ANN** — random-hyperplane (sign) LSH: vectors hash to a
  bucket per band; candidates = corpus rows sharing a bucket with the
  query. Pair space is an equi-join on the bucket key → sub-linear
  candidate counts at scale; recall tunable via bands × bits.

Numeric discipline: vectors are quantized to integers
(``round(x * 10^q)``) before any reduction, so dot products and norms
are exact integer sums — independent of partition/summation order and
bit-identical in the DuckDB oracle. The final cosine is one IEEE double
division + sqrt, deterministic given identical integer inputs.

Hyperplane weights are derived from md5 (±1 per (plane, dim)), keeping
the ANN fully deterministic and SQL-reproducible — at production scale
swap in float Gaussian planes via a Pandas UDF if preferred.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_stream_spark.plans.partitioning import ensure_parallelism

QUANT_SCALE = 1000  # 10^3: three fractional digits survive quantization


def quantize(col: Column | str, scale: int = QUANT_SCALE) -> Column:
    """array<float> → array<long> of round(x*scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale, 0).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product (order-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def int_norm_sq(a: Column) -> Column:
    return int_dot(a, a)


def cosine_from_quantized(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors, rounded to 6 dp.

    ``try_divide``: a zero-norm (degenerate) vector yields NULL rather
    than failing the whole job under ANSI mode — NULL comparisons are
    false, so zero vectors are never anyone's neighbor/duplicate."""
    return F.round(
        F.try_divide(
            int_dot(a, b).cast("double"),
            F.sqrt(int_norm_sq(a).cast("double") * int_norm_sq(b).cast("double")),
        ),
        6,
    )


def scalar_quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension min-max scalar quantization to 0..255 — the storage
    codec an IVF/PQ index uses to cut vector bytes 4× before search.

    One ``posexplode`` pass computes per-dimension ranges (dims rows —
    broadcast back); each value maps to ``floor((x-min)*255/(max-min))``
    (floor, not round: no round-half ambiguity across engines), clamped
    to 255 at the max, degenerate constant dimensions to 0.
    """
    ex = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    ).select(id_col, F.col("pos").cast("long").alias("pos"), F.col("x").cast("double").alias("x"))
    rng = ex.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    q = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        F.least(F.lit(255.0), F.floor((F.col("x") - F.col("mn")) * 255.0 / (F.col("mx") - F.col("mn"))))
    )
    return ex.join(F.broadcast(rng), "pos").select(
        id_col, "pos", q.cast("long").alias("q")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` must be small (it is broadcast); self-matches excluded.
    Returns (query_id, neighbor_id, cos_sim, rank).
    """
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), quantize(vec_col).alias("_cvec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), quantize(vec_col).alias("_qvec"))
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine_from_quantized(F.col("_qvec"), F.col("_cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_weights(plane: int, dims: int) -> list[int]:
    """±1 weight vector of one LSH hyperplane: +1 when the first hex
    digit of ``md5('<plane>:<d>')`` has its top bit set — a fair,
    engine-independent deterministic coin (shared with the SQL oracle)."""
    return [
        1 if int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[0], 16) >= 8 else -1
        for d in range(dims)
    ]


def hyperplane_bit(vec: Column, plane: int, dims: int) -> Column:
    """Sign bit of <vec, w_plane> — weights inlined as literals so the
    whole band hash stays one codegen'd expression (no per-row md5)."""
    w = F.array(*[F.lit(x) for x in hyperplane_weights(plane, dims)])
    s = F.aggregate(
        F.zip_with(vec, w, lambda v, wi: v * wi), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec: Column, num_bits: int, dims: int, band: int = 0) -> Column:
    """Bucket key: the ``num_bits`` sign bits of one band, as a string."""
    bits = [
        hyperplane_bit(vec, band * num_bits + p, dims).cast("string") for p in range(num_bits)
    ]
    return F.concat_ws("", *bits)


def lsh_band_buckets(vec: Column, num_bits: int, num_bands: int, dims: int) -> Column:
    """All band buckets in ONE pass over the vector.

    The per-dimension weight columns (``planes`` ints each) are inlined
    as a literal array-of-arrays; a single fold carries the
    ``num_bands*num_bits``-wide running dot products, so the vector is
    traversed once instead of once per hyperplane (~bits×bands fewer
    interpreted HOF steps per row). Returns ``array<string>`` of bucket
    keys, one per band — numerically identical to per-plane folds."""
    planes = num_bands * num_bits
    w_by_dim = F.array(
        *[
            F.array(*[F.lit(hyperplane_weights(p, dims)[d]) for p in range(planes)])
            for d in range(dims)
        ]
    )
    sums = F.aggregate(
        F.zip_with(vec, w_by_dim, lambda v, w: F.struct(v.alias("v"), w.alias("w"))),
        F.array_repeat(F.lit(0).cast("long"), planes),
        lambda acc, pair: F.zip_with(
            acc, pair["w"], lambda a, wi: a + pair["v"] * wi
        ),
    )
    bits = F.transform(sums, lambda s: F.when(s >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.array_join(F.slice(bits, b * num_bits + 1, num_bits), ""),
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_bits: int = 4,
    num_bands: int = 2,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share at least one LSH band bucket
    with the query, then exact cosine + window top-k over candidates.

    Returns (query_id, neighbor_id, cos_sim, rank). Recall grows with
    ``num_bands`` (OR-construction) and shrinks with ``num_bits``.
    """

    def with_buckets(df: DataFrame, id_alias: str) -> DataFrame:
        vcol = f"_{id_alias}_vec"
        quantized = ensure_parallelism(df).select(
            F.col(id_col).alias(id_alias), quantize(vec_col).alias(vcol)
        )
        return quantized.select(
            id_alias,
            vcol,
            F.posexplode(
                lsh_band_buckets(F.col(vcol), num_bits, num_bands, dims)
            ).alias("band", "bucket"),
        )

    cb = with_buckets(corpus, "neighbor_id")
    qb = with_buckets(queries, "query_id")
    cand = (
        cb.join(
            F.broadcast(qb),
            (cb.band == qb.band)
            & (cb.bucket == qb.bucket)
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            # cosine BEFORE the dedup: a pair found by both bands costs
            # one redundant dot product, but the distinct then shuffles
            # three scalars per row instead of two 64-dim arrays
            # (~50× lighter exchange — the dominant cost at scale).
            cosine_from_quantized(
                F.col("_query_id_vec"), F.col("_neighbor_id_vec")
            ).alias("cos_sim"),
        )
        .distinct()
    )
    pairs = cand
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_bits: int = 4,
    num_bands: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking: pairs
    sharing any band bucket with cosine >= threshold."""
    qv = quantize(vec_col)
    bucket_structs = [
        F.struct(F.lit(b).alias("band"), lsh_bucket(qv, num_bits, dims, band=b).alias("bucket"))
        for b in range(num_bands)
    ]
    base = ensure_parallelism(df).select(
        F.col(id_col), qv.alias("_vec"), F.explode(F.array(*bucket_structs)).alias("bb")
    ).select(id_col, "_vec", "bb.band", "bb.bucket")
    a, b = base.alias("a"), base.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._vec").alias("_va"),
            F.col("b._vec").alias("_vb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "id_a", "id_b", cosine_from_quantized(F.col("_va"), F.col("_vb")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """Per-group centroid components — the coarse-quantizer "training"
    step of an IVF index (one Lloyd iteration over given assignments).

    Vectors are quantized so the component sums are exact integers
    (order-independent across partitions — a raw float sum would not
    reproduce, even against itself); the mean is one double division at
    the end. Shape: posexplode → groupBy(group, pos) — shuffle volume is
    |groups| × dims rows of three ints, map-side partial aggregation
    collapses the rest. Returns (group, pos, centroid_val) rows.
    """
    base = ensure_parallelism(df).select(
        F.col(group_col), F.posexplode(quantize(vec_col, scale)).alias("pos", "qv")
    )
    return (
        base.groupBy(group_col, "pos")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            group_col,
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("s").cast("double") / (F.col("n") * float(scale)), 6).alias(
                "centroid_val"
            ),
        )
    )


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """One Lloyd *assignment* round with deterministic init (the first
    ``k`` vectors by id are the starting centroids): every vector maps
    to the centroid minimizing exact integer squared-L2 distance, ties
    to the lowest cluster id.

    Together with :func:`centroids` (the *update* step — means per
    assignment) this is the k-means training loop an IVF index runs a
    few rounds of; both steps are single-shuffle DataFrame ops, so the
    loop is driver-bounded with no per-row Python. The k centroids ride
    along as one broadcast; distances never leave the executors.
    """
    cents = corpus.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cluster_id"), quantize(vec_col, scale).alias("_cent")
    )
    vecs = ensure_parallelism(corpus).select(
        F.col(id_col), quantize(vec_col, scale).alias("_v")
    )
    return _assign_to(vecs, cents, id_col)


def _assign_to(vecs: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """argmin exact-integer squared-L2 over a broadcast centroid set.
    ``vecs``: (id, _v array<long>); ``cents``: (cluster_id, _cent)."""
    dist_sq = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_cent"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ).alias("dist_sq")
    pairs = vecs.join(F.broadcast(cents)).select(id_col, "cluster_id", dist_sq)
    w = Window.partitionBy(id_col).orderBy("dist_sq", "cluster_id")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cluster_id", "dist_sq")
    )


def kmeans_train(
    corpus: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Full Lloyd's loop: ``rounds`` alternations of integer-L2 argmin
    assignment and per-cluster mean update.

    Deterministic throughout: init = first ``k`` vectors by id; updated
    centroids are element-wise integer means (exact sums, half-up to
    the quantization grid); empty clusters keep their previous
    centroid. Per round the driver holds only k × dims ints (bounded
    metadata, like the merge engine's bucket lists) — the corpus never
    leaves the executors, so the loop is O(rounds) Spark jobs at any
    scale. Returns (final assignment DataFrame, centroid list).
    """
    vecs = ensure_parallelism(corpus).select(
        F.col(id_col), quantize(vec_col, scale).alias("_v")
    )
    cent_rows = sorted(
        (r[id_col], list(r["_v"]))
        for r in vecs.filter(F.col(id_col) < k).collect()
    )
    cents_py: list[tuple[int, list[int]]] = [
        (cid, v) for cid, v in zip(range(len(cent_rows)), (v for _i, v in cent_rows))
    ]
    spark = corpus.sparkSession
    for _ in range(rounds):
        cents = spark.createDataFrame(
            [(cid, v) for cid, v in cents_py], f"cluster_id long, _cent array<long>"
        )
        assigned = _assign_to(vecs, cents, id_col)
        sums = (
            vecs.join(assigned.select(id_col, "cluster_id"), id_col)
            .select("cluster_id", F.posexplode("_v").alias("pos", "q"))
            .groupBy("cluster_id", "pos")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in sums:
            # exact integer mean, half-up — engine-independent
            mean = (2 * r["s"] + r["n"]) // (2 * r["n"]) if r["s"] >= 0 else -(
                (2 * -r["s"] + r["n"]) // (2 * r["n"])
            )
            by_cluster.setdefault(r["cluster_id"], {})[r["pos"]] = mean
        cents_py = [
            (
                cid,
                [by_cluster[cid][p] for p in range(len(old))]
                if cid in by_cluster
                else old,  # empty cluster keeps its centroid
            )
            for cid, old in cents_py
        ]
    final_cents = spark.createDataFrame(
        cents_py, "cluster_id long, _cent array<long>"
    )
    return _assign_to(vecs, final_cents, id_col), cents_py


def ivf_trained_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """IVF search over a *trained* coarse quantizer: k-means cells from
    :func:`kmeans_train` replace the pre-labeled cells of
    :func:`ivf_topk`. Queries probe their ``nprobe`` nearest trained
    centroids (integer L2, broadcast), then score only vectors assigned
    to those cells — the full index pipeline (train → assign → probe →
    score) as DataFrame ops.
    """
    assigned, cents_py = kmeans_train(
        corpus, k=n_cells, rounds=rounds, id_col=id_col, vec_col=vec_col, scale=scale
    )
    spark = corpus.sparkSession
    cents = spark.createDataFrame(cents_py, "cluster_id long, _cent array<long>")
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), quantize(vec_col, scale).alias("_v")
    )
    # rank every (query, cell) pair and keep the nprobe nearest cells
    dist_sq = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_cent"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ).alias("dist_sq")
    qc = qvecs.join(F.broadcast(cents)).select("query_id", "_v", "cluster_id", dist_sq)
    pr = Window.partitionBy("query_id").orderBy("dist_sq", "cluster_id")
    probes = (
        qc.withColumn("_pr", F.row_number().over(pr))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_v", "cluster_id")
    )
    cvecs = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), quantize(vec_col, scale).alias("_c")
    ).join(assigned.select(F.col(id_col).alias("neighbor_id"), "cluster_id"), "neighbor_id")
    cand = cvecs.join(F.broadcast(probes), "cluster_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = F.round(
        int_dot(F.col("_v"), F.col("_c")).cast("double")
        / F.sqrt(
            int_norm_sq(F.col("_v")).cast("double")
            * int_norm_sq(F.col("_c")).cast("double")
        ),
        6,
    ).alias("cos_sim")
    scored = cand.select("query_id", "neighbor_id", cos)
    rank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(rank)).filter(
        F.col("rank") <= k
    )


CENTROID_INT_SCALE = 1_000_000  # 6-dp centroid components → exact ints


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the scale path beyond LSH.

    The corpus is pre-partitioned into cells (``cell_col`` — a trained
    coarse-quantizer assignment); search computes each query's cosine to
    every cell *centroid* (|cells| comparisons, broadcast), probes only
    the ``nprobe`` nearest cells, and scores candidates within them —
    work scales with ``nprobe/|cells|`` of the corpus instead of all of
    it. At 100 TB the corpus is stored partitioned BY cell, so probing
    prunes file-level partitions and each probe is a co-located scan.

    Determinism: centroids and all dot products are exact-integer
    (quantized), ties broken on (cell) and (neighbor id) — bit-stable
    across engines and partitionings.
    """
    cents = centroids(corpus, group_col=cell_col, vec_col=vec_col, scale=scale)
    cvec = cents.groupBy(cell_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
            lambda s: F.round(s["centroid_val"] * CENTROID_INT_SCALE, 0).cast("long"),
        ).alias("_cent")
    )
    q = queries.select(F.col(id_col).alias("query_id"), quantize(vec_col, scale).alias("_qvec"))
    qc = q.join(F.broadcast(cvec))  # |queries| × |cells| — cells are few
    cos_c = (
        int_dot(F.col("_qvec"), F.col("_cent")).cast("double")
        / F.sqrt(
            int_norm_sq(F.col("_qvec")).cast("double")
            * int_norm_sq(F.col("_cent")).cast("double")
        )
    ).alias("_cosc")
    probe_rank = Window.partitionBy("query_id").orderBy(
        F.desc("_cosc"), F.col(cell_col)
    )
    probed = (
        qc.select("query_id", "_qvec", F.col(cell_col), cos_c)
        .withColumn("_pr", F.row_number().over(probe_rank))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qvec", cell_col)
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col),
        quantize(vec_col, scale).alias("_cvec"),
    )
    # broadcast the probe set (|queries| × nprobe rows): the corpus side
    # stays narrow instead of being exchanged on the cell key
    cand = c.join(F.broadcast(probed), cell_col).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_from_quantized(F.col("_qvec"), F.col("_cvec")).alias("cos_sim"),
    )
    rank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(rank).cast("long"))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """Arrow-batched Pandas-UDF variant of :func:`brute_force_topk` —
    the vectorized-numpy fallback path for kernels the built-in
    higher-order functions can't express.

    Queries are collected to the driver (they are small by contract,
    same as the broadcast in the JVM variant) and closed over by a
    ``mapInPandas`` that scores each Arrow batch against all queries
    with one int64 matmul, emitting per-batch partial top-k; a final
    window rank over the (batches × queries × k) partials yields the
    exact global top-k. Quantization mirrors :func:`quantize`
    (HALF_UP, not numpy's banker's rounding), so results are
    bit-identical to the JVM path.
    """
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()

    def _quant(vec) -> "np.ndarray":
        x = np.asarray(vec, dtype=np.float64) * scale
        return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)

    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([_quant(r[1]) for r in q_rows])  # [q, d] int64
    q_norm = (q_mat.astype(np.float64) ** 2).sum(axis=1)  # exact: < 2^53

    out_schema = "query_id long, neighbor_id long, cos_sim double"

    def score(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.stack([_quant(v) for v in pdf[vec_col]])
            c_norm = (c_mat.astype(np.float64) ** 2).sum(axis=1)
            # int64 matmul stays exact (|x| <= scale, dims bounded)
            dots = (c_mat @ q_mat.T).astype(np.float64)  # [n, q]
            sims = np.round(dots / np.sqrt(np.outer(c_norm, q_norm)), 6)
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                mask = ids != q_ids[qi]
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                # partial top-k per batch: global top-k survives the cut
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))[:k]
                sel = cand_idx[order]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(q_ids[qi], len(sel)),
                        "neighbor_id": ids[sel],
                        "cos_sim": col[sel],
                    }
                )

    partials = ensure_parallelism(corpus).select(id_col, vec_col).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        partials.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _subvectors(v: Column, m: int, dims: int) -> Column:
    """array<long>[dims] → array of m contiguous subvectors."""
    sub = dims // m
    return F.array(*[F.slice(v, j * sub + 1, sub) for j in range(m)])


def _codebook(
    corpus: DataFrame,
    m: int,
    n_codes: int,
    dims: int,
    id_col: str,
    vec_col: str,
    scale: int,
) -> DataFrame:
    """The ONE codebook definition encoding and search must share:
    (sub_id, code, _c) rows from the subvectors of the first ``n_codes``
    corpus vectors. A drift between the encoder's and the LUT's
    codebooks silently degrades every neighbor result."""
    return (
        corpus.select(F.col(id_col), quantize(vec_col, scale).alias("_v"))
        .filter(F.col(id_col) < n_codes)
        .select(
            F.col(id_col).cast("long").alias("code"),
            F.posexplode(_subvectors(F.col("_v"), m, dims)).alias("sub_id", "_c"),
        )
        .select(F.col("sub_id").cast("long").alias("sub_id"), "code", "_c")
    )


def pq_codes(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """Product-quantization encoding: each vector compresses to ``m``
    codebook ids (one per contiguous subspace) — the storage codec that
    cuts vector bytes from dims×4 to m bytes before ANN search.

    Codebooks are deterministic (subvectors of the first ``n_codes``
    corpus vectors — the same single-assignment convention as
    ``kmeans_assign``); assignment is exact integer L2 argmin per
    subspace, ties to the lowest code. Shape: subspace explode →
    broadcast codebook join → per-(vector, subspace) argmin window —
    work is corpus × m × n_codes cheap integer ops, one shuffle on
    (vector, subspace). Returns (id, sub_id, code, dist_sq).
    """
    if dims % m != 0:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    vq = ensure_parallelism(corpus).select(
        F.col(id_col), quantize(vec_col, scale).alias("_v")
    )
    subs = _subvectors(F.col("_v"), m, dims)
    cents = _codebook(corpus, m, n_codes, dims, id_col, vec_col, scale)
    vexp = vq.select(
        F.col(id_col), F.posexplode(subs).alias("sub_id", "_s")
    ).select(F.col(id_col), F.col("sub_id").cast("long").alias("sub_id"), "_s")
    dist = F.aggregate(
        F.zip_with(F.col("_s"), F.col("_c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).alias("dist_sq")
    pairs = vexp.join(F.broadcast(cents), "sub_id").select(
        id_col, "sub_id", "code", dist
    )
    w = Window.partitionBy(id_col, "sub_id").orderBy("dist_sq", "code")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "sub_id", "code", "dist_sq")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: queries score against the
    compressed codes, never the raw corpus vectors.

    Per query, a lookup table of (subspace, code) → exact-integer L2 to
    the codebook centroid is built against the broadcast codebooks
    (|q| × m × n_codes rows); the corpus side then joins its codes to
    the broadcast LUT and sums m partial distances per (query, vector).
    At scale the corpus contributes only its m-byte codes to the join —
    the bandwidth win that makes PQ the standard billion-vector codec.
    Fully deterministic (integer distances, ties to lowest id/code).
    """
    codes = pq_codes(corpus, m, n_codes, dims, id_col, vec_col, scale)
    vq = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        quantize(vec_col, scale).alias("_v"),
    )
    cents = _codebook(corpus, m, n_codes, dims, id_col, vec_col, scale)
    qexp = vq.select(
        "query_id", F.posexplode(_subvectors(F.col("_v"), m, dims)).alias("sub_id", "_qs")
    ).select("query_id", F.col("sub_id").cast("long").alias("sub_id"), "_qs")
    qdist = F.aggregate(
        F.zip_with(F.col("_qs"), F.col("_c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).alias("_qd")
    lut = qexp.join(F.broadcast(cents), "sub_id").select(
        "query_id", "sub_id", "code", qdist
    )
    partials = codes.join(F.broadcast(lut), ["sub_id", "code"]).select(
        F.col(id_col).alias("neighbor_id"), "query_id", "_qd"
    )
    adc = (
        partials.groupBy("query_id", "neighbor_id")
        .agg(F.sum("_qd").alias("adc_dist"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    k: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus (one deterministic
    k-means assignment round — first ``k`` ids seed the centroids), then
    inside each cluster drop every vector whose cosine similarity to a
    *lower-id* cluster member reaches ``threshold``; the lowest id of
    each semantic-duplicate group survives.

    Scale shape: the candidate-pair space is an **equi-join on
    cluster_id**, never corpus x corpus. At 100 TB, k grows with the
    corpus (the paper uses k ~ N/10k, keeping cluster sizes bounded), so
    the within-cluster quadratic term is bounded; an oversized hot
    cluster splits via AQE skew-join or one extra LSH band appended to
    the cluster key. The single-pass keep-lowest-id rule (rather than
    the paper's sequential sweep) keeps the whole operator at one
    assignment shuffle + one self-join — the scalable approximation;
    it can only over-remove along similarity chains, never under-remove.

    Returns one row per corpus vector: (id, cluster_id, kept).
    """
    assigned = kmeans_assign(corpus, k=k, id_col=id_col, vec_col=vec_col).select(
        id_col, "cluster_id"
    )
    qv = (
        corpus.select(F.col(id_col), quantize(vec_col).alias("_v"))
        .join(assigned, id_col)
    )
    a = qv.select(
        F.col(id_col).alias("_id_a"), F.col("cluster_id"), F.col("_v").alias("_va")
    )
    b = qv.select(
        F.col(id_col).alias("_id_b"), F.col("cluster_id"), F.col("_v").alias("_vb")
    )
    removed = (
        a.join(b, "cluster_id")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .filter(cosine_from_quantized(F.col("_va"), F.col("_vb")) >= threshold)
        .select(F.col("_id_b").alias("_removed"))
        .distinct()
    )
    return qv.join(
        removed, qv[id_col] == removed["_removed"], "left"
    ).select(
        F.col(id_col).cast("long").alias(id_col),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("_removed").isNull().alias("kept"),
    )
