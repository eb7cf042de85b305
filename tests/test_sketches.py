"""KMV sketch properties: exactness below k, mergeability (the property
that makes it a sketch and not a sample), and estimate quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_stream_spark.operators import sketches as sk


def test_exact_below_k(spark):
    df = spark.createDataFrame([(i % 40,) for i in range(400)], "v long").withColumn(
        "g", F.lit("a")
    )
    out = sk.kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert out["exact_distinct"] == 40
    assert out["est_distinct"] == 40.0
    assert out["rel_err"] == 0.0


def test_estimate_quality_above_k(spark):
    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "v long").withColumn(
        "g", F.lit("a")
    )
    out = sk.kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert out["exact_distinct"] == n
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert out["rel_err"] < 0.25


def test_merge_rule_matches_union_sketch(spark):
    """k smallest of (sketch(A) ∪ sketch(B)) == sketch(A ∪ B)."""
    k = 64
    a = spark.createDataFrame([(i,) for i in range(800)], "v long")
    b = spark.createDataFrame([(i,) for i in range(400, 1200)], "v long")
    ga = a.withColumn("g", F.lit("x"))
    gb = b.withColumn("g", F.lit("y"))
    both = ga.unionByName(gb)

    # merged-from-parts, via the pairwise helper
    est_union = sk.kmv_union_overlap(both, "g", "v", pairs=[("x", "y")], k=k).collect()[
        0
    ]["est_union"]

    # direct sketch of the true union
    u = a.unionByName(b).withColumn("g", F.lit("u"))
    direct = sk.kmv_distinct(u, ["g"], "v", k=k).collect()[0]["est_distinct"]
    assert est_union == direct

    # inclusion-exclusion intersection error scales with the UNION size
    # (|A∪B| / sqrt(k-2) per sketch term) — assert a 4-sigma bound on
    # that, not on the (much smaller) true overlap
    inter = sk.kmv_union_overlap(both, "g", "v", pairs=[("x", "y")], k=k).collect()[0][
        "est_intersection"
    ]
    sigma = 1200 / (k - 2) ** 0.5
    assert abs(inter - 400) < 4 * sigma


def test_incremental_store_equals_full_sketch(spark, tmp_path):
    """A store fed any batch split must equal the one-shot sketch of the
    full data — the merge rule is exact, not approximate."""
    from pyspark.sql import functions as F

    full = spark.createDataFrame(
        [("g%d" % (i % 3), i % 700) for i in range(2000)], "g string, v long"
    )
    store = sk.KmvSketchStore(spark, str(tmp_path / "sk"), ["g"], "v", k=128)
    # three uneven batches with overlapping values
    for lo, hi in ((0, 500), (400, 1300), (1200, 2000)):
        store.update(
            spark.createDataFrame(
                [("g%d" % (i % 3), i % 700) for i in range(lo, hi)],
                "g string, v long",
            )
        )
    got = {
        tuple(r) for r in store._read().select("g", "_h", "_rn").collect()
    }
    want = {
        tuple(r)
        for r in sk.kmv_sketch(full, ["g"], "v", 128)
        .select("g", "_h", "_rn")
        .collect()
    }
    assert got == want

    est = {r["g"]: r["est_distinct"] for r in store.estimates().collect()}
    exact = {
        r["g"]: r["n"]
        for r in full.groupBy("g").agg(
            F.countDistinct("v").alias("n")
        ).collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) / n < 0.4  # k=128


def test_streaming_sketch_maintenance(spark, tmp_path):
    """KmvSketchStore under the streaming runtime: two micro-batches via
    foreachBatch yield the same store as the one-shot sketch."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"g": "x", "v": i}) for i in range(300))
    )
    (src / "b.json").write_text(
        "\n".join(json.dumps({"g": "x", "v": i}) for i in range(200, 500))
    )
    store = sk.KmvSketchStore(spark, str(tmp_path / "sk"), ["g"], "v", k=64)
    stream = (
        spark.readStream.schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(lambda df, _eid: store.update(df))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = spark.createDataFrame([("x", i) for i in range(500)], "g string, v long")
    want = {
        tuple(r)
        for r in sk.kmv_sketch(full, ["g"], "v", 64).select("g", "_h", "_rn").collect()
    }
    got = {tuple(r) for r in store._read().select("g", "_h", "_rn").collect()}
    assert got == want
