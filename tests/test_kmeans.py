"""Iterative k-means: on well-separated synthetic clusters the loop
must recover the ground truth and reach a fixpoint."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_stream_spark.operators.similarity import kmeans_assign, kmeans_train


def _clustered(spark):
    """Three tight 4-d clusters around distant centers; ids 0..2 are one
    point of each cluster (so the first-k init starts in distinct
    clusters — deterministic and well-posed)."""
    centers = {0: [0.0, 0.0, 0.0, 0.0], 1: [10.0, 10.0, 0.0, 0.0], 2: [0.0, 0.0, 10.0, 10.0]}
    rows = []
    vid = 3
    for c, base in centers.items():
        rows.append((c, [x + 0.01 for x in base]))  # ids 0,1,2 seed the init
        for j in range(15):
            jitter = ((j * 7 + c) % 10) / 100.0  # deterministic, < 0.1
            rows.append((vid, [x + jitter for x in base]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), centers


def test_kmeans_recovers_separated_clusters(spark):
    df, centers = _clustered(spark)
    assigned, cents = kmeans_train(df, k=3, rounds=3)
    rows = assigned.collect()
    # ground truth: points were appended per center in blocks of 15
    # after the three seeds; map each vec back to its true center
    truth = {}
    vid = 3
    for c in centers:
        truth[c] = c
        for _ in range(15):
            truth[vid] = c
            vid += 1
    got = {r["vec_id"]: r["cluster_id"] for r in rows}
    # cluster ids are seeded by ids 0..2 which sit in distinct true
    # clusters, so labels must match identity
    assert got == truth
    assert len(cents) == 3
    # fixpoint: one more round must not change assignments
    assigned2, _ = kmeans_train(df, k=3, rounds=4)
    got2 = {r["vec_id"]: r["cluster_id"] for r in assigned2.collect()}
    assert got2 == got


def test_kmeans_assign_matches_one_round_of_train(spark):
    df, _ = _clustered(spark)
    one = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(df, k=3).collect()}
    # round 0 of train assigns against the same init
    trained, _ = kmeans_train(df, k=3, rounds=0)
    zero = {r["vec_id"]: r["cluster_id"] for r in trained.collect()}
    assert one == zero


def test_trained_ivf_recall_against_bruteforce(spark):
    """The full index pipeline (train → assign → probe → score) must
    recover most of the exact top-k: measured 0.88 recall@5 on the
    deterministic sf0.001 embeddings with 8 cells, 2 probes."""
    from etl_stream_spark.operators.similarity import brute_force_topk, ivf_trained_topk
    from etl_stream_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    truth = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_trained_topk(emb, q, k=5, n_cells=8, nprobe=2, rounds=2).collect()
    }
    assert len(got) == len(truth) == 25
    assert len(truth & got) / len(truth) >= 0.8


def test_empty_cluster_keeps_centroid(spark):
    # k=3 but ids 0 and 1 are identical points → cluster 1 goes empty
    # (all points closer to 0 by tie-break), must not crash or vanish
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])] + [
        (i, [5.0 + i / 100.0, 5.0]) for i in range(3, 8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = kmeans_train(df, k=3, rounds=2)
    assert len(cents) == 3
    clusters = {r["cluster_id"] for r in assigned.collect()}
    assert 1 not in clusters  # starved by the tie-break, centroid retained
    assert {0, 2} <= clusters

class TestProductQuantization:
    def test_codes_shape_and_determinism(self, spark):
        from etl_stream_spark.operators.similarity import pq_codes
        from etl_stream_spark.session import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        codes = pq_codes(emb, m=4, n_codes=8)
        rows = codes.collect()
        n_vecs = emb.count()
        assert len(rows) == n_vecs * 4  # one code per (vector, subspace)
        assert {r.sub_id for r in rows} == {0, 1, 2, 3}
        assert all(0 <= r.code < 8 for r in rows)
        # codebook vectors encode to themselves with zero distance
        own = {(r.vec_id, r.sub_id): (r.code, r.dist_sq) for r in rows if r.vec_id < 8}
        for (vid, _sid), (code, dist) in own.items():
            assert code == vid and dist == 0
        # partitioning-invariant
        again = {
            (r.vec_id, r.sub_id): r.code
            for r in pq_codes(emb.repartition(13), m=4, n_codes=8).collect()
        }
        assert again == {(r.vec_id, r.sub_id): r.code for r in rows}

    def test_non_default_m_and_validation(self, spark):
        import pytest as _pytest

        from etl_stream_spark.operators.similarity import pq_codes, pq_topk
        from etl_stream_spark.session import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        with _pytest.raises(ValueError, match="not divisible"):
            pq_codes(emb, m=5, n_codes=8)  # 64 % 5 != 0
        out = pq_topk(emb, emb.filter("vec_id < 2"), k=3, m=8, n_codes=4)
        rows = out.collect()
        assert len(rows) == 6  # 2 queries × k
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append((r.rank, r.adc_dist))
        for ranked in by_q.values():
            ranked.sort()
            dists = [d for _r, d in ranked]
            assert dists == sorted(dists)  # ADC distance ascending by rank


class TestSemanticDedup:
    def test_prunes_within_cluster_near_dups(self, spark):
        """Near-identical vectors in the same cluster collapse to the
        lowest id; distinct directions all survive."""
        from etl_stream_spark.operators.similarity import semantic_dedup

        df, _ = _clustered(spark)
        out = semantic_dedup(df, k=3, threshold=0.999).collect()
        by_id = {r["vec_id"]: r for r in out}
        assert len(by_id) == df.count()  # one row per input vector
        # every vector in a tight cluster points the same way (cosine
        # ~1.0 within cluster except near the origin-centered cluster),
        # so in clusters 1 and 2 only the seed survives
        for cid in (1, 2):
            members = [r for r in out if r["cluster_id"] == cid]
            kept = sorted(r["vec_id"] for r in members if r["kept"])
            assert kept[0] == min(r["vec_id"] for r in members)
            assert len(kept) == 1

    def test_high_threshold_keeps_everything(self, spark):
        from etl_stream_spark.operators.similarity import semantic_dedup

        rows = [(i, [float(i + 1), float((i * 3) % 7), 1.0, 0.0]) for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(df, k=2, threshold=1.1)
        assert out.filter(~F.col("kept")).count() == 0
