"""Two-phase global ordering must equal the single-task global-window
plan row for row — that equality is what lets the scale-safe rewrite
keep the already-proven single-sort oracles. The nastiest case is
pinned here on purpose: heavy ties in the primary sort column (the
pure-tie sub-split path) and tiny bucket counts that force every
boundary condition."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from etl_stream_spark.operators.ranking import ntile_expr, with_global_order


def _frame(spark, n, seed, parts, tie_heavy=False):
    rng = random.Random(seed)
    dom = 3 if tie_heavy else max(1, n // 3)
    rows = [
        (i, rng.randint(0, dom), float(rng.randint(-50, 50)) / 4)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "id long, v long, x double"
    ).repartition(parts)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("n,seed,parts,fine,tie,heavy", [
    (200, 1, 7, 8, 4, False),
    (200, 6, 7, 8, 4, True),    # pure-tie sub-split path
    (37, 2, 1, 64, 8, True),    # more buckets than rows
    (500, 3, 13, 2, 2, False),  # tiny bucket count
    (1, 4, 1, 8, 4, False),
    (0, 5, 1, 8, 4, False),     # empty frame
])
def test_rank_and_running_sum_match_global_window(
    spark, n, seed, parts, fine, tie, heavy
):
    df = _frame(spark, n, seed, parts, tie_heavy=heavy)
    order = [("v", False), ("id", True)]
    got = with_global_order(
        df,
        order,
        rank_col="rn",
        count_col="n",
        running_sums=[("v", "cum_v", "tot_v")],
        fine_buckets=fine,
        tie_buckets=tie,
    )
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    want = (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(full))
        .withColumn("cum_v", F.sum("v").over(run))
        .withColumn("tot_v", F.sum("v").over(full))
    )
    cols = ["id", "v", "x", "rn", "n", "cum_v", "tot_v"]
    assert _rows(got, cols) == _rows(want, cols)


def test_all_rows_one_value(spark):
    """Degenerate: the whole frame is one tie mass — every fine bucket
    collapses to one, the sub-split carries all the parallelism."""
    df = spark.createDataFrame([(i, 7) for i in range(300)], "id long, v long")
    got = with_global_order(
        df, [("v", True), ("id", True)], rank_col="rn",
        fine_buckets=16, tie_buckets=8,
    )
    rows = {r["id"]: r["rn"] for r in got.collect()}
    assert rows == {i: i + 1 for i in range(300)}


def test_rank_invariant_to_input_partitioning_and_aqe(spark):
    df = _frame(spark, 300, 9, 5)
    order = [("x", True), ("id", True)]

    def run(frame):
        return _rows(
            with_global_order(
                frame, order, rank_col="rn", fine_buckets=8, tie_buckets=4
            ),
            ["id", "rn"],
        )

    base = run(df)
    assert run(df.repartition(17)) == base
    assert run(df.coalesce(1)) == base
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert run(df) == base
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_decimal_running_sum_exact(spark):
    rows = [(i, f"{(i * 7919) % 1000}.{i % 100:02d}") for i in range(120)]
    df = spark.createDataFrame(rows, "id long, s string").select(
        "id", F.col("s").cast("decimal(18,2)").alias("d")
    )
    got = with_global_order(
        df,
        [("d", False), ("id", True)],
        running_sums=[("d", "cum_d", "tot_d")],
        fine_buckets=8,
        tie_buckets=4,
    )
    w = Window.orderBy(F.desc("d"), F.asc("id"))
    want = df.withColumn(
        "cum_d", F.sum("d").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "tot_d",
        F.sum("d").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )
    cols = ["id", "cum_d", "tot_d"]
    assert _rows(got, cols) == _rows(want, cols)
    # schema parity with the naive plan: the bounded prefix must not
    # leak a widened decimal into the output (driver boundary rule)
    got_t = dict(got.dtypes)
    want_t = dict(want.dtypes)
    assert got_t["cum_d"] == want_t["cum_d"], (got_t, want_t)
    assert got_t["tot_d"] == want_t["tot_d"], (got_t, want_t)


def test_outlier_clustered_mass_rebalances(spark):
    """The adaptive refinement's reason to exist: thousands of DISTINCT
    values clustered in [0, 2e-9] under ±1e9 outliers collapse into one
    coarse cell — the mass-proportional sub-bucketing must re-spread
    them to ~n/fine per unit (exactness AND balance, not exactness
    alone)."""
    from etl_stream_spark.operators.ranking import unit_occupancy

    rows = [(i, i * 1e-12) for i in range(2000)] + [(2000, 1e9), (2001, -1e9)]
    df = spark.createDataFrame(rows, "id long, x double").repartition(7)
    order = [("x", True), ("id", True)]
    got = with_global_order(
        df, order, rank_col="rn", fine_buckets=64, tie_buckets=4, refine_max=64
    )
    w = Window.orderBy(F.asc("x"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert _rows(got, ["id", "rn"]) == _rows(want, ["id", "rn"])
    occ = unit_occupancy(
        df, order, fine_buckets=64, tie_buckets=4, refine_max=64
    ).collect()
    assert sum(r["unit_rows"] for r in occ) == 2002
    # collapse would put ~2000 rows in one unit; refinement caps it
    # near ceil(n/fine)·slack
    assert max(r["unit_rows"] for r in occ) <= 120, sorted(
        r["unit_rows"] for r in occ
    )[-5:]


def test_beyond_double_precision_distinct_values_not_misread_as_tie(spark):
    """Two distinct BIGINTs beyond 2^53 share one double image — a
    double-typed pure-tie test would sub-split their shared cell by the
    tie-break column and interleave the two primary values across
    units, silently corrupting ranks. The span test runs on the
    original type and must keep them in one correctly-sorted unit."""
    big = 1 << 53
    rows = [(i, big + (i % 2)) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(5)
    got = with_global_order(
        df, [("v", True), ("id", True)], rank_col="rn",
        fine_buckets=8, tie_buckets=4,
    )
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert _rows(got, ["id", "v", "rn"]) == _rows(want, ["id", "v", "rn"])


def test_outlier_clustered_values_still_exact(spark):
    """The documented equi-width weakness — mass clustered far below a
    lone outlier collapses most rows into one fine cell — must degrade
    BALANCE only, never correctness."""
    rows = [(i, 1e-9 * (i % 7)) for i in range(200)] + [(200, 1e9), (201, -1e9)]
    df = spark.createDataFrame(rows, "id long, x double").repartition(5)
    got = with_global_order(
        df, [("x", True), ("id", True)], rank_col="rn",
        fine_buckets=16, tie_buckets=4,
    )
    w = Window.orderBy(F.asc("x"), F.asc("id"))
    want = df.withColumn("rn", F.row_number().over(w).cast("long"))
    assert _rows(got, ["id", "rn"]) == _rows(want, ["id", "rn"])


def test_hypothesis_fuzz_matches_global_window(spark):
    """Randomized frames (negatives, heavy duplicates, mixed
    magnitudes) against the single-task plan."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vals = st.lists(
        st.one_of(
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=-(10**9), max_value=10**9),
        ),
        min_size=1,
        max_size=60,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(vals=vals, fine=st.sampled_from([2, 7, 32]), tie=st.sampled_from([2, 8]))
    def check(vals, fine, tie):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long"
        ).repartition(3)
        got = with_global_order(
            df,
            [("v", False), ("id", True)],
            rank_col="rn",
            running_sums=[("v", "cum", None)],
            fine_buckets=fine,
            tie_buckets=tie,
        )
        w = Window.orderBy(F.desc("v"), F.asc("id"))
        want = df.withColumn("rn", F.row_number().over(w).cast("long")).withColumn(
            "cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        cols = ["id", "rn", "cum"]
        assert _rows(got, cols) == _rows(want, cols)

    check()


def test_batched_ranks_match_global_windows(spark):
    """with_global_orders: N ranks sharing the fused stats passes must
    equal N independent global-window ranks — including a tie-heavy
    dimension (pure-tie sub-split) and opposite sort directions."""
    from etl_stream_spark.operators.ranking import with_global_orders

    rng = random.Random(42)
    rows = [
        (i, rng.randint(0, 5), rng.randint(-1000, 1000), rng.randint(0, 50))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long").repartition(9)
    got = with_global_orders(
        df,
        [
            ([("a", False), ("id", True)], "ra", "n"),
            ([("b", True), ("id", True)], "rb", None),
            ([("c", False), ("id", True)], "rc", None),
        ],
        fine_buckets=16,
        tie_buckets=4,
        refine_max=16,
    )
    want = df
    for col, asc, rn in [("a", False, "ra"), ("b", True, "rb"), ("c", False, "rc")]:
        w = Window.orderBy(
            F.asc(col) if asc else F.desc(col), F.asc("id")
        )
        want = want.withColumn(rn, F.row_number().over(w).cast("long"))
    want = want.withColumn(
        "n",
        F.count(F.lit(1)).over(
            Window.orderBy("id").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    cols = ["id", "ra", "rb", "rc", "n"]
    assert _rows(got, cols) == _rows(want, cols)


def test_batched_ranks_invariant_to_partitioning_and_aqe(spark):
    from etl_stream_spark.operators.ranking import with_global_orders

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 9), rng.randint(-50, 50)) for i in range(250)]
    df = spark.createDataFrame(rows, "id long, a long, b long").repartition(5)
    specs = [
        ([("a", False), ("id", True)], "ra", None),
        ([("b", True), ("id", True)], "rb", None),
    ]

    def run(frame):
        return _rows(
            with_global_orders(
                frame, specs, fine_buckets=8, tie_buckets=4, refine_max=8
            ),
            ["id", "ra", "rb"],
        )

    base = run(df)
    assert run(df.repartition(13)) == base
    assert run(df.coalesce(1)) == base
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert run(df) == base
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_batched_ranks_reject_mixed_primary_dtypes(spark):
    from etl_stream_spark.operators.ranking import with_global_orders

    df = spark.createDataFrame([(1, 2, 0.5)], "id long, a long, b double")
    with pytest.raises(ValueError, match="shared primary dtype"):
        with_global_orders(
            df,
            [
                ([("a", True), ("id", True)], "ra", None),
                ([("b", True), ("id", True)], "rb", None),
            ],
        )


def test_rejects_non_numeric_order_column(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError, match="numeric"):
        with_global_order(df, [("s", True), ("id", True)], rank_col="rn")


@pytest.mark.parametrize(
    "n,k",
    [(1, 10), (7, 10), (10, 10), (23, 10), (100, 10), (101, 10), (9, 5), (40, 7)],
)
def test_ntile_expr_equals_spark_ntile(spark, n, k):
    df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    w = Window.orderBy("id")
    want = df.withColumn("t", F.ntile(k).over(w).cast("long"))
    got = (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "nn",
            F.count(F.lit(1)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .withColumn("t", ntile_expr("rn", "nn", k))
    )
    assert _rows(got, ["id", "t"]) == _rows(want, ["id", "t"])


def test_ntile_expr_equals_duckdb_ntile():
    import duckdb

    for n, k in [(1, 10), (9, 10), (10, 10), (23, 10), (97, 10), (40, 7)]:
        q = n // k
        r = n % k
        head = r * (q + 1)
        rows = duckdb.sql(
            f"""
            WITH s AS (SELECT range AS id FROM range({n})),
            t AS (SELECT id, NTILE({k}) OVER (ORDER BY id) AS nt,
                         ROW_NUMBER() OVER (ORDER BY id) AS rn
                  FROM s)
            SELECT id FROM t
            WHERE nt <> (CASE WHEN rn <= {head} THEN (rn + {q}) // ({q} + 1)
                         ELSE {r} + (rn - {head} + {q} - 1) // {max(q, 1)} END)
            """
        ).fetchall()
        assert rows == [], (n, k, rows)


def test_no_unpartitioned_window_in_plan(spark):
    """The operator's entire point: its plan must not contain a window
    with an empty partition spec (the single-task funnel)."""
    df = _frame(spark, 50, 11, 3)
    out = with_global_order(
        df, [("v", True), ("id", True)], rank_col="rn",
        fine_buckets=8, tie_buckets=4,
    )
    jplan = out._jdf.queryExecution().analyzed()
    stack = [jplan]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            assert not node.partitionSpec().isEmpty(), node.treeString()
        for i in range(node.children().length()):
            stack.append(node.children().apply(i))
