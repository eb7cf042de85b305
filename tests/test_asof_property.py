"""Property test: asof_join agrees with a brute-force per-row reference
on random inputs (random keys, random timestamps, ties included)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_stream_spark.operators.temporal import asof_join

BASE = dt.datetime(2026, 1, 1)

row_st = st.tuples(
    st.sampled_from(["k1", "k2", "k3"]),
    st.integers(min_value=0, max_value=50),  # offset seconds — small range forces ties
)
left_st = st.lists(row_st, min_size=1, max_size=12)
right_st = st.lists(row_st, min_size=0, max_size=12)


def _expected(left, right):
    """Brute force: per left row, max right ts <= left ts for the key;
    value = the right row's payload (unique per (key, ts) after dedup)."""
    out = {}
    for i, (k, ts) in enumerate(left):
        candidates = [rts for rk, rts in right if rk == k and rts <= ts]
        out[i] = max(candidates) if candidates else None
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_st, right=right_st)
def test_asof_matches_bruteforce(spark, left, right):
    # dedup right to one row per (key, ts): payload = ts offset itself,
    # so equality of payloads is equality of matched timestamps
    right_dedup = sorted({(k, ts) for k, ts in right})
    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(seconds=ts)) for i, (k, ts) in enumerate(left)],
        "id long, k string, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=ts), ts) for k, ts in right_dedup],
        "k string, rts timestamp, payload long",
    ) if right_dedup else spark.createDataFrame([], "k string, rts timestamp, payload long")
    got = {
        r["id"]: r["payload"]
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert got == _expected(left, right_dedup)


def _expected_fwd(left, right):
    """Brute force forward: per left row, MIN right ts >= left ts."""
    out = {}
    for i, (k, ts) in enumerate(left):
        candidates = [rts for rk, rts in right if rk == k and rts >= ts]
        out[i] = min(candidates) if candidates else None
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_st, right=right_st)
def test_asof_forward_matches_bruteforce(spark, left, right):
    from etl_stream_spark.operators.temporal import asof_join_forward

    right_dedup = sorted({(k, ts) for k, ts in right})
    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(seconds=ts)) for i, (k, ts) in enumerate(left)],
        "id long, k string, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=ts), ts) for k, ts in right_dedup],
        "k string, rts timestamp, payload long",
    ) if right_dedup else spark.createDataFrame([], "k string, rts timestamp, payload long")
    got = {
        r["id"]: r["payload"]
        for r in asof_join_forward(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts"
        ).collect()
    }
    assert got == _expected_fwd(left, right_dedup)
