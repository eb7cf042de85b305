from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from etl_stream_spark.session import get_spark

    spark = get_spark(app_name="etl_stream_spark_tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def catalog_frames(spark):
    """Session-shared, lazily-built sf0.001 catalog entries. Four
    whole-catalog sweeps (boundary types, broadcast hints, global
    windows, cartesian products) each called every entry's ``fn`` —
    four full constructions of ~190 entries, ~10 min of the suite's
    wall on a degraded box (r8 verdict item 2: the driver's pytest gate
    timed out). Entry fns are pure constructions (scratch side effects
    are per-(tag,pid) overwrite-idempotent), so ONE DataFrame per entry
    serves every sweep. Safe sharing rule: consumers may read
    ``df.schema`` / the ANALYZED plan freely; at most one consumer may
    force the PHYSICAL plan (QueryExecution caches executedPlan, so a
    second physical consumer under different session confs — AQE
    toggles — would silently read the first one's plan). Today that
    one physical consumer is the cartesian sweep; the AQE-off ceiling
    suite deliberately builds its own frames."""
    from etl_stream_spark.catalog import CATALOG

    cache: dict = {}

    def get(name: str):
        if name not in cache:
            cache[name] = CATALOG[name].fn(spark, "/root/testdata/sf0.001")
        return cache[name]

    return get
