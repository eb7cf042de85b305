"""Driver-contract guard: __spark_entry__ exposes a consistent catalog
and every oracle SQL string parses AND binds in DuckDB (EXPLAIN only —
no execution), so a typo in a twin fails here, not in the driver's
correctness run."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_queries_and_oracles_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 70
    # rows-only (no-oracle) entries are the known streaming exceptions
    no_oracle = set(q) - set(o)
    assert no_oracle <= {
        "streaming_hourly_rollup",
        "streaming_session_windows",
        "corpus_quality_trained",  # training loop is not SQL-expressible
        "bpe_learned_merges",  # argmax-dependent iteration, not SQL-expressible
        "bpe_encode_stats",  # applies the trained (non-SQL) merge table
    }


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_every_oracle_sql_binds_in_duckdb(duck):
    failures = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            duck.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            failures[name] = str(exc).splitlines()[0]
    assert not failures, failures
