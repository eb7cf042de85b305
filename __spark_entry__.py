"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC-final-state query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full catalog from
``etl_stream_spark.catalog`` (operator inventory per SURVEY.md §2 plus
the LLM-pipeline operator set).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_stream_spark.catalog import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["cdc_final_state"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible streaming ops → rows-only check)."""
    return {name: qd.oracle for name, qd in CATALOG.items() if qd.oracle is not None}
