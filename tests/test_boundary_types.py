"""Driver-boundary type convention, enforced for every catalog entry:
integral outputs are 64-bit, fractional outputs are DOUBLE — DECIMAL,
FLOAT, and narrow ints never cross the boundary (the round-1 hash-fail
class). Schema analysis only; no query executes."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_stream_spark.catalog import CATALOG

#: Entries whose fn *executes* a stream at build time — their output
#: schemas are covered by the oracle gate instead.
STREAMING = {
    "streaming_hourly_rollup",
    "streaming_sustained_alerts",
    "streaming_session_windows",
    "streaming_enrichment",
    "streaming_stream_join",
    "streaming_dedup",
    "cdc_streaming_merge",
}

BATCH_ENTRIES = sorted(set(CATALOG) - STREAMING)


def bad_types(name: str, dt: T.DataType) -> list[str]:
    out: list[str] = []
    if isinstance(dt, (T.DecimalType, T.FloatType, T.IntegerType, T.ShortType, T.ByteType)):
        out.append(f"{name}:{dt.simpleString()}")
    elif isinstance(dt, T.ArrayType):
        out += bad_types(name + "[]", dt.elementType)
    elif isinstance(dt, T.MapType):
        out += bad_types(name + ".key", dt.keyType)
        out += bad_types(name + ".val", dt.valueType)
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            out += bad_types(f"{name}.{f.name}", f.dataType)
    return out


@pytest.mark.parametrize("entry", BATCH_ENTRIES)
def test_boundary_schema_is_portable(catalog_frames, entry):
    df = catalog_frames(entry)
    problems = []
    for f in df.schema.fields:
        problems += bad_types(f.name, f.dataType)
    assert not problems, f"{entry} leaks non-portable types: {problems}"
