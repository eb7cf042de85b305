"""Config-table scan (S3): pipeline discovery for the reconciler.

The reference polls ``pipelines``/``sources``/``destinations`` rows in a
config database every 5 s (``src/pipeline_manager.rs:82-180``;
``migrations/001_create_tables.sql:47-60``). Spark analog: a small
config table (parquet/JSON path, or JDBC in production) read on the
driver each poll tick; rows become :class:`PipelineSpec`s that the
:class:`~etl_stream_spark.streaming.manager.PipelineManager` reconciles
against its running ``StreamingQuery`` map.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from etl_stream_spark.schema.identifiers import validate_identifier

STATUS_START = "START"
STATUS_PAUSE = "PAUSE"

#: Reference batching defaults (``migrations/001_create_tables.sql:53-54``).
DEFAULT_BATCH_MAX_SIZE = 1000
DEFAULT_BATCH_MAX_FILL_MS = 5000


@dataclass(frozen=True)
class PipelineSpec:
    """One row of the ``pipelines`` config joined to its source/dest
    (``migrations/001_create_tables.sql:4-60``)."""

    pipeline_id: str
    source_path: str
    destination_path: str
    status: str = STATUS_START
    tables: tuple[str, ...] = field(default=())
    batch_max_size: int = DEFAULT_BATCH_MAX_SIZE
    batch_max_fill_ms: int = DEFAULT_BATCH_MAX_FILL_MS

    def __post_init__(self) -> None:
        validate_identifier(self.pipeline_id, "pipeline id")

    @property
    def trigger_interval(self) -> str:
        """``batch_max_fill_ms`` → Spark processing-time trigger."""
        return f"{self.batch_max_fill_ms} milliseconds"


def specs_from_rows(rows: list[dict]) -> list[PipelineSpec]:
    """Materialize specs from config rows (dict per pipeline)."""
    out = []
    for r in rows:
        out.append(
            PipelineSpec(
                pipeline_id=str(r["pipeline_id"]),
                source_path=r["source_path"],
                destination_path=r["destination_path"],
                status=r.get("status", STATUS_START),
                tables=tuple(r.get("tables", ())),
                batch_max_size=int(r.get("batch_max_size", DEFAULT_BATCH_MAX_SIZE)),
                batch_max_fill_ms=int(r.get("batch_max_fill_ms", DEFAULT_BATCH_MAX_FILL_MS)),
            )
        )
    return out


def load_pipeline_specs(spark: SparkSession, path: str, fmt: str = "json") -> list[PipelineSpec]:
    """Read the config table (tiny — safe to collect) into specs."""
    df = spark.read.format(fmt).option("multiLine", "true").load(path)
    return specs_from_rows([r.asDict() for r in df.collect()])
