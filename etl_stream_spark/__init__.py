"""etl_stream_spark — a PySpark-native streaming-CDC analytics engine.

A from-scratch rebuild of the data-processing capabilities of the
``dwickyfp/etl-stream`` reference (a Rust/Python Postgres→warehouse CDC
replicator) on Apache Spark:

* Structured Streaming supplies the continuous micro-batch substrate
  (reference: hand-rolled batching, ``docs/data_flow.md``).
* Catalyst/Tungsten supply columnar execution + optimization (reference:
  hand-rolled Arrow encoding, ``src/destination/snowflake_destination.rs``).
* The analytical core — last-writer-wins dedup + CDC MERGE
  (reference: ``etl-snowflake-py/etl_snowflake/task.py:154-190``) — is a
  window + merge expressed with the DataFrame API.

Beyond reference parity, the ``operators`` package adds the large-scale
training-data-pipeline surface: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search, text analysis,
and multimodal-column plumbing — all designed for 100 TB-scale execution
(broadcast small sides, shuffle only on intended keys, no driver-side
loops over data).
"""

__version__ = "0.1.0"
