"""Analytical operators beyond the reference's CDC surface.

The LLM-training-data-pipeline operator set (BASELINE.json north star):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine; incremental against a persisted fingerprint store),
similarity search (brute-force + LSH ANN + IVF, per-query and as a
persisted partition-pruned index), text analysis (tokens, quality,
language-ID, fingerprints, model scoring), corpus prep (sampling,
splits, packing, contamination audits), multimodal column plumbing.

Design rules applied throughout:

* built-in ``pyspark.sql.functions`` everywhere the semantics allow —
  all hot paths stay inside WholeStageCodegen (no Python in the loop);
* hashes are md5-hex based so every operator has a bit-exact ANSI-SQL
  twin (the DuckDB oracle in ``__spark_entry__``) and results are
  engine-portable;
* floating-point reductions are quantized (decimal casts / integer
  vector quantization) so results are summation-order independent —
  required both for the oracle hash-compare and for deterministic
  results under Spark's nondeterministic partition reduce order;
* pairwise operators (Jaccard, near-dup) are *blocked*: candidate pairs
  come from an equi-join on a block key (source, LSH band, …), never a
  cross join — at 100 TB an unblocked O(n²) is not a plan.
"""
