"""Parallelism-recovery guard shared by the compute-heavy operators.

Guide §2.5 ("input skew: one huge unsplittable file ... repartition
immediately after the read"): an operator's map-side work inherits the
INPUT's partition count, and a small parquet file (one row-group) or a
single gzip member scans as ONE partition — the whole corpus then runs on
one core / one Python worker while the rest of the cluster idles. Measured
round 8: the sf0.1 documents and embeddings tables are each one ~600 KB
row-group, so the quality UDF, the cosine pair scans, and the n-gram
explodes were all single-task-bound regardless of core count.

The guard round-robin-repartitions to the cluster's default parallelism
ONLY when the plan under-partitions; at production scale inputs carry at
least `cores` partitions and this is a no-op, so no data movement is
introduced where it would matter. Round-robin is not a hashpartitioning on
any column — the repo's text-shuffle audits (no text-KEYED exchange) are
untouched — and Spark's sort-before-repartition keeps the row-to-partition
assignment deterministic under task retry (SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it has fewer
    partitions (batch plans only — streaming plans pass through)."""
    if df.isStreaming:
        return df
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
